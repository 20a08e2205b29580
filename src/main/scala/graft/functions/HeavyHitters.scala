package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * bounded-state path for "which tokens dominate a 100 TB corpus":
  * exact frequency counting must shuffle the full vocabulary (which,
  * on web-scale text, is itself corpus-sized thanks to typos, ids and
  * URLs); the MG summary keeps at most `m` (token, counter) slots per
  * task, partial-aggregates map-side, and merges associatively, so the
  * vocabulary never rides an exchange.
  *
  * Guarantee (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): a summary of capacity m
  * undercounts any item by at most N/(m+1) regardless of input order
  * or merge tree, so EVERY item with true frequency > N/(m+1) is
  * present in the final summary. The summary alone is
  * partition-order-dependent (counts are lower bounds, the candidate
  * set can include extras); downstream consumers make the result exact
  * and deterministic with a second confirming pass over the candidates
  * only — see q90, which selects `freq >= ceil(0.005·N)` with m = 255,
  * 0.005 > 1/256 ⇒ no false negatives, and the confirm pass kills the
  * false positives.
  *
  * Buffer layout: parallel arrays sorted by token, so reduce is a
  * binary search + in-place counter bump on the hot path (buffer
  * objects live as deserialized objects inside ObjectHashAggregate;
  * structural copies happen only on insert/decrement). The classic
  * decrement-all step compacts in O(m); merge sums counts by key,
  * then subtracts the (m+1)-th largest count from every slot (the
  * standard mergeable-MG offset), keeping the top m.
  */
object HeavyHitters {

  /** [[Encoders.product]] is the stable public constructor for
    * composite aggregation state, as with [[Kmv.Buf]].
    */
  case class Buf(words: Array[String], counts: Array[Long])
  case class Out(words: Array[String], counts: Array[Long])

  class MgAggregator(m: Int) extends Aggregator[String, Buf, Out] {
    require(m >= 1, s"capacity must be >= 1, got $m")

    def zero: Buf = Buf(Array.empty[String], Array.emptyLongArray)

    def reduce(b: Buf, w: String): Buf = {
      val idx = java.util.Arrays.binarySearch(
        b.words.asInstanceOf[Array[AnyRef]], w)
      if (idx >= 0) { b.counts(idx) += 1; b }
      else {
        val ins = -idx - 1
        if (b.words.length < m) {
          val n = b.words.length + 1
          val ws = new Array[String](n); val cs = new Array[Long](n)
          System.arraycopy(b.words, 0, ws, 0, ins)
          System.arraycopy(b.counts, 0, cs, 0, ins)
          ws(ins) = w; cs(ins) = 1L
          System.arraycopy(b.words, ins, ws, ins + 1, n - ins - 1)
          System.arraycopy(b.counts, ins, cs, ins + 1, n - ins - 1)
          Buf(ws, cs)
        } else {
          // full and unseen: decrement every counter (the unseen item's
          // implicit counter hits 0 and is discarded), drop zeros
          var kept = 0
          var i = 0
          while (i < m) { if (b.counts(i) > 1L) kept += 1; i += 1 }
          val ws = new Array[String](kept); val cs = new Array[Long](kept)
          var j = 0; i = 0
          while (i < m) {
            if (b.counts(i) > 1L) { ws(j) = b.words(i); cs(j) = b.counts(i) - 1L; j += 1 }
            i += 1
          }
          Buf(ws, cs)
        }
      }
    }

    def merge(a: Buf, b: Buf): Buf = {
      // sum counts over the sorted-by-token union
      val n = a.words.length + b.words.length
      val ws = new Array[String](n); val cs = new Array[Long](n)
      var i = 0; var j = 0; var k = 0
      while (i < a.words.length || j < b.words.length) {
        val c =
          if (j >= b.words.length) -1
          else if (i >= a.words.length) 1
          else a.words(i).compareTo(b.words(j))
        if (c < 0) { ws(k) = a.words(i); cs(k) = a.counts(i); i += 1 }
        else if (c > 0) { ws(k) = b.words(j); cs(k) = b.counts(j); j += 1 }
        else { ws(k) = a.words(i); cs(k) = a.counts(i) + b.counts(j); i += 1; j += 1 }
        k += 1
      }
      if (k <= m) Buf(java.util.Arrays.copyOf(ws, k), java.util.Arrays.copyOf(cs, k))
      else {
        // subtract the (m+1)-th largest count from all, keep positives
        // (<= m survive by construction)
        val sorted = java.util.Arrays.copyOfRange(cs, 0, k)
        java.util.Arrays.sort(sorted)
        val offset = sorted(k - m - 1)
        var kept = 0
        var t = 0
        while (t < k) { if (cs(t) > offset) kept += 1; t += 1 }
        val ws2 = new Array[String](kept); val cs2 = new Array[Long](kept)
        var u = 0; t = 0
        while (t < k) {
          if (cs(t) > offset) { ws2(u) = ws(t); cs2(u) = cs(t) - offset; u += 1 }
          t += 1
        }
        Buf(ws2, cs2)
      }
    }

    def finish(b: Buf): Out = Out(b.words, b.counts)

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** `agg(m)(w)`: aggregate Column over a non-null string column;
    * returns struct<words: array<string>, counts: array<long>> — the
    * candidate superset of every item with frequency > N/(m+1).
    */
  def agg(m: Int): Column => Column = {
    val f = udaf(new MgAggregator(m), Encoders.STRING)
    w => f(w)
  }
}
