package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values (KMV) distinct-count sketch as a typed
  * [[Aggregator]] — the "novel sketch" custom-aggregate seam from the
  * round brief, and the scale path for COUNT(DISTINCT x) GROUP BY g:
  * exact distinct shuffles every distinct value to its group's reducer
  * (state O(distinct)); KMV's partial state is the k smallest distinct
  * hash values (O(k) per group per task), collapses map-side like any
  * algebraic aggregate, and merges by sorted-array union. Estimate for
  * a full buffer: the k-th smallest of D uniform draws on [0, 2^32)
  * sits near k/D · 2^32, so D ≈ (k-1) · 2^32 / h_(k) (the classic
  * unbiased KMV estimator); a buffer that never filled IS the exact
  * distinct set, so the count is exact below k.
  *
  * Everything is integer arithmetic over [[Portable.h32]] hashes, so a
  * DuckDB oracle replays the estimate bit-for-bit (rank-pick the k-th
  * smallest distinct hash, then the same integer division).
  *
  * The buffer wraps its sorted array in a case class because
  * [[Encoders.product]] is the one stable public encoder constructor
  * for composite aggregation state.
  */
object Kmv {

  val HashSpace: Long = 1L << 32

  case class Buf(mins: Array[Long])
  case class Out(n_min: Int, kth: Long, est: Long)

  /** The k-smallest-distinct-longs buffer core, shared by the KMV
    * estimator and the bottom-k sampler ([[BottomK]]): sorted distinct
    * array capped at k, O(k) state, order-insensitive insert/merge.
    */
  private[functions] object SortedK {
    def insert(a: Array[Long], h: Long, k: Int): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(a, h)
      if (pos >= 0) a // already tracked
      else {
        val ins = -pos - 1
        if (ins >= k) a // larger than the current k-th minimum
        else {
          val n = math.min(a.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(a, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(a, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    // Union of two sorted distinct arrays, truncated to k: linear,
    // never re-sorts (the map-side buffers arrive already sorted).
    // Ascending consumption means the first k emitted are the k
    // smallest of the union, so stopping at k is exact.
    def merge(x: Array[Long], y: Array[Long], k: Int): Array[Long] = {
      val tmp = new Array[Long](math.min(x.length + y.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < tmp.length && (i < x.length || j < y.length)) {
        val v =
          if (j >= y.length) { i += 1; x(i - 1) }
          else if (i >= x.length) { j += 1; y(j - 1) }
          else if (x(i) < y(j)) { i += 1; x(i - 1) }
          else if (y(j) < x(i)) { j += 1; y(j - 1) }
          else { i += 1; j += 1; x(i - 1) } // equal: consume both once
        tmp(n) = v; n += 1
      }
      if (n == tmp.length) tmp else java.util.Arrays.copyOf(tmp, n)
    }
  }

  class KmvAggregator(k: Int) extends Aggregator[Long, Buf, Out] {
    require(k >= 2, s"k must be >= 2, got $k")

    def zero: Buf = Buf(Array.emptyLongArray)

    def reduce(b: Buf, h: Long): Buf = Buf(SortedK.insert(b.mins, h, k))

    def merge(a: Buf, b: Buf): Buf = Buf(SortedK.merge(a.mins, b.mins, k))

    def finish(b: Buf): Out = {
      val n = b.mins.length
      if (n < k) Out(n, if (n == 0) 0L else b.mins(n - 1), n.toLong)
      else Out(n, b.mins(k - 1), (k - 1).toLong * HashSpace / b.mins(k - 1))
    }

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** `sketch(k)(h)`: aggregate Column over a non-null h32 hash column;
    * returns struct<n_min, kth, est>.
    */
  def sketch(k: Int): Column => Column = {
    val f = udaf(new KmvAggregator(k), Encoders.scalaLong)
    h => f(h)
  }
}

/** Exact bottom-k-by-hash per group — deterministic uniform k-sampling
  * as a MERGEABLE aggregate: the k smallest `h32(id‖salt)`-ranked rows
  * of each group, with O(k) state per group per task that partial-
  * aggregates map-side and merges by sorted union (vs the window-sort
  * formulation, which shuffles and sorts every group member). The
  * caller packs (hash, id) into one long as `(h % 2^31)·2^31 + id` —
  * 31 bits each, BOTH truncated below the sign bit, so the packed
  * value stays non-negative and rank order IS numeric order (a full
  * 32-bit hash in the high half would go negative for h ≥ 2^31 and
  * invert the order); see q87 for the canonical packing and unpack.
  * Ids must fit 31 bits — at a wider id space the buffer becomes an
  * array of (hash, id) pairs, same [[Kmv.SortedK]] shape.
  */
object BottomK {

  /** Struct-wrapped result ([[Encoders.product]] is the stable public
    * encoder constructor, as with [[Kmv.Buf]]): `mins` are the k
    * smallest packed values, ascending.
    */
  case class Out(mins: Array[Long])

  class BottomKAggregator(k: Int) extends Aggregator[Long, Kmv.Buf, Out] {
    require(k >= 1, s"k must be >= 1, got $k")
    def zero: Kmv.Buf = Kmv.Buf(Array.emptyLongArray)
    def reduce(b: Kmv.Buf, h: Long): Kmv.Buf =
      Kmv.Buf(Kmv.SortedK.insert(b.mins, h, k))
    def merge(a: Kmv.Buf, b: Kmv.Buf): Kmv.Buf =
      Kmv.Buf(Kmv.SortedK.merge(a.mins, b.mins, k))
    def finish(b: Kmv.Buf): Out = Out(b.mins)
    def bufferEncoder: Encoder[Kmv.Buf] = Encoders.product[Kmv.Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** `agg(k)(packed)`: struct<mins: array<long>> of the k smallest
    * packed values.
    */
  def agg(k: Int): Column => Column = {
    val f = udaf(new BottomKAggregator(k), Encoders.scalaLong)
    h => f(h)
  }
}
