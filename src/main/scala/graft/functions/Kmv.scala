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

  class KmvAggregator(k: Int) extends Aggregator[Long, Buf, Out] {
    require(k >= 2, s"k must be >= 2, got $k")

    def zero: Buf = Buf(Array.emptyLongArray)

    def reduce(b: Buf, h: Long): Buf = insert(b, h)

    def merge(a: Buf, b: Buf): Buf = {
      // Union of two sorted distinct arrays, truncated to k: linear,
      // never re-sorts (the map-side buffers arrive already sorted).
      // Ascending consumption means the first k emitted are the k
      // smallest of the union, so stopping at k is exact.
      val x = a.mins; val y = b.mins
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
      Buf(if (n == tmp.length) tmp else java.util.Arrays.copyOf(tmp, n))
    }

    def finish(b: Buf): Out = {
      val n = b.mins.length
      if (n < k) Out(n, if (n == 0) 0L else b.mins(n - 1), n.toLong)
      else Out(n, b.mins(k - 1), (k - 1).toLong * HashSpace / b.mins(k - 1))
    }

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]

    private def insert(b: Buf, h: Long): Buf = {
      val a = b.mins
      val pos = java.util.Arrays.binarySearch(a, h)
      if (pos >= 0) b // already tracked
      else {
        val ins = -pos - 1
        if (ins >= k) b // larger than the current k-th minimum
        else {
          val n = math.min(a.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(a, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(a, ins, out, ins + 1, n - ins - 1)
          Buf(out)
        }
      }
    }
  }

  /** `sketch(k)(h)`: aggregate Column over a non-null h32 hash column;
    * returns struct<n_min, kth, est>.
    */
  def sketch(k: Int): Column => Column = {
    val f = udaf(new KmvAggregator(k), Encoders.scalaLong)
    h => f(h)
  }
}
