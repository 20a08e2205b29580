package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Whole-vector element-wise sum as a mergeable typed [[Aggregator]] —
  * the scale path for centroid / mean-pooling aggregation over an
  * embedding column.
  *
  * The explode formulation ([[graft.search.IvfKmeans.train]] step 2:
  * `posexplode` → groupBy(cell, dim)) is oracle-friendly but pays a D×
  * row blow-up in the scan stage: 100 TB of 1024-dim vectors becomes
  * 100k TB of (cell, dim, value) rows BEFORE partial aggregation
  * compresses them. This aggregator keeps the vector whole: partial
  * state is ONE (sums: Array[Long], n: Long) buffer per group per
  * task, reduce adds D longs in a tight loop, merge is element-wise —
  * the exchange carries groups·1 rows (each a D-long array), zero row
  * expansion anywhere. Same algebraic-aggregate contract as [[Kmv]] /
  * [[LogDigest]]: map-side combine applies, state is O(D) not O(rows).
  *
  * Arithmetic is exact: inputs are the codebase's standard `floor(x ·
  * 1e6)` long quantization (IvfKmeans.scala:27 — exact in IEEE double
  * for |x| < 1e3), sums stay < 2^52, so the result is bit-identical to
  * any DuckDB replay regardless of partitioning or merge order.
  *
  * The first vector seen defines the dimensionality; a later vector of
  * a DIFFERENT length is a data error and fails loudly (silent
  * truncation would corrupt every downstream centroid).
  */
object VecSum {

  case class In(q: Seq[Long])
  case class Buf(s: Array[Long], n: Long)
  case class Out(s: Array[Long], n: Long)

  class VecSumAggregator extends Aggregator[In, Buf, Out] {

    def zero: Buf = Buf(Array.emptyLongArray, 0L)

    private def add(acc: Array[Long], v: Seq[Long]): Array[Long] =
      if (acc.isEmpty) v.toArray
      else {
        require(acc.length == v.length,
          s"vec_sum: mixed dimensionality ${acc.length} vs ${v.length}")
        val out = acc.clone()
        var i = 0
        while (i < out.length) { out(i) += v(i); i += 1 }
        out
      }

    def reduce(b: Buf, in: In): Buf =
      if (in.q == null) b else Buf(add(b.s, in.q), b.n + 1L)

    def merge(a: Buf, b: Buf): Buf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else Buf(add(a.s, b.s.toSeq), a.n + b.n)

    def finish(b: Buf): Out = Out(b.s, b.n)

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** `vecSum(q)`: aggregate Column over an array<long> column; returns
    * struct<s: array<long>, n: long> — element-wise sums and the row
    * count (centroid = floor(s[i] / n), divided by the caller so the
    * raw sums stay exact for downstream merges).
    */
  lazy val vecSum: Column => Column = {
    // a single-field product encoder binds the bare array column (the
    // ScalaAggregator input schema is the encoder's one field)
    val f = udaf(new VecSumAggregator, Encoders.product[In])
    q => f(q)
  }

  /** Element-wise ABS-MAX over a vector column — the per-dimension
    * scale pass of int8 quantization (q167), same whole-vector O(D)
    * state and merge-order-free integer arithmetic as [[vecSum]].
    */
  class VecAbsMaxAggregator extends Aggregator[In, Buf, Out] {

    private def absMax(acc: Array[Long], v: Seq[Long]): Array[Long] =
      if (acc.isEmpty) {
        val out = new Array[Long](v.length)
        var i = 0
        while (i < out.length) { out(i) = math.abs(v(i)); i += 1 }
        out
      } else {
        require(acc.length == v.length,
          s"vec_abs_max: mixed dimensionality ${acc.length} vs ${v.length}")
        val out = acc.clone()
        var i = 0
        while (i < out.length) {
          val a = math.abs(v(i))
          if (a > out(i)) out(i) = a
          i += 1
        }
        out
      }

    def zero: Buf = Buf(Array.emptyLongArray, 0L)
    def reduce(b: Buf, in: In): Buf =
      if (in.q == null) b else Buf(absMax(b.s, in.q), b.n + 1L)
    def merge(a: Buf, b: Buf): Buf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else Buf(absMax(a.s, b.s.toSeq), a.n + b.n)
    def finish(b: Buf): Out = Out(b.s, b.n)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** `vecAbsMax(q)`: struct<s: array<long>, n: long> — per-dimension
    * max of |v| and the row count.
    */
  lazy val vecAbsMax: Column => Column = {
    val f = udaf(new VecAbsMaxAggregator, Encoders.product[In])
    q => f(q)
  }
}
