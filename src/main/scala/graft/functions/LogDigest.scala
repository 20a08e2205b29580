package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Log-scaled histogram quantile sketch as a typed [[Aggregator]] —
  * the MERGEABLE drop-in the q78/q95 scaladoc names for quantiles at
  * 100 TB (the t-digest seat, filled by the digest family member that
  * is exactly replayable): per-group state is a bounded bin→count map,
  * partials collapse map-side like any algebraic aggregate, and merge
  * is bin-wise addition — no per-row sort anywhere.
  *
  * Binning is HDR/DDSketch-style but INTEGER-EXACT (the q95
  * decimal-bin trick extended from linear to log scale): for x ≥ 1,
  * octave e = floor(log2(x)) via bit position, sub-bin
  * floor((x − 2^e)·S / 2^e) — all integer arithmetic, so a DuckDB
  * oracle reproduces every bin id and every reconstructed bound
  * bit-for-bit (no float crosses the engine boundary). A t-digest
  * proper trades this replayability away: its centroids depend on
  * merge ORDER, which a shuffle does not fix — the wrong determinism
  * contract for an oracle-gated engine.
  *
  * Guarantees: bins per octave = S, so a reconstructed quantile's
  * lower bound lb satisfies lb ≤ q_exact < lb·(1 + 1/S) + 1 — bounded
  * RELATIVE error 1/S (LogDigestSpec pins it against exact
  * quantiles), with at most S·(64 − numberOfLeadingZeros(max)) bins
  * total (S=16 over token counts ≤ 2^21 → ≤ 336 bins/group, a few KB
  * of state vs q78's full per-group sort). Values below 2^e < S are
  * binned EXACTLY (bin width < 1). Non-positive inputs are the
  * caller's filter (a log scale has no bin for them — q133 filters,
  * as the reference pipelines drop empty docs before length stats).
  */
object LogDigest {

  /** Largest accepted input: keeps `(x − base) · s` inside a Long for
    * every legal S (2^50 · 2^12 = 2^62). Count-like measures (tokens,
    * bytes, rows) live far below this; a wider domain would swap the
    * sub-bin product for `Math.multiplyHigh` 128-bit arithmetic — the
    * guard fails loudly instead of wrapping into phantom bins.
    */
  val MaxInput: Long = 1L << 50

  /** Integer-exact bin id for 1 ≤ x ≤ [[MaxInput]] with S sub-bins per
    * octave.
    */
  def binOf(x: Long, s: Int): Long = {
    require(x >= 1, s"log bins need x >= 1, got $x")
    require(x <= MaxInput,
      s"x=$x above the 2^50 overflow guard (see LogDigest.MaxInput)")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val base = 1L << e
    e.toLong * s + (x - base) * s / base
  }

  /** Smallest x mapping to `bin` — the deterministic reconstruction
    * point (a conservative lower bound of any quantile in the bin).
    */
  def lowerBound(bin: Long, s: Int): Long = {
    val e = (bin / s).toInt
    val sub = bin % s
    val base = 1L << e
    base + (sub * base + s - 1) / s
  }

  case class Buf(counts: Map[Long, Long])
  /** Parallel ascending-bin arrays (struct-of-arrays keeps the output
    * encoder on [[Encoders.product]], the Kmv/BottomK convention).
    */
  case class Out(bins: Array[Long], counts: Array[Long])

  class LogDigestAggregator(s: Int) extends Aggregator[Long, Buf, Out] {
    require(s >= 2 && s <= 4096, s"sub-bins per octave out of range: $s")

    def zero: Buf = Buf(Map.empty)

    def reduce(b: Buf, x: Long): Buf = {
      val bin = binOf(x, s)
      Buf(b.counts.updated(bin, b.counts.getOrElse(bin, 0L) + 1L))
    }

    def merge(a: Buf, b: Buf): Buf = {
      val (big, small) = if (a.counts.size >= b.counts.size) (a, b) else (b, a)
      Buf(small.counts.foldLeft(big.counts) { case (m, (bin, c)) =>
        m.updated(bin, m.getOrElse(bin, 0L) + c)
      })
    }

    def finish(b: Buf): Out = {
      val sorted = b.counts.toArray.sortBy(_._1)
      Out(sorted.map(_._1), sorted.map(_._2))
    }

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** `sketch(s)(x)`: aggregate Column over a positive long column;
    * returns struct<bins: array<long>, counts: array<long>>.
    */
  def sketch(s: Int): Column => Column = {
    val f = udaf(new LogDigestAggregator(s), Encoders.scalaLong)
    x => f(x)
  }
}
