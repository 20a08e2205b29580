package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** HyperLogLog distinct-count sketch (Flajolet et al., AofA'07) as a
  * mergeable typed [[Aggregator]] — the fixed-memory sibling of [[Kmv]]
  * for COUNT(DISTINCT) GROUP BY at 100 TB: m = 512 byte registers per
  * group per task (vs KMV's k longs), register-wise max merge, map-side
  * combine like any algebraic aggregate.
  *
  * PORTABILITY is the design constraint (the whole sketch must replay
  * bit-for-bit in a DuckDB oracle), so the rank function uses TRAILING
  * zeros, not the usual leading zeros: with h = [[Portable.h32]] (32
  * bits), idx = h mod m and w = h div m (23 bits), rho(w) =
  * trailing_zeros(w) + 1 (w = 0 → 24). Trailing zeros are exact
  * integer algebra in ANY engine — `bit_count((w & -w) - 1)` — where
  * leading zeros need a floor(log2) that can land on a libm boundary.
  * For a uniform hash the trailing-zero geometric law is identical to
  * the leading-zero one, so the standard estimator applies unchanged.
  *
  * The finish emits INTEGER evidence, not the estimate: v_zero (empty
  * registers) and t_total = Σ_j 2^(24 − M[j]) — each term a power of
  * two ≤ 2^24, the sum < 2^33, so t_total is EXACT and order-free.
  * The caller derives the estimate (`alpha·m²·2^24 / t_total`, with
  * the small-range correction `m·ln(m/v_zero)` when it applies) in
  * one closed-form expression the oracle states identically — the
  * only floating-point anywhere is that final shared formula.
  */
object Hll {

  val P: Int = 9
  val M: Int = 1 << P          // 512 registers
  val WBits: Int = 32 - P      // 23-bit remainder word
  val MaxRho: Int = WBits + 1  // rho of w == 0

  case class Buf(regs: Array[Byte])
  case class Out(v_zero: Long, t_total: Long)

  class HllAggregator extends Aggregator[Long, Buf, Out] {

    def zero: Buf = Buf(Array.emptyByteArray)

    private def rho(w: Long): Int =
      if (w == 0L) MaxRho
      else java.lang.Long.numberOfTrailingZeros(w) + 1

    def reduce(b: Buf, h: Long): Buf = {
      val regs = if (b.regs.isEmpty) new Array[Byte](M) else b.regs
      val idx = (h % M).toInt
      val r = rho(h / M)
      if (r > regs(idx)) {
        val out = if (regs eq b.regs) regs.clone() else regs
        out(idx) = r.toByte
        Buf(out)
      } else Buf(regs)
    }

    def merge(a: Buf, b: Buf): Buf =
      if (a.regs.isEmpty) b
      else if (b.regs.isEmpty) a
      else {
        val out = a.regs.clone()
        var i = 0
        while (i < M) {
          if (b.regs(i) > out(i)) out(i) = b.regs(i)
          i += 1
        }
        Buf(out)
      }

    def finish(b: Buf): Out = {
      val regs = if (b.regs.isEmpty) new Array[Byte](M) else b.regs
      var v = 0L
      var t = 0L
      var i = 0
      while (i < M) {
        if (regs(i) == 0) v += 1L
        t += 1L << (MaxRho - regs(i))
        i += 1
      }
      Out(v, t)
    }

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** `hll(h)`: aggregate Column over a non-null h32 hash column;
    * returns struct<v_zero, t_total>.
    */
  lazy val hll: Column => Column = {
    val f = udaf(new HllAggregator, Encoders.scalaLong)
    h => f(h)
  }

  /** The shared estimator formula over the integer evidence, as a SQL
    * expression string both engines evaluate identically (`vz`/`tt`
    * are column names): alpha_m · m² · 2^24 / t_total, replaced by the
    * small-range correction m·ln(m/V) when E ≤ 2.5m and V > 0.
    */
  def estimateSql(vz: String, tt: String): String = {
    // CASTs pin the literals to DOUBLE in BOTH engines: Spark parses
    // bare `0.7213` as DECIMAL and evaluates alpha in decimal
    // arithmetic, ~2e-8 off DuckDB's double — invisible at round-6
    // for small estimates, a real mismatch at sf0.1 magnitudes
    // (q235's est 1438.640864 vs 1438.640832, caught by the strict
    // sweep).
    val alpha =
      s"CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / $M)"
    val raw = s"$alpha * $M * $M * 16777216 / $tt"
    s"""round(CASE WHEN ($raw) <= 2.5 * $M AND $vz > 0
          THEN $M * ln(CAST($M AS DOUBLE) / $vz)
          ELSE ($raw) END, 6)"""
  }
}
