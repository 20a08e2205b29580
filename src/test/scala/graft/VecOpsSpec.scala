package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Portable, RhOps}

/** Native vector expressions must match the HOF folds they replaced —
  * including null/length-mismatch propagation.
  */
class VecOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("dot ≡ HOF fold bit-for-bit, incl. null and length-mismatch") {
    val rows = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),       // 32.0
      (Seq(0.1, 0.2), Seq(0.3, 0.4)),                  // inexact doubles
      (Seq(1.0), Seq(1.0, 2.0)),                       // length mismatch -> null
      (Seq.empty[Double], Seq.empty[Double]))          // 0.0
      .toDF("a", "b")
    val native = rows.select(Portable.dot(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val hof = rows.select(hofDot(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(native.toSeq === hof.toSeq)
    assert(native(0) === Some(32.0))
    assert(native(2) === None)
  }

  test("norm2 ≡ HOF fold") {
    val rows = Seq(Seq(3.0, 4.0), Seq.empty[Double]).toDF("a")
    val native = rows.select(Portable.norm2(col("a"))).collect().map(_.getDouble(0))
    assert(native.toSeq === Seq(25.0, 0.0))
  }

  test("band keys: wrong dimension or null zeroes all keys") {
    val rows = Seq(
      Seq.fill(64)(0.5),            // well-formed
      Seq.fill(10)(0.5))            // wrong dim -> [0,0,0,0]
      .toDF("v")
    val keys = rows.select(RhOps.bandKeysCol(col("v"))).collect()
      .map(_.getSeq[Int](0))
    assert(keys(0).length === RhOps.bands)
    assert(keys(1) === Seq(0, 0, 0, 0))
    // all-positive vector projects positively on every plane whose
    // weight sum is positive; keys must be deterministic across runs
    val again = rows.select(RhOps.bandKeysCol(col("v"))).collect()
      .map(_.getSeq[Int](0))
    assert(keys.toSeq === again.toSeq)
  }

  test("probed band keys: base slots match bandKeys; probes are the T smallest multi-bit flips by (margin sum, mask)") {
    val rnd = new scala.util.Random(7)
    val ppb = 9
    // t=4 exercises the no-3-bit regime (a 3-bit flip needs T >= 7 for
    // its 6 proper subsets); t=10 exercises 3-bit admission
    for (t <- Seq(4, 10); _ <- 0 until 20) {
      val v = Array.fill(64)(rnd.nextDouble() * 2 - 1)
      val rows = Seq(v.toSeq).toDF("v")
      val base = rows.select(RhOps.bandKeysCol(col("v"), ppb))
        .collect().head.getSeq[Int](0)
      val probed = rows.select(RhOps.probedBandKeysCol(col("v"), ppb, t))
        .collect().head.getSeq[Int](0)
      assert(probed.length === RhOps.bands * (t + 1))
      // independently recompute margins from the shared weight matrix
      val scaled = v.map(x => math.floor(x * 1e9).toLong)
      (0 until RhOps.bands).foreach { b =>
        assert(probed(b * (t + 1)) === base(b), "base slot diverged")
        val margins = (0 until ppb).map { j =>
          val w = RhOps.weights(b * ppb + j)
          math.abs((0 until 64).map(i => scaled(i) * w(i)).sum)
        }
        // the documented selection rule, recomputed the naive way:
        // EVERY 1-/2-/3-bit flip over ALL planes (no prune — the prune
        // must be behavior-preserving), ranked by (margin sum, mask)
        val all = (1 until (1 << ppb)).filter(m =>
            java.lang.Integer.bitCount(m) <= (if (t >= 7) 3 else 2))
          .map { m =>
            val score = (0 until ppb).filter(j => (m & (1 << j)) != 0)
              .map(margins).sum
            (score, m)
          }
        val expectMasks = all.sortBy { case (s, m) => (s, m) }.take(t).map(_._2)
        val gotMasks = (0 until t).map(k => probed(b * (t + 1) + 1 + k) ^ base(b))
        assert(gotMasks.toSet === expectMasks.toSet,
          s"band $b t=$t: masks $gotMasks vs expected $expectMasks")
      }
    }
  }
}
