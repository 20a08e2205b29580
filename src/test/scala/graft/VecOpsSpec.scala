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

  test("probed band keys: base slots match bandKeys; probes flip exactly the lowest-|margin| planes") {
    val rnd = new scala.util.Random(7)
    val ppb = 9
    val t = 4
    (0 until 20).foreach { _ =>
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
        val expectFlips = margins.zipWithIndex.sortBy { case (m, j) => (m, j) }
          .take(t).map(_._2)
        val gotFlips = (0 until t).map { k =>
          val x = probed(b * (t + 1) + 1 + k) ^ base(b)
          assert(java.lang.Integer.bitCount(x) === 1, "probe must flip one bit")
          java.lang.Integer.numberOfTrailingZeros(x)
        }
        assert(gotFlips.toSet === expectFlips.toSet,
          s"band $b: flips $gotFlips vs expected lowest-margin $expectFlips")
        // and in increasing-margin order
        assert(gotFlips === expectFlips)
      }
    }
  }
}
