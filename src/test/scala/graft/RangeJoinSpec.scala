package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** The bin-blocked range join pinned to the naive all-pairs predicate
  * on random data, with bin widths smaller than / equal to / larger
  * than the interval lengths, boundary-exact points, and degenerate
  * (empty / inverted) intervals.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(
      points: Seq[(Long, Long)],
      ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (pid, ts) <- points
      (iid, s, e) <- ivs
      if ts >= s && ts < e
    } yield (pid, iid)).toSet

  test("bin-blocked == naive all-pairs across bin widths") {
    val rnd = new scala.util.Random(17)
    // timestamps on a coarse grid so interval endpoints collide with
    // point timestamps (half-open boundary is exercised both ways)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextInt(1000).toLong * 10L))
    val ivs = (1 to 60).map { i =>
      val s = rnd.nextInt(1000).toLong * 10L
      (i.toLong, s, s + (rnd.nextInt(30).toLong * 10L)) // len 0..290, some empty
    }
    val pdf = points.toDF("pid", "ts")
    val idf = ivs.toDF("iid", "s_us", "e_us")
    val expected = naive(points, ivs)
    for (bin <- Seq(7L, 100L, 300L, 20000L)) {
      val got = RangeJoin
        .pointsInIntervals(pdf, "ts", idf, "s_us", "e_us", bin)
        .select(col("pid"), col("iid"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"duplicate pairs at bin=$bin")
      assert(got.toSet === expected, s"pair set mismatch at bin=$bin")
    }
  }

  test("inverted and empty intervals match nothing") {
    val pdf = Seq((1L, 50L), (2L, 100L)).toDF("pid", "ts")
    val idf = Seq((1L, 100L, 100L), (2L, 200L, 40L)).toDF("iid", "s_us", "e_us")
    assert(RangeJoin.pointsInIntervals(pdf, "ts", idf, "s_us", "e_us", 30L)
      .count() === 0L)
  }

  test("boundary semantics: start inclusive, end exclusive") {
    val pdf = Seq((1L, 100L), (2L, 199L), (3L, 200L)).toDF("pid", "ts")
    val idf = Seq((9L, 100L, 200L)).toDF("iid", "s_us", "e_us")
    val got = RangeJoin.pointsInIntervals(pdf, "ts", idf, "s_us", "e_us", 64L)
      .select("pid").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
  }
}
