package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.NativeRange

/** The native broadcast range join pinned to (a) the composed
  * bin-blocked implementation and (b) the naive all-pairs predicate,
  * on randomized data with boundary-exact points, empty/inverted
  * intervals, duplicate starts, fully-nested intervals (the prefix-
  * max-end cut's hard case), and null timestamps/bounds.
  */
class NativeRangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native == composed == naive on random intervals") {
    val rnd = new scala.util.Random(23)
    val points = (1 to 400).map(i => (i.toLong, rnd.nextInt(1000).toLong * 10L))
    val ivs = (1 to 80).map { i =>
      val s = rnd.nextInt(1000).toLong * 10L
      // widths 0..590 incl. empty; a few fully-nested long intervals
      val len = if (i % 17 == 0) 5000L else rnd.nextInt(60).toLong * 10L
      (i.toLong, s, s + len)
    }
    val expected = (for {
      (pid, ts) <- points
      (iid, s, e) <- ivs
      if ts >= s && ts < e
    } yield (pid, iid)).toSet

    val pdf = points.toDF("pid", "ts")
    val idf = ivs.toDF("iid", "s_us", "e_us")

    val native = NativeRange
      .pointsInIntervals(pdf, "ts", idf, "s_us", "e_us")
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(native.length === native.toSet.size, "duplicate pairs")
    assert(native.toSet === expected)

    val composed = graft.ops.RangeJoin
      .pointsInIntervals(pdf, "ts", idf, "s_us", "e_us", 100L)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native.toSet === composed)
  }

  test("nulls never match; empty interval side joins nothing") {
    val pdf = Seq((1L, Some(50L)), (2L, None), (3L, Some(100L)))
      .toDF("pid", "ts")
    val idf = Seq((1L, Some(40L), Some(60L)), (2L, None, Some(999L)),
      (3L, Some(90L), None)).toDF("iid", "s_us", "e_us")
    val got = NativeRange.pointsInIntervals(pdf, "ts", idf, "s_us", "e_us")
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L)))

    val none = NativeRange.pointsInIntervals(
      pdf, "ts", idf.filter(col("iid") < 0L), "s_us", "e_us")
    assert(none.count() === 0L)
  }

  test("planned through the custom exec with no exchange") {
    val pdf = Seq((1L, 5L)).toDF("pid", "ts")
    val idf = Seq((1L, 0L, 10L)).toDF("iid", "s_us", "e_us")
    val plan = NativeRange.pointsInIntervals(pdf, "ts", idf, "s_us", "e_us")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"))
  }
}
