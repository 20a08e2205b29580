package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsOf

/** The union+window as-of join pinned to a naive per-row reference
  * (scan all right rows, keep the max (ts, seq) with ts <= left.ts) on
  * random data with deliberate timestamp collisions.
  */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("backward as-of == naive reference, ties included") {
    val rnd = new scala.util.Random(23)
    // coarse ts grid (0..19 seconds) over 5 keys forces plenty of
    // equal-ts collisions on both sides
    def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    val lrows = (1 to 120).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, ts(rnd.nextInt(20))))
    val rrows = (1 to 150).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, ts(rnd.nextInt(20)), rnd.nextInt(100).toDouble))

    val left = lrows.toDF("lid", "k", "ts")
    val right = rrows.toDF("rid", "k", "ts", "payload")

    val got = AsOf
      .backward(left, right, "k", "ts", "lid", "rid", Seq("payload"))
      .select(col("lid"), col("asof_rid"), col("asof_payload"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet

    val expected = lrows.map { case (lid, k, lts) =>
      val candidates = rrows.filter(r => r._2 == k && !r._3.after(lts))
      if (candidates.isEmpty) (lid, None, None)
      else {
        val best = candidates.maxBy(r => (r._3.getTime, r._1))
        (lid, Some(best._1), Some(best._4))
      }
    }.toSet

    assert(got === expected)
    assert(lrows.size === got.size)
  }
}
