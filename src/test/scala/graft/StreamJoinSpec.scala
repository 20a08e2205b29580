package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Watermarked STREAM-STREAM interval join (the last streaming join
  * family the repo's T-coverage didn't exercise): purchases joined to
  * all clicks of the same user within the preceding 10 minutes, both
  * sides fed out of order across micro-batches. The contract is the
  * batch closed form — same rows, emitted in append mode; the dual
  * watermark + time-range condition is what lets Spark bound both
  * sides' join state (state for a side is dropped once the other
  * side's watermark passes its range end — unbounded state otherwise).
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-02-01 09:$minute%02d:00")

  private val clicks = Seq( // (user_id, cts, click_id)
    (1L, ts(0), 100L), (1L, ts(7), 101L), (1L, ts(30), 102L),
    (2L, ts(5), 200L), (2L, ts(12), 201L))
  private val purchases = Seq( // (user_id, pts, purchase_id)
    (1L, ts(8), 900L),  // matches clicks 100 (gap 8m) + 101 (1m)
    (1L, ts(35), 901L), // matches click 102 only (gap 5m; 100/101 outside)
    (2L, ts(13), 902L), // matches 200 (8m) + 201 (1m)
    (3L, ts(10), 903L)) // no clicks at all

  test("stream-stream interval join == batch closed form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val cIn = MemoryStream[(Long, Timestamp, Long)]
    val pIn = MemoryStream[(Long, Timestamp, Long)]
    val cs = cIn.toDS().toDF("c_user", "cts", "click_id")
      .withWatermark("cts", "15 minutes")
    val ps = pIn.toDS().toDF("p_user", "pts", "purchase_id")
      .withWatermark("pts", "15 minutes")
    val joined = ps.join(cs,
      col("p_user") === col("c_user") &&
        col("cts") >= col("pts") - expr("interval 10 minutes") &&
        col("cts") <= col("pts"))
      .select(col("purchase_id"), col("click_id"))

    val query = joined.writeStream
      .format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append())
      .start()

    // out-of-order feed: some purchases arrive before their clicks
    pIn.addData(purchases.take(2): _*)
    cIn.addData(clicks.take(2): _*)
    query.processAllAvailable()
    cIn.addData(clicks.drop(2): _*)
    pIn.addData(purchases.drop(2): _*)
    query.processAllAvailable()
    // push both watermarks far ahead so every pending match flushes
    cIn.addData((99L, Timestamp.valueOf("2026-02-01 11:00:00"), 999L))
    pIn.addData((99L, Timestamp.valueOf("2026-02-01 11:00:00"), 998L))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("ssjoin")
      .filter(col("purchase_id") < 990)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val batch = purchases.toDF("p_user", "pts", "purchase_id")
      .join(clicks.toDF("c_user", "cts", "click_id"),
        col("p_user") === col("c_user") &&
          col("cts") >= col("pts") - expr("interval 10 minutes") &&
          col("cts") <= col("pts"))
      .select(col("purchase_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed === batch)
    assert(batch === Set((900L, 100L), (900L, 101L), (901L, 102L),
      (902L, 200L), (902L, 201L)))
  }
}
