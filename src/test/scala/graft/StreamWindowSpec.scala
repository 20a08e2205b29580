package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** T7 (the streaming extension beyond reference parity): event-time
  * tumbling-window aggregation with a watermark — late data beyond the
  * watermark is dropped, closed windows finalize exactly once in
  * append mode.
  */
class StreamWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("watermarked tumbling windows finalize and drop late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val counts = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("w"), col("n"))

    val query = counts.writeStream
      .format("memory").queryName("winspec")
      .outputMode(OutputMode.Append())
      .start()

    // window [10:00, 10:10): 3 events; then advance past watermark
    input.addData((ts(1), 1L), (ts(4), 2L), (ts(9), 3L))
    query.processAllAvailable()
    input.addData((ts(20), 4L)) // watermark -> 10:15, closes the first window
    query.processAllAvailable()
    // a straggler inside the CLOSED window must be dropped
    input.addData((ts(2), 9L))
    query.processAllAvailable()
    input.addData((ts(40), 5L)) // closes the 10:20 window
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("winspec").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("2026-01-01 10:00:00") === 3) // straggler NOT counted
    assert(rows("2026-01-01 10:20:00") === 1)
  }
}
