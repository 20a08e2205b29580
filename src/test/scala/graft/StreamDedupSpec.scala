package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming companion to the batch dedup suite (q21/q67): ingest-time
  * exact dedup via watermarked `dropDuplicatesWithinWatermark` on the
  * content fingerprint. The state store keeps one entry per fingerprint
  * only until the watermark passes it — bounded state at 100 TB/day,
  * unlike an unbounded `dropDuplicates` — and duplicates arriving in
  * ANY later micro-batch inside the watermark horizon are suppressed
  * exactly-once.
  */
class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("watermarked fingerprint dedup suppresses cross-batch duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = input.toDF().toDF("ts", "text")
      .withColumn("fingerprint", md5(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fingerprint")

    val query = deduped.writeStream
      .format("memory").queryName("dedupspec")
      .outputMode(OutputMode.Append())
      .start()

    // batch 1: two distinct docs + an in-batch duplicate
    input.addData((ts(1), "alpha"), (ts(2), "beta"), (ts(3), "alpha"))
    query.processAllAvailable()
    // batch 2: a cross-batch duplicate inside the watermark horizon
    // must be suppressed; a new doc passes
    input.addData((ts(5), "alpha"), (ts(6), "gamma"))
    query.processAllAvailable()
    query.stop()

    val texts = spark.table("dedupspec").collect().map(_.getAs[String]("text"))
    assert(texts.sorted === Array("alpha", "beta", "gamma"))
  }
}
