package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression guard for [[Tables.events]] against harness testdata
  * regenerations. The driver has shipped `events.ts` in two physical
  * encodings so far — int64 nanoseconds (round ≤5) and a plain
  * microsecond TIMESTAMP (round 6, which silently broke 38/151
  * registered queries because the loader assumed nanos). This spec
  * writes one tiny fixture per encoding and asserts the loader
  * normalizes BOTH to the same microsecond TimestampType values, so
  * the next regeneration cannot take out a third of the registry
  * unnoticed.
  */
class EventsSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 2021-06-01T00:00:00Z and one microsecond later, as epoch micros
  private val usA = 1622505600000000L
  private val usB = 1622505600000001L

  private def writeFixture(tsCol: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evfix-").toString
    Seq((1L, usA), (2L, usB)).toDF("event_id", "us")
      .select(col("event_id"), tsCol.as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loadedMicros(dir: String): Seq[(Long, Long)] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      s"loader must normalize ts to TimestampType, got ${df.schema("ts").dataType}")
    df.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
  }

  test("events loader adapts to int64-nanos ts (legacy testdata)") {
    val dir = writeFixture((col("us") * 1000L).cast(LongType))
    assert(loadedMicros(dir) === Seq((1L, usA), (2L, usB)))
  }

  test("events loader adapts to timestamp-typed ts (current testdata)") {
    // parquet timestamp(us, isAdjustedToUTC=false) → Spark TIMESTAMP_NTZ,
    // exactly what pyarrow reports for the regenerated harness files
    val dir = writeFixture(timestamp_micros(col("us")).cast(TimestampNTZType))
    assert(loadedMicros(dir) === Seq((1L, usA), (2L, usB)))
  }

  test("events loader adapts to session-tz timestamp ts") {
    val dir = writeFixture(timestamp_micros(col("us")))
    assert(loadedMicros(dir) === Seq((1L, usA), (2L, usB)))
  }

  test("events loader rejects an unrecognized ts encoding loudly") {
    val dir = writeFixture(col("us").cast(StringType))
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported physical type"))
  }
}
