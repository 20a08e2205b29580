package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.stream.StreamSchemaGate

/** Streaming-regime pins for q242 beyond its DuckDB oracle: the gate
  * distinguishes schema DRIFT (all-null required field → quarantine)
  * from ordinary dirty data (partial nulls → apply), and retried
  * batches rewrite identical artifacts.
  */
class StreamSchemaGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkBatch(vals: Seq[java.lang.Double]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("event_id", "value")
  }

  test("q242 gate: all-null required field quarantines, partial nulls apply") {
    val root = java.nio.file.Files.createTempDirectory("ssg-spec-").toString
    val drifted = mkBatch(Seq(null, null, null))
    val dirty = mkBatch(Seq(1.5, null, 2.5))
    assert(!StreamSchemaGate.step(drifted, 0L, "value",
      s"$root/a", s"$root/q", s"$root/v"), "all-null must quarantine")
    assert(StreamSchemaGate.step(dirty, 1L, "value",
      s"$root/a", s"$root/q", s"$root/v"), "partial nulls must pass (P10's job)")
    assert(spark.read.parquet(s"$root/q/b0").count() === 3L)
    assert(spark.read.parquet(s"$root/a/b1").count() === 3L)
    val v = spark.read.parquet(s"$root/v/b0", s"$root/v/b1")
      .orderBy("batch_id").collect()
    assert(v.map(_.getAs[Boolean]("applied")).toSeq === Seq(false, true))
    graft.queries.Scratch.rmTree(root)
  }

  test("q242 gate: a retried batch rewrites identical artifacts") {
    val root = java.nio.file.Files.createTempDirectory("ssg-spec-").toString
    val b = mkBatch(Seq(3.5, 4.5))
    StreamSchemaGate.step(b, 2L, "value", s"$root/a", s"$root/q", s"$root/v")
    val first = spark.read.parquet(s"$root/a/b2").collect().toSeq
    StreamSchemaGate.step(b, 2L, "value", s"$root/a", s"$root/q", s"$root/v")
    assert(spark.read.parquet(s"$root/a/b2").collect().toSeq === first)
    graft.queries.Scratch.rmTree(root)
  }
}
