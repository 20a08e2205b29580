package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.stream.StreamPsi

/** Streaming-regime pins for q205 beyond its DuckDB oracle: retry
  * idempotence (the Overwrite-per-batch-id contract) and the zero-
  * drift law (a window distributed identically to the reference must
  * score PSI ≈ 0 — exactly 0 in the round-6 fixed-point arithmetic
  * when counts are equal).
  */
class StreamPsiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkBatch(bins: Seq[Long]) = {
    import spark.implicits._
    bins.toDF("bin")
  }

  test("q205 step: identical distributions score exactly zero PSI") {
    val root = java.nio.file.Files.createTempDirectory("psi-spec-").toString
    val bins = Seq(1L, 1L, 2L, 2L, 2L, 3L)
    StreamPsi.step(mkBatch(bins), 0L, s"$root/ref", s"$root/v")
    StreamPsi.step(mkBatch(bins), 1L, s"$root/ref", s"$root/v")
    val row = spark.read.parquet(s"$root/v/b1").head()
    assert(row.getAs[Long]("n_bins") === 3L)
    assert(row.getAs[Long]("n_ref") === 6L)
    assert(row.getAs[Long]("n_cur") === 6L)
    assert(row.getAs[Double]("psi6") === 0.0,
      "equal histograms must score exactly zero drift")
    graft.queries.Scratch.rmTree(root)
  }

  test("q205 step: a retried batch id rewrites the identical verdict") {
    val root = java.nio.file.Files.createTempDirectory("psi-spec-").toString
    StreamPsi.step(mkBatch(Seq(1L, 2L, 2L)), 0L, s"$root/ref", s"$root/v")
    val drifted = Seq(1L, 1L, 1L, 3L)
    StreamPsi.step(mkBatch(drifted), 1L, s"$root/ref", s"$root/v")
    val first = spark.read.parquet(s"$root/v/b1").collect().toSeq
    StreamPsi.step(mkBatch(drifted), 1L, s"$root/ref", s"$root/v")
    val second = spark.read.parquet(s"$root/v/b1").collect().toSeq
    assert(first === second, "retry must rewrite the same artifact")
    assert(first.head.getAs[Double]("psi6") > 0.0,
      "a shifted histogram must score positive drift")
    graft.queries.Scratch.rmTree(root)
  }

  test("q205: monitor readings partition the non-reference events") {
    val rows = graft.queries.Registry.byName("q205_stream_psi")
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getAs[Long]("window_id")).toSeq === Seq(1L, 2L))
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val n = ev.count()
    val nRef = rows.head.getAs[Long]("n_ref")
    assert(rows.forall(_.getAs[Long]("n_ref") === nRef),
      "both windows compare against the same frozen reference")
    val covered = nRef + rows.map(_.getAs[Long]("n_cur")).sum
    assert(covered === n, s"ref+windows must partition the $n events")
    rows.foreach(r => assert(r.getAs[Double]("psi6") >= 0.0))
  }
}
