package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.stream.StreamCusum

/** Streaming-regime pins for q232 beyond its DuckDB oracle: the
  * cross-batch walk equals the sequential textbook recursion over the
  * concatenated monitoring windows, and a retried batch id rewrites
  * identical state and verdict artifacts.
  */
class StreamCusumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkBatch(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("d", "v6").select(to_date(col("d")).as("day"), col("v6"))
  }

  test("q232 step: cross-batch walk equals the sequential recursion") {
    val root = java.nio.file.Files.createTempDirectory("cusum-spec-").toString
    val cal = Seq(("2024-01-01", 100L), ("2024-01-02", 120L),
      ("2024-01-03", 80L))
    val w1 = Seq(("2024-01-04", 300L), ("2024-01-05", 90L))
    val w2 = Seq(("2024-01-06", 400L), ("2024-01-07", 50L))
    StreamCusum.step(mkBatch(cal), 0L, s"$root/st", s"$root/v")
    StreamCusum.step(mkBatch(w1), 1L, s"$root/st", s"$root/v")
    StreamCusum.step(mkBatch(w2), 2L, s"$root/st", s"$root/v")
    val got = spark.read.parquet(s"$root/v/b1", s"$root/v/b2")
      .orderBy("window_id", "day")
      .collect().map(r => (r.getAs[Long]("s_v6"), r.getAs[Boolean]("alarm")))
    val mu = cal.map(_._2).sum / cal.length
    var s = 0L
    val want = (w1 ++ w2).map { case (_, x) =>
      s = math.max(0L, s + (x - mu - mu / 20))
      (s, s > mu / 2)
    }
    assert(got.toSeq === want,
      "streamed closed-form walk must equal the sequential recursion")
    graft.queries.Scratch.rmTree(root)
  }

  test("q232 step: a retried batch rewrites identical state and verdicts") {
    val root = java.nio.file.Files.createTempDirectory("cusum-spec-").toString
    StreamCusum.step(mkBatch(Seq(("2024-01-01", 100L))), 0L,
      s"$root/st", s"$root/v")
    val w1 = mkBatch(Seq(("2024-01-02", 250L), ("2024-01-03", 10L)))
    StreamCusum.step(w1, 1L, s"$root/st", s"$root/v")
    val v1 = spark.read.parquet(s"$root/v/b1").collect().toSeq
    val s1 = spark.read.parquet(s"$root/st/b1").collect().toSeq
    StreamCusum.step(w1, 1L, s"$root/st", s"$root/v")
    assert(spark.read.parquet(s"$root/v/b1").collect().toSeq === v1)
    assert(spark.read.parquet(s"$root/st/b1").collect().toSeq === s1,
      "retry must reproduce byte-identical state")
    graft.queries.Scratch.rmTree(root)
  }
}
