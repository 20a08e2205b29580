package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Order-dependence of the streaming decontamination entry (q175):
  * the streamed verdicts must equal a batch recomputation that
  * respects arrival order, and must DIFFER from the order-blind
  * variant whenever the fixture contains late-published benchmark
  * overlap (proving the state machine actually gates on time).
  */
class GovernSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def shingles = Tables.documents(spark, dir)
    .filter(size(split(col("text"), " ")) >= 4)
    .select(col("doc_id"), explode(array_distinct(
      graft.functions.Hash32.shingleHashes(col("text")))).as("h"))

  test("q175: streamed verdicts equal the arrival-order batch recomputation") {
    val th = shingles.persist()
    def hitsAgainst(docMod: Int, benchMods: Seq[Int]) = {
      val bench = th.filter(pmod(col("doc_id"), lit(4)).isin(benchMods: _*))
        .select("h").distinct()
      th.filter(pmod(col("doc_id"), lit(4)) === docMod)
        .join(bench, Seq("h"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    }
    val universe = th.filter(pmod(col("doc_id"), lit(4)).isin(2, 3))
      .select("doc_id").distinct()
    val expected = universe
      .join(hitsAgainst(2, Seq(0)).union(hitsAgainst(3, Seq(0, 1))),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("contaminated", col("n_hit") > 0L)
    val got = Registry.byName("q175_stream_decontam").fn(spark, dir)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "streamed state machine must replay the ordered batch semantics")
    th.unpersist()
  }
}
