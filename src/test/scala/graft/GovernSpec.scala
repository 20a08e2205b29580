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

  test("q251: effective license dominates every member; census conserves") {
    val rows = Registry.byName("q251_license_propagation")
      .fn(spark, dir).collect()
    assert(rows.nonEmpty)
    // independent closed-form recomputation of the fixture's clusters
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val bySeg = docs.groupBy(_ / 64)
    val expected = docs.groupBy { id =>
      val seg = bySeg(id / 64)
      if (seg.length >= 2) seg.min else id
    }.map { case (cl, ids) =>
      val ranks = ids.map(id => id % 5 + 1)
      cl -> (ids.length.toLong, ranks.distinct.length.toLong, ranks.max,
        ranks.count(_ < ranks.max).toLong)
    }
    assert(rows.length === expected.size, "one row per cluster")
    val names = Map(1L -> "public-domain", 2L -> "permissive",
      3L -> "sharealike", 4L -> "noncommercial", 5L -> "unknown")
    rows.foreach { r =>
      val (nd, nl, mx, up) = expected(r.getAs[Long]("cluster"))
      assert(r.getAs[Long]("n_docs") === nd)
      assert(r.getAs[Long]("n_licenses") === nl)
      assert(r.getAs[String]("effective_license") === names(mx))
      assert(r.getAs[Long]("n_upgraded") === up)
      if (nl == 1) assert(up === 0L, "uniform cluster upgrades nobody")
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.length,
      "clusters must partition the corpus")
  }
}
