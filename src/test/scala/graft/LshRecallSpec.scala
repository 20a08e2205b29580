package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recall evidence for the hyperplane-bucket LSH family (q25's
  * adaptive band width, q169's adaptive bits): q267_lsh_recall
  * measures the fraction of exhaustive-truth near-dup pairs (round-6
  * cosine ≥ 0.35 within a deterministic ~256-vector sample) that
  * survive candidate generation at the FULL-corpus adaptive width.
  *
  * The floors below are REGRESSION PINS, not quality claims: every
  * input is deterministic (md5-derived hyperplanes, committed sf0.1
  * testdata, the deterministic make_sf1.py fixture), so the measured
  * recall is exact and only moves if the blocking code or the fixture
  * changes — which is what the pin is for. The recorded values at
  * HEAD: sf0.1 ppb=8 recall 13.70% (10/73), sf1 ppb=10 recall 4.41%
  * (3/68). The drop IS the adaptive trade — narrower buckets keep
  * candidates linear in N and cost recall on threshold-grazing pairs;
  * production buys it back with multi-probe (documented in
  * SCALING.md). Verbatim duplicates (cosine 1.0) collide in every
  * band at any width, so true-duplicate recall stays 1 regardless.
  */
class LshRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def recallRow(dir: String): (Long, Long, Long, Long) = {
    val r = queries.Registry.byName("q267_lsh_recall")
      .fn(spark, dir).collect().head
    (r.getAs[Long]("ppb"), r.getAs[Long]("n_true"),
      r.getAs[Long]("n_hit"), r.getAs[Long]("recall_e6"))
  }

  test("sf0.1: adaptive width resolves to the legacy 8 and recall holds its pin") {
    val (ppb, nTrue, _, recall) = recallRow("/root/testdata/sf0.1")
    assert(ppb === 8L, "committed scales must keep the legacy width (byte-identical results)")
    assert(nTrue > 0L, "the truth set went empty — the audit is no longer measuring anything")
    assert(recall >= 100000L,
      s"sf0.1 LSH recall fell below the 10% pin (measured 13.70% at HEAD): $recall ppm")
  }

  test("sf1: width widens to 10 and recall stays above the floor") {
    assume(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get("/tmp/graft_sf1")),
      "sf1 fixture not built (scripts/make_sf1.py)")
    val (ppb, nTrue, _, recall) = recallRow("/tmp/graft_sf1")
    assert(ppb === 10L, "20k vectors must size to 10 planes/band (clamp(floor(log2(N/16)), 8, 24))")
    assert(nTrue > 0L, "the truth set went empty — the audit is no longer measuring anything")
    assert(recall >= 40000L,
      s"sf1 LSH recall fell below the 4% pin (measured 4.41% at HEAD): $recall ppm")
  }
}
