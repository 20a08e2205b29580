package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recall evidence for the multi-probe hyperplane LSH family (q25's
  * probed blocking): q267_lsh_recall measures the fraction of
  * exhaustive-truth near-dup pairs (round-6 cosine ≥ 0.35 within a
  * deterministic ~256-vector sample) that survive candidate
  * generation, BOTH at the unprobed round-12 width (recall_base — the
  * recorded cost of adaptivity alone) and at the production
  * multi-probe schedule (recall — probedPlanesFor planes, 3·ppb/4
  * lowest-|margin| probes per band), plus the FULL-corpus candidate
  * count the schedule pays for it.
  *
  * The floors below are REGRESSION PINS, not quality claims: every
  * input is deterministic (md5-derived hyperplanes, exact integer
  * margins, committed sf0.1 testdata, the deterministic make_sf1.py
  * fixture), so the measured values are exact and only move if the
  * blocking code or the fixture changes — which is what the pins are
  * for. Recorded at round-13 HEAD:
  *
  *   sf0.1 (N=2000):  ppb 8→9, T=6; recall_base 13.70% (10/73),
  *                    probed 73.97% (54/73), n_cand 524,945 (262/vec)
  *   sf1   (N=20000): ppb 10→11, T=8; recall_base 4.41% (3/68),
  *                    probed 51.47% (35/68), n_cand 23,520,078
  *                    (1176/vec)
  *
  * The probed schedule holds the round-12 verdict's ≥50% target at
  * both scales; the candidate growth (262→1176 per vector for 10×
  * data) is the recorded price — bucket-bounded and probe-bounded,
  * never all-pairs, and linear in N at fixed (ppb, T). Verbatim
  * duplicates (cosine 1.0) collide in every band at any width, so
  * true-duplicate recall stays 1 regardless.
  */
class LshRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private case class R(ppbBase: Long, ppb: Long, nProbes: Long,
    nTrue: Long, nCand: Long, recallBase: Long, recall: Long)

  private def recallRow(dir: String): R = {
    val r = queries.Registry.byName("q267_lsh_recall")
      .fn(spark, dir).collect().head
    R(r.getAs[Long]("ppb_base"), r.getAs[Long]("ppb"),
      r.getAs[Long]("n_probes"), r.getAs[Long]("n_true"),
      r.getAs[Long]("n_cand"), r.getAs[Long]("recall_base_e6"),
      r.getAs[Long]("recall_e6"))
  }

  test("sf0.1: probed schedule is (9, 6) and recall holds the 65% floor") {
    val r = recallRow("/root/testdata/sf0.1")
    assert(r.ppbBase === 8L && r.ppb === 9L && r.nProbes === 6L,
      s"schedule drifted: $r — probedPlanesFor must be planesFor+1, probes 3·ppb/4")
    assert(r.nTrue > 0L, "the truth set went empty — the audit is no longer measuring anything")
    assert(r.recallBase >= 100000L,
      s"sf0.1 UNPROBED recall fell below the 10% pin (measured 13.70% at HEAD): ${r.recallBase} ppm")
    assert(r.recall >= 650000L,
      s"sf0.1 multi-probe recall fell below the 65% floor (measured 73.97% at HEAD): ${r.recall} ppm")
    assert(r.nCand <= 1000000L,
      s"sf0.1 candidate count blew past its ~525k record: ${r.nCand} — the schedule or the data moved")
  }

  test("sf1: probed schedule is (11, 8) and recall holds the 50% target") {
    assume(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get("/tmp/graft_sf1")),
      "sf1 fixture not built (scripts/make_sf1.py)")
    val r = recallRow("/tmp/graft_sf1")
    assert(r.ppbBase === 10L && r.ppb === 11L && r.nProbes === 8L,
      s"schedule drifted: $r — 20k vectors must size to 11 planes/band, 8 probes")
    assert(r.nTrue > 0L, "the truth set went empty — the audit is no longer measuring anything")
    assert(r.recallBase >= 40000L,
      s"sf1 UNPROBED recall fell below the 4% pin (measured 4.41% at HEAD): ${r.recallBase} ppm")
    assert(r.recall >= 500000L,
      s"sf1 multi-probe recall fell below the round-12 verdict's 50% target (measured 51.47% at HEAD): ${r.recall} ppm")
    assert(r.nCand <= 40000000L,
      s"sf1 candidate count blew past its ~23.5M record: ${r.nCand} — the schedule or the data moved")
  }

  test("2x-sf1 width probe: the THIRD schedule configuration (12, 9) measures honestly") {
    // Built by `make_sf1.py /tmp/graft_sf1 /tmp/graft_sf2x 2` — 40k
    // vectors, a width step NEITHER committed scale reaches. Recorded
    // at round-13 HEAD: recall_base 4.29% (3/70), probed 35.71%
    // (25/70), n_cand 61,902,074. The probed recall FALLS BELOW the
    // 50% gate-scale target here: the T = 3·ppb/4 schedule slows the
    // per-band p^ppb decay (~8× buy-back at this width) but does not
    // flatten it — the honest record that at fixed tau=0.35 recall
    // still decays with N, and the next lever (multi-bit probe
    // sequences) is unbuilt. Oracle parity at this configuration is
    // the point of the pin: all four adaptive-family queries
    // (q25/q267/q152/q214) verified green against DuckDB on this
    // fixture at round 13.
    assume(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get("/tmp/graft_sf2x")),
      "width-probe fixture not built (make_sf1.py /tmp/graft_sf1 /tmp/graft_sf2x 2)")
    val r = recallRow("/tmp/graft_sf2x")
    assert(r.ppbBase === 11L && r.ppb === 12L && r.nProbes === 9L,
      s"schedule drifted: $r — 40k vectors must size to 12 planes/band, 9 probes")
    assert(r.nTrue > 0L, "the truth set went empty")
    assert(r.recall >= 300000L,
      s"2x-sf1 multi-probe recall fell below the 30% floor (measured 35.71% at HEAD): ${r.recall} ppm")
    assert(r.nCand <= 100000000L,
      s"2x-sf1 candidate count blew past its ~62M record: ${r.nCand}")
  }
}
