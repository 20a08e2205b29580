package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recall AND candidate-budget evidence for the multi-probe
  * hyperplane LSH family (q25's probed blocking): q267_lsh_recall
  * measures the fraction of exhaustive-truth near-dup pairs (round-6
  * cosine ≥ 0.35 within a deterministic ~256-vector sample) that
  * survive candidate generation, BOTH at the unprobed round-12 width
  * (recall_base — the recorded cost of adaptivity alone) and at the
  * production multi-probe schedule (recall — probedPlanesFor =
  * planesFor+3 planes, T = 2·ppb query-directed MULTI-BIT probes per
  * band: the 1-/2-/3-plane flips with the smallest flipped-margin
  * sums, Lv et al.'s probe order), plus the full-corpus candidate-ROW
  * budget the schedule pays for it (cand_rows_per_vec — Σ k·(k−1)/2
  * over the (band, key) bucket histogram, i.e. exactly the pair rows
  * q25's verify stage processes).
  *
  * The floors AND ceilings below are REGRESSION PINS, not quality
  * claims: every input is deterministic (md5-derived hyperplanes,
  * exact integer margins, committed sf0.1 testdata, the deterministic
  * make_sf1.py fixtures), so the measured values are exact and only
  * move if the blocking code or the fixture changes — which is what
  * the pins are for. Recorded at round-14 HEAD:
  *
  *   sf0.1  (N=2000):  ppb 8→11, T=22; recall_base 13.70% (10/73),
  *                     probed 89.04% (65/73), 1,205 cand rows/vec
  *   sf1    (N=20000): ppb 10→13, T=26; recall_base 4.41% (3/68),
  *                     probed 73.53% (50/68), 4,673 cand rows/vec
  *   2×-sf1 (N=40000): ppb 11→14, T=28; recall_base 4.29% (3/70),
  *                     probed 67.14% (47/70), 5,944 cand rows/vec
  *
  * The round-13 single-bit schedule met its 50% gate floors but
  * decayed 74% → 51% → 36% across these same three width configs —
  * the round-13 verdict's one `weak`. The multi-bit schedule holds
  * the ≥65% contract at EVERY config, and the LshProbe frontier sweep
  * (SCALING.md's multi-probe table) shows it is the cheapest such
  * point: every swept config with lower candidates at the third width
  * reads < 65%. The budget ceilings make candidate growth a NAMED
  * failure: the per-decade budget step (1205→4673, 3.9×) is the
  * recorded price of flat recall at tau=0.35, and the width-step
  * pullback (4673→5944 for 2× N, 1.27×) is the schedule doing its
  * job. Verbatim duplicates (cosine 1.0) collide in every band at any
  * width, so true-duplicate recall stays 1 regardless.
  */
class LshRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private case class R(ppbBase: Long, ppb: Long, nProbes: Long,
    nTrue: Long, candPerVec: Long, recallBase: Long, recall: Long)

  private def recallRow(dir: String): R = {
    val r = queries.Registry.byName("q267_lsh_recall")
      .fn(spark, dir).collect().head
    R(r.getAs[Long]("ppb_base"), r.getAs[Long]("ppb"),
      r.getAs[Long]("n_probes"), r.getAs[Long]("n_true"),
      r.getAs[Long]("cand_rows_per_vec"), r.getAs[Long]("recall_base_e6"),
      r.getAs[Long]("recall_e6"))
  }

  test("sf0.1: probed schedule is (11, 22); recall holds the 65% contract; budget pinned") {
    val r = recallRow("/root/testdata/sf0.1")
    assert(r.ppbBase === 8L && r.ppb === 11L && r.nProbes === 22L,
      s"schedule drifted: $r — probedPlanesFor must be planesFor+3, probes 2·ppb")
    assert(r.nTrue > 0L, "the truth set went empty — the audit is no longer measuring anything")
    assert(r.recallBase >= 100000L,
      s"sf0.1 UNPROBED recall fell below the 10% pin (measured 13.70% at HEAD): ${r.recallBase} ppm")
    assert(r.recall >= 650000L,
      s"sf0.1 multi-probe recall fell below the 65% contract (measured 89.04% at HEAD): ${r.recall} ppm")
    assert(r.candPerVec <= 1500L,
      s"sf0.1 candidate budget blew past its 1,205 rows/vec record: ${r.candPerVec} — the schedule or the data moved")
  }

  test("sf1: probed schedule is (13, 26); recall holds the 65% contract; budget pinned") {
    assume(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get("/tmp/graft_sf1")),
      "sf1 fixture not built (scripts/make_sf1.py)")
    val r = recallRow("/tmp/graft_sf1")
    assert(r.ppbBase === 10L && r.ppb === 13L && r.nProbes === 26L,
      s"schedule drifted: $r — 20k vectors must size to 13 planes/band, 26 probes")
    assert(r.nTrue > 0L, "the truth set went empty — the audit is no longer measuring anything")
    assert(r.recallBase >= 40000L,
      s"sf1 UNPROBED recall fell below the 4% pin (measured 4.41% at HEAD): ${r.recallBase} ppm")
    assert(r.recall >= 650000L,
      s"sf1 multi-probe recall fell below the 65% contract (measured 73.53% at HEAD): ${r.recall} ppm")
    assert(r.candPerVec <= 5800L,
      s"sf1 candidate budget blew past its 4,673 rows/vec record: ${r.candPerVec} — the schedule or the data moved")
  }

  test("2x-sf1 width probe: the THIRD schedule configuration (14, 28) holds the 65% contract") {
    // Built by `make_sf1.py /tmp/graft_sf1 /tmp/graft_sf2x 2` — 40k
    // vectors, a width step NEITHER committed scale reaches. This is
    // the config where the round-13 single-bit schedule read 35.7%:
    // the multi-bit probe order was built precisely to flatten it.
    // Oracle parity at this configuration is re-verified each round by
    // the sweep protocol (scripts/sweep.sh width-probe stage).
    assume(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get("/tmp/graft_sf2x")),
      "width-probe fixture not built (make_sf1.py /tmp/graft_sf1 /tmp/graft_sf2x 2)")
    val r = recallRow("/tmp/graft_sf2x")
    assert(r.ppbBase === 11L && r.ppb === 14L && r.nProbes === 28L,
      s"schedule drifted: $r — 40k vectors must size to 14 planes/band, 28 probes")
    assert(r.nTrue > 0L, "the truth set went empty")
    assert(r.recall >= 650000L,
      s"2x-sf1 multi-probe recall fell below the 65% contract (measured 67.14% at HEAD): ${r.recall} ppm")
    assert(r.candPerVec <= 7400L,
      s"2x-sf1 candidate budget blew past its 5,944 rows/vec record: ${r.candPerVec}")
  }
}
