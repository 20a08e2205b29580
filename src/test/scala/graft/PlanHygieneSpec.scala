package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-hygiene gate over the WHOLE query registry, one execution per
  * query so AQE's FINAL plan is checked (not the initial guess). Two
  * plan shapes are gated, each the signature of a
  * query that cannot survive a 100 TB input:
  *
  *  1. CartesianProduct — the one join strategy with no scale path.
  *     Every intentional cross join in the registry is
  *     broadcast-of-a-tiny-frame (statistics rows, codebooks, fit
  *     results), which Spark plans as BroadcastNestedLoopJoin; an
  *     unhinted CartesianProductExec means a broadcast hint was lost
  *     or a join condition stopped being recognized — exactly the
  *     silent re-plan a Spark upgrade can introduce.
  *
  *  2. WindowExec with an EMPTY partitionSpec (a global window) —
  *     Spark moves the window's entire input to ONE partition
  *     ("Moving all data to a single partition"), so the operator is
  *     only scale-safe over a BOUNDED intermediate (a histogram, a
  *     day panel, a top-k frame), never over raw table rows. Round
  *     8's q108 shipped exactly this bug (ntile(64) over a global
  *     Window.orderBy on the full events table) and the
  *     CartesianProduct gate could not see it; queries whose global
  *     windows are over provably bounded frames are allowlisted
  *     BY NAME below with the bound that justifies each.
  */
class PlanHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // sf0.1 (round-11 change, was sf0.001): the gate executes the
  // registry at the LARGEST committed testdata scale so the AQE final
  // plans it inspects are the ones real data produces — at sf0.001
  // every join broadcasts and a shape regression that only appears
  // past the toy scale is invisible. Counter-example controls below
  // keep sf0.001 (shape-only, scale-irrelevant).
  private val dir =
    sys.env.getOrElse("GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.1")

  /** Registry queries whose global windows run over bounded
    * intermediates — each entry names the bound. Additions need the
    * same justification: the window INPUT must stay O(1)-ish in data
    * size (post-aggregation panels/histograms), not O(rows).
    */
  private val boundedGlobalWindows: Map[String, String] = Map(
    "q195_auc_rank" ->
      ("cumulative window over the SCORE HISTOGRAM (group-by score " +
        "value with map-side combine, |distinct scores| rows — a " +
        "bounded domain), not the document corpus"),
    "q198_ks_test" ->
      ("cumulative windows over the per-arm VALUE HISTOGRAM " +
        "(group-by n_chars, |distinct values| rows), not documents"),
    "q200_gini_tokens" ->
      ("telescoped rank window over the COUNT-OF-COUNTS histogram " +
        "(|distinct frequencies| rows), never the |V|-row vocabulary"),
    "q206_ndcg" ->
      ("rank-attach windows over the two TakeOrdered(10) frames " +
        "(10 rows each), not the scored corpus"),
    "q212_water_filling" ->
      ("sort/cumsum windows over the per-SOURCE size table " +
        "(|sources| rows, a fixed catalog), not the document corpus"),
    "q216_pareto_frontier" ->
      ("prefix-max window over the LENGTH-VALUE histogram (bounded " +
        "n_chars domain after groupBy), never all-pairs domination"),
    "q217_sprt_trajectory" ->
      ("cumulative LLR window over the DAY PANEL (one row per " +
        "calendar day after groupBy(day)), not raw events"),
    "q228_cusum_changepoint" ->
      ("closed-form CUSUM windows over the DAY PANEL (one row per " +
        "day), not raw events"),
    "q233_quantile_norm" ->
      ("cumulative-fraction windows over the value-domain histograms " +
        "(global + per-source, bounded n_chars domain), not documents"),
    "q238_vocab_coverage" ->
      ("interval window over the COUNT-OF-COUNTS histogram " +
        "(|distinct frequencies| rows), never a per-type rank"),
    "q261_binary_segmentation" ->
      ("CUSUM-score windows over the DAY PANEL (one row per day), " +
        "not raw events"),
    "q107_temp_mix" ->
      ("whole-frame normalizer windows over the PER-LANGUAGE token " +
        "totals (|languages| rows), not documents"),
    "q185_rrf_fusion" ->
      ("rank windows over the two top-50 CANDIDATE frames (each a " +
        "TakeOrdered cap), not the corpus"),
    "q223_join_skew_audit" ->
      ("cumsum window over the COUNT-OF-COUNTS frequency histogram " +
        "(|distinct frequencies| rows), never a per-key rank"),
    "q260_kaplan_meier" ->
      ("risk-set/survival windows over the DISTINCT-LIFETIME day " +
        "panel (bounded by observed days), not raw events"),
    "q264_hill_tail" ->
      ("order-statistic window over the top-101 TakeOrdered frame " +
        "(k+1 rows), never a full length sort"),
    "q265_topk_drift" ->
      ("rank windows over the two top-20 token frames (TakeOrdered " +
        "caps), not the vocabulary")
  )

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    (p +: kids.flatMap(collectAll)) ++ p.subqueries.flatMap(collectAll)
  }

  private def offenses(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val nodes = collectAll(df.queryExecution.executedPlan)
    val cart = nodes.collect {
      case n if n.nodeName.contains("CartesianProduct") => "CartesianProduct"
    }
    val gw = nodes.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => "GlobalWindow"
    }
    (cart ++ gw).distinct
  }

  test("no registry query plans a CartesianProduct or an unlisted global window") {
    // The FULL registry, not just the bench set: round 9's full Verify
    // surfaced 7 single-partition windows outside the bench gate (all
    // bounded — now allowlisted above); entry #267 must not be able to
    // ship an unbounded one silently.
    val offenders = queries.Registry.all.flatMap { q =>
      val df = q.fn(spark, dir)
      df.collect() // force execution so the AQE final plan is inspectable
      val off = offenses(df)
        .filterNot(_ == "GlobalWindow" && boundedGlobalWindows.contains(q.name))
      if (off.isEmpty) None else Some(s"${q.name}: ${off.mkString("+")}")
    }
    assert(offenders.isEmpty,
      s"scale-unsafe plan shapes in: ${offenders.mkString(", ")} — " +
        "a lost broadcast hint, an unrecognized join condition, or a " +
        "global window over an unbounded input (allowlist a BOUNDED " +
        "one by name with its bound)")
  }

  test("the global-window detector fires on a seeded counter-example") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("b", ntile(64).over(Window.orderBy("event_id")))
    df.collect()
    assert(offenses(df).contains("GlobalWindow"),
      "detector must see the single-partition window q108 used to plan")
  }

  /** Broadcast-vs-sort-merge contracts at sf1 — the scale where the
    * 10 MB threshold is a real decision (committed testdata never
    * crosses it; PLANS.md's scale matrix shows every join broadcast
    * at sf0.1). Three named contracts, each the signature of a
    * different regression class:
    *  - q05: the BOUNDED dimension side must STAY broadcast — a flip
    *    to sort-merge means a lost hint or a stats regression
    *    shuffling the probe side for nothing;
    *  - q04: both sides GROW with data, so sort-merge is the correct
    *    asymptote — a broadcast here means Spark is materializing a
    *    growing side on every executor (OOM at 100 TB);
    *  - q47: the IVF codebook rides the plan (BroadcastNestedLoop for
    *    the bounded centroid frames) and the N-row side must never
    *    shuffle for assignment — SMJ appearing means the codebook
    *    seam regressed to a join.
    * Runs only when the scripts/make_sf1.py fixture exists (the
    * driver environment always builds it for the sf1 sweeps).
    */
  /** Child session whose DECISION-RELEVANT conf matches the PLANS.md
    * generator (`runMain Plans`: 32 shuffle partitions; the 256 KB
    * split sizing is shared with TestSpark already): AQE's runtime
    * SMJ→BHJ conversions read per-stage size stats that shift with
    * the shuffle partition count — round 12's q213 conversion
    * appears at 32 partitions but not at the suite's 4 — so an EXACT
    * census must execute under the generator's partitioning. Core
    * count (local[4] vs local[32]) enters no size decision and stays
    * the suite's.
    */
  private lazy val sf1PlanSpark = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "32")
    // pinned redundantly with TestSpark's builder: file-split packing
    // divides table bytes by minPartitionNum (else by the CORE count),
    // and a mismatch against the generator changes scan partitioning,
    // partial-aggregate output sizes, and with them any borderline
    // AQE join decision the census would then mis-gate
    s.conf.set("spark.sql.files.minPartitionNum", "32")
    // Disable AQE's RUNTIME SMJ→BHJ demotion (static planning keeps
    // the normal 10 MB threshold): the conversion reads post-shuffle
    // stage sizes that race stage scheduling — round 12 measured
    // q213's conversion split 3/1 across 4 identical runs — so ANY
    // borderline join could flake this suite-blocking census. The
    // generator (runMain Plans) sets the same knob, so the committed
    // matrix and this gate census the DETERMINISTIC static strategies
    // (the 100 TB asymptotes); a runtime demotion Spark may still
    // apply in production/bench is a strict improvement on top, not a
    // contract.
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s
  }

  test("sf1 join-strategy contracts: bounded sides broadcast, growing sides sort-merge") {
    assume(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get("/tmp/graft_sf1")),
      "sf1 fixture not built (scripts/make_sf1.py)")
    def strategies(name: String): Map[String, Int] = {
      val df = queries.Registry.byName(name).fn(sf1PlanSpark, "/tmp/graft_sf1")
      df.collect()
      val nodes = collectAll(df.queryExecution.executedPlan)
      Map(
        "BHJ" -> nodes.count(_.nodeName.contains("BroadcastHashJoin")),
        "SMJ" -> nodes.count(_.nodeName.contains("SortMergeJoin")),
        "BNLJ" -> nodes.count(_.nodeName.contains("BroadcastNestedLoop")))
    }
    // counts are over the deduplicated node tree (a reused broadcast
    // exchange appears once), so the contracts are ≥1 presence plus
    // zero-of-the-wrong-strategy — the regression signal, not an
    // exact operator census
    val q05 = strategies("q05_broadcast_join")
    assert(q05("BHJ") >= 1 && q05("SMJ") == 0,
      s"q05's bounded dims lost their broadcast at sf1: $q05")
    val q04 = strategies("q04_search_join")
    assert(q04("SMJ") >= 1 && q04("BHJ") == 0,
      s"q04's growing sides must sort-merge at sf1, not broadcast: $q04")
    val q47 = strategies("q47_ann_ivf")
    assert(q47("SMJ") == 0 && q47("BNLJ") >= 1,
      s"q47's codebook must ride the plan, never shuffle the N side: $q47")
  }

  /** The WHOLE join-strategy scale matrix, gated — not just the three
    * named contracts above. PLANS.md's matrix is the committed
    * expectation; this test re-executes every bench-set query at sf1
    * and compares the BHJ/SMJ/SHJ/BNLJ census with the SAME counting
    * the generator uses (regex over the AQE-final executedPlan text,
    * Plans.joinCounts), so ANY silent strategy flip — a lost broadcast
    * hint, a stats regression, a Spark-upgrade re-plan — fails here
    * instead of being quietly rewritten into the matrix on the next
    * regeneration. A legitimate plan change is committed by
    * regenerating PLANS.md (runMain Plans with the fixture present)
    * in the SAME change, which is what makes the flip reviewable.
    */
  test("sf1 join-strategy census matches the committed PLANS.md matrix for every bench query") {
    assume(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get("/tmp/graft_sf1")),
      "sf1 fixture not built (scripts/make_sf1.py)")
    val plansPath = java.nio.file.Paths.get("PLANS.md")
    assume(java.nio.file.Files.exists(plansPath), "PLANS.md not present")
    val text = java.nio.file.Files.readString(plansPath)
    val rowRe =
      """\|\s*(q\w+)\s*\|\s*\d+/\d+/\d+/\d+\s*\|\s*(\d+)/(\d+)/(\d+)/(\d+)\s*\|""".r
    val committed: Map[String, (Int, Int, Int, Int)] =
      rowRe.findAllMatchIn(text).map(m => m.group(1) ->
        ((m.group(2).toInt, m.group(3).toInt,
          m.group(4).toInt, m.group(5).toInt))).toMap
    assume(committed.nonEmpty,
      "PLANS.md carries no sf1 matrix column — regenerate with the fixture present")
    def fmt(t: (Int, Int, Int, Int)) = s"${t._1}/${t._2}/${t._3}/${t._4}"
    val problems = queries.Registry.benchSet.flatMap { q =>
      committed.get(q.name) match {
        case None =>
          Some(s"${q.name}: not in the committed matrix (regenerate PLANS.md)")
        case Some(want) =>
          val df = q.fn(sf1PlanSpark, "/tmp/graft_sf1")
          df.collect()
          val s = df.queryExecution.executedPlan.toString
          def c(p: String) = p.r.findAllIn(s).length
          val got = (c("BroadcastHashJoin"), c("SortMergeJoin"),
            c("ShuffledHashJoin"), c("BroadcastNestedLoop"))
          sf1PlanSpark.catalog.clearCache()
          sf1PlanSpark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          if (got != want)
            Some(s"${q.name}: committed BHJ/SMJ/SHJ/BNLJ ${fmt(want)} vs executed ${fmt(got)}")
          else None
      }
    }
    assert(problems.isEmpty,
      s"sf1 join-strategy census diverged from the committed matrix:\n  " +
        problems.mkString("\n  ") +
        "\n(a deliberate plan change must regenerate PLANS.md in the same change)")
  }

  test("kNN bucket cap filters BEFORE aggregation (bounded collect_list buffer)") {
    // round-12 advisor: a post-aggregation size() filter bounded the
    // pair fan-out but NOT the aggregation-buffer memory — a
    // degenerate hot bucket still materialized its (id, vector, norm)
    // structs on one task. The cap is now a per-bucket-count semi-join
    // upstream of the collect_list; this pins its presence in the
    // executed plan so a refactor can't silently regress to the
    // post-filter form.
    val df = queries.Registry.byName("q169_knn_graph")
      .fn(spark, "/root/testdata/sf0.01")
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("LeftSemi"),
      "bucket-count semi-join missing from q169's executed plan — the " +
        "maxKnnBucket cap no longer bounds the aggregation buffer")
    assert(s.contains("collect_list"),
      "q169's bucket aggregation shape changed — re-check the cap seam")
  }

  test("allowlisted names exist in the registry") {
    val names = queries.Registry.all.map(_.name).toSet
    val ghosts = boundedGlobalWindows.keySet.filterNot(names)
    assert(ghosts.isEmpty,
      s"allowlist entries no longer in the registry: ${ghosts.mkString(", ")}")
  }
}
