package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-hygiene gate over the whole headline benchmark set, one
  * execution per query so AQE's FINAL plan is checked (not the
  * initial guess). Two plan shapes are gated, each the signature of a
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
  private val dir = "/root/testdata/sf0.001"

  /** Bench queries whose global windows run over bounded
    * intermediates — each entry names the bound. Additions need the
    * same justification: the window INPUT must stay O(1)-ish in data
    * size (post-aggregation panels/histograms), not O(rows).
    */
  private val boundedGlobalWindows: Map[String, String] = Map(
    "q195_auc_rank" ->
      ("cumulative window over the SCORE HISTOGRAM (group-by score " +
        "value with map-side combine, |distinct scores| rows — a " +
        "bounded domain), not the document corpus")
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

  test("no headline query plans a CartesianProduct or an unlisted global window") {
    val offenders = queries.Registry.benchSet.flatMap { q =>
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
    val df = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("b", ntile(64).over(Window.orderBy("event_id")))
    df.collect()
    assert(offenses(df).contains("GlobalWindow"),
      "detector must see the single-partition window q108 used to plan")
  }

  test("allowlisted names exist in the bench set") {
    val bench = queries.Registry.benchSet.map(_.name).toSet
    val ghosts = boundedGlobalWindows.keySet.filterNot(bench)
    assert(ghosts.isEmpty,
      s"allowlist entries no longer in the bench set: ${ghosts.mkString(", ")}")
  }
}
