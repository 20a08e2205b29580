package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-hygiene gate over the whole headline benchmark set: no query
  * may plan a CartesianProduct — the one join strategy that cannot
  * survive a 100 TB input on either side. Every intentional cross
  * join in the registry is broadcast-of-a-tiny-frame (statistics rows,
  * codebooks, fit results), which Spark plans as
  * BroadcastNestedLoopJoin; an unhinted CartesianProductExec appearing
  * here means a broadcast hint was lost or a join condition stopped
  * being recognized — exactly the silent re-plan a Spark upgrade can
  * introduce. Runs each query to completion at sf0.001 so AQE's FINAL
  * plan is checked, not the initial guess.
  */
class PlanHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("no headline query plans a CartesianProduct") {
    val offenders = queries.Registry.benchSet.flatMap { q =>
      val df = q.fn(spark, dir)
      df.collect() // force execution so the AQE final plan is inspectable
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct planned in: ${offenders.mkString(", ")} — " +
        "a lost broadcast hint or unrecognized join condition")
  }
}
