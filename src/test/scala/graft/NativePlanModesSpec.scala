package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{NativeAsOf, NativeRange, NativeTopK}

/** The three native operators' plan-shape guarantees, re-asserted under
  * every (AQE on/off) × (shuffle.partitions 1/32) combination — a Spark
  * upgrade or conf drift must not silently re-plan them (round-7
  * verdict item 6). The single-mode shape tests live in
  * AsOfNativeSpec / NativeRangeSpec / NativeTopKSpec; this spec pins
  * that the shape is mode-invariant, with results byte-identical across
  * modes.
  */
class NativePlanModesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val modes =
    for (aqe <- Seq("true", "false"); sp <- Seq("1", "32"))
      yield (aqe, sp)

  /** Run `body` under each mode, restoring session conf afterwards. */
  private def underModes[T](body: => T): Seq[((String, String), T)] = {
    val conf = spark.conf
    val aqe0 = conf.get("spark.sql.adaptive.enabled")
    val sp0 = conf.get("spark.sql.shuffle.partitions")
    try modes.map { case m @ (aqe, sp) =>
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.shuffle.partitions", sp)
      m -> body
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe0)
      conf.set("spark.sql.shuffle.partitions", sp0)
    }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("as-of join: AsOfJoinExec + <=2 exchanges in every mode") {
    val rnd = new scala.util.Random(7)
    val left = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(40).toLong))
      .toDF("l_id", "key", "ts")
    val right = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(40).toLong, i * 1.0))
      .toDF("r_id", "key", "ts", "value")
    val results = underModes {
      val df = NativeAsOf.backward(left, right, "key", "ts", "r_id",
        Seq("value"))
      val plan = finalPlan(df)
      assert(plan.contains("AsOfJoin"), s"native op not planned:\n$plan")
      assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2,
        s"expected at most 2 exchanges:\n$plan")
      df.orderBy("l_id").collect().toSeq
    }
    assert(results.map(_._2).distinct.size === 1,
      "as-of results diverged across AQE/partition modes")
  }

  test("range join: BroadcastRangeJoin + no exchange in every mode") {
    val pdf = (0L until 100L).map(i => (i, i % 23)).toDF("pid", "ts")
    val idf = Seq((1L, 0L, 10L), (2L, 5L, 20L), (3L, 21L, 22L))
      .toDF("iid", "s_us", "e_us")
    val results = underModes {
      val df = NativeRange.pointsInIntervals(pdf, "ts", idf, "s_us", "e_us")
      val plan = finalPlan(df)
      assert(plan.contains("BroadcastRangeJoin"), s"not planned:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"range join must not shuffle:\n$plan")
      df.orderBy("pid", "iid").collect().toSeq
    }
    assert(results.map(_._2).distinct.size === 1,
      "range-join results diverged across AQE/partition modes")
  }

  test("top-k: partial+final, no Window/Sort, <=1 exchange in every mode") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val results = underModes {
      val df = NativeTopK.topK(o, Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      val plan = finalPlan(df)
      assert(plan.contains("PartialTopK"), s"missing partial pass:\n$plan")
      assert(plan.contains("FinalTopK"), s"missing final pass:\n$plan")
      assert(!plan.contains("Window"), s"window crept back in:\n$plan")
      assert(!plan.contains("Sort "), s"input sort crept back in:\n$plan")
      assert("Exchange".r
        .findAllIn(plan.replace("ReusedExchange", "")).length <= 1,
        s"expected at most one exchange:\n$plan")
      df.orderBy("o_custkey", "o_orderkey").collect().toSeq
    }
    assert(results.map(_._2).distinct.size === 1,
      "top-k results diverged across AQE/partition modes")
  }
}
