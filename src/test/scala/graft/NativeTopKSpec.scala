package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.NativeTopK

/** The native per-group top-k operator pinned to the window
  * formulation it replaces — on the real orders table, on randomized
  * inputs with ties and small groups, and at the plan level (partial +
  * final execs, ONE exchange, no Window/Sort of the input).
  */
class NativeTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame,
      group: String, order: Seq[org.apache.spark.sql.Column], k: Int) = {
    val w = Window.partitionBy(col(group)).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  test("native == window on the orders table") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val native = NativeTopK.topK(o, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    val window = windowForm(o, "o_custkey",
      Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    assert(native.nonEmpty)
    assert(native === window)
  }

  test("native == window on random data with ties and tiny groups") {
    val rnd = new scala.util.Random(151)
    // scores from a tiny range force ties; group sizes 1..~40 exercise
    // groups smaller than k
    val rows = (1 to 500).map { i =>
      (rnd.nextInt(25).toLong, i.toLong, rnd.nextInt(7).toLong)
    }
    val df = rows.toDF("g", "id", "score")
    for (k <- Seq(1, 4, 100)) {
      val native = NativeTopK.topK(df, Seq("g"),
        Seq("score" -> false, "id" -> true), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4))
      val window = windowForm(df, "g", Seq(col("score").desc, col("id")), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4))
      assert(native === window, s"diverged at k=$k")
    }
  }

  test("plan: partial + final around one exchange, no Window, no input sort") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val df = NativeTopK.topK(o, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    df.collect()
    // AQE prints the final plan first and repeats the initial plan
    // below it — count operators in the final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("PartialTopK"), s"missing partial pass:\n$plan")
    assert(plan.contains("FinalTopK"), s"missing final pass:\n$plan")
    assert(!plan.contains("Window"), s"window machinery crept back in:\n$plan")
    assert(!plan.contains("Sort "), s"the whole point is no input sort:\n$plan")
    assert("Exchange".r.findAllIn(plan.replace("ReusedExchange", "")).length <= 1,
      s"expected at most one exchange:\n$plan")
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(Long, Long)].toDF("g", "v")
    assert(NativeTopK.topK(df, Seq("g"), Seq("v" -> true), 5).count() === 0L)
  }
}
