package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.NativeAsOf

/** The native as-of physical operator against the composed
  * union+window formulation: identical results on randomized inputs
  * (ties on both sides, one-sided keys, null keys), plus the plan
  * shape the operator exists for — AsOfJoinExec fed by one exchange
  * per side, left rows never widened through a shuffle.
  */
class AsOfNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomInputs(seed: Int, nLeft: Int, nRight: Int) = {
    val rnd = new scala.util.Random(seed)
    // keys 0..19 plus 20/21 one-sided; ts in a tight range to force ties
    val left = (0 until nLeft).map { i =>
      (i.toLong, rnd.nextInt(20).toLong + (if (i % 37 == 0) 1L else 0L) * 20L,
        rnd.nextInt(40).toLong)
    }.toDF("l_id", "key", "ts")
    val right = (0 until nRight).map { i =>
      (i.toLong, rnd.nextInt(20).toLong + (if (i % 41 == 0) 1L else 0L) * 21L,
        rnd.nextInt(40).toLong, rnd.nextInt(1000).toDouble / 10.0)
    }.toDF("r_id", "key", "ts", "value")
    (left, right)
  }

  test("differential vs composed AsOf.backward on randomized inputs") {
    for (seed <- Seq(3, 17, 59)) {
      val (left, right) = randomInputs(seed, nLeft = 500, nRight = 400)
      val composed = graft.ops.AsOf
        .backward(left, right, "key", "ts", "l_id", "r_id", Seq("ts", "value"))
        .orderBy("l_id")
        .collect()
      val native = NativeAsOf
        .backward(left, right, "key", "ts", "r_id", Seq("ts", "value"))
        .orderBy("l_id")
        .collect()
      assert(native.length === composed.length, s"seed $seed")
      native.zip(composed).foreach { case (n, c) =>
        assert(n === c, s"seed $seed")
      }
    }
  }

  test("null keys group together; keys with no right rows get nulls") {
    val left = Seq((1L, Some(5L), 10L), (2L, None, 10L), (3L, Some(99L), 10L))
      .toDF("l_id", "key", "ts")
    val right = Seq((1L, Some(5L), 8L, 1.5), (2L, None, 9L, 2.5))
      .toDF("r_id", "key", "ts", "value")
    val out = NativeAsOf
      .backward(left, right, "key", "ts", "r_id", Seq("value"))
      .orderBy("l_id")
      .collect()
    // columns: l_id, key, ts, asof_r_id, asof_value
    assert(out(0).getDouble(4) === 1.5)           // key 5 matches
    assert(out(1).getDouble(4) === 2.5)           // null key matches null key
    assert(out(2).isNullAt(3) && out(2).isNullAt(4)) // key 99: no right rows
  }

  test("right ts ties resolve to the largest seq; ts-equal rows visible") {
    val left = Seq((1L, 7L, 10L), (2L, 7L, 9L)).toDF("l_id", "key", "ts")
    val right = Seq(
      (10L, 7L, 10L, 1.0), (11L, 7L, 10L, 2.0), // tie at ts=10: seq 11 wins
      (5L, 7L, 3L, 9.0))
      .toDF("r_id", "key", "ts", "value")
    val out = NativeAsOf
      .backward(left, right, "key", "ts", "r_id", Seq("value"))
      .orderBy("l_id").collect()
    assert(out(0).getLong(3) === 11L && out(0).getDouble(4) === 2.0)
    assert(out(1).getLong(3) === 5L && out(1).getDouble(4) === 9.0)
  }

  test("bucketed inputs satisfy the distribution: ZERO exchanges") {
    val (left, right) = randomInputs(211, 400, 400)
    spark.sql("DROP TABLE IF EXISTS asof_bkt_l")
    spark.sql("DROP TABLE IF EXISTS asof_bkt_r")
    left.write.bucketBy(8, "key").sortBy("key", "ts").saveAsTable("asof_bkt_l")
    right.write.bucketBy(8, "key").sortBy("key", "ts").saveAsTable("asof_bkt_r")
    val df = NativeAsOf.backward(
      spark.table("asof_bkt_l"), spark.table("asof_bkt_r"),
      "key", "ts", "r_id", Seq("value"))
    val expected = NativeAsOf
      .backward(left, right, "key", "ts", "r_id", Seq("value"))
      .orderBy("l_id").collect()
    assert(df.orderBy("l_id").collect() === expected)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed as-of inputs must not shuffle:\n$plan")
  }

  test("plan: AsOfJoinExec with one exchange per side, none above") {
    val (left, right) = randomInputs(101, 300, 300)
    val df = NativeAsOf.backward(left, right, "key", "ts", "r_id", Seq("value"))
    df.collect() // force planning through AQE
    // the node prints as "AsOfJoin" (Spark strips the Exec suffix);
    // count exchanges in the final plan only (AQE echoes the initial
    // plan below it)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("AsOfJoin"), s"native op not planned:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected at most 2 exchanges:\n$plan")
  }
}
