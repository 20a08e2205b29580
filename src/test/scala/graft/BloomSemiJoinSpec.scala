package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

/** q144 bloom semi-join reduction: the oracle pins the values; this
  * pins the PLAN — the whole point of the operator is where the probe
  * sits (inside the fact scan stage, upstream of the exchange) and
  * which join regime runs (shuffle merge, the broadcast-infeasible
  * case it exists for).
  */
class BloomSemiJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q144: bloom probe filters the fact side below a shuffle-merge join") {
    val df = Registry.byName("q144_bloom_semi_join").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"bloom probe missing from plan:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"expected the pinned shuffle-merge regime:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"dim side must not broadcast in the regime this operator targets:\n$plan")
    // the probe must be scan-stage work on the fact table: it appears
    // in the same Filter that carries the l_orderkey null guard,
    // directly over the lineitem file scan (no exchange in between)
    val scanSide = plan.linesIterator
      .dropWhile(l => !l.contains("bloom_might_contain")).toSeq
    assert(scanSide.exists(_.contains("lineitem")),
      "bloom probe is not attached to the lineitem scan side")
    assert(!scanSide.takeWhile(l => !l.contains("lineitem"))
        .exists(l => l.contains("Exchange")),
      "an Exchange sits between the bloom probe and the fact scan")
  }

  test("q144: reduction actually bites — probe passes a small fraction") {
    import org.apache.spark.sql.functions._
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F" &&
        col("o_orderdate") >= "1997-01-01" &&
        col("o_orderdate") < "1997-03-01")
    val nKeys = dim.count()
    val bf = dim.stat.bloomFilter("o_orderkey", math.max(nKeys, 1L), 0.01)
    val fact = Tables.lineitem(spark, sf)
    val total = fact.count()
    val passed = fact
      .filter(graft.functions.Bloom.mightContainCol(col("l_orderkey"), bf))
      .count()
    // dim selects ~0.8% of orders; 1% fpp keeps the pass-through well
    // under a tenth of the fact table
    assert(passed < total / 10,
      s"bloom reduction too weak: $passed of $total rows passed")
    // never a false negative: every truly-joining fact row passes
    val missed = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      .filter(!graft.functions.Bloom.mightContainCol(col("l_orderkey"), bf))
      .count()
    assert(missed === 0L, s"bloom false-negatived $missed joining rows")
  }
}
