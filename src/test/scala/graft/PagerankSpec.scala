package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry
import graft.functions.Portable

/** q149 weighted PageRank: an independent driver-side implementation
  * of the same exact-integer iteration must reproduce the distributed
  * result, and truncating division must only ever LOSE rank mass.
  */
class PagerankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q149: distributed ranks equal an independent in-memory PageRank") {
    val out = Registry.byName("q149_pagerank").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.length === 20)

    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def tid(t: String): Long = 2000000000L + Portable.h32s(t) % 1000000000L
    val weighted = ev.groupBy { case (u, t) => (u, tid(t)) }
      .map { case (k, es) => k -> es.length.toLong }
    val edges = weighted.toSeq.flatMap { case ((u, t), w) =>
      Seq((u, t, w), (t, u, w))
    }
    val totw = edges.groupBy(_._1).map { case (n, es) => n -> es.map(_._3).sum }
    val nodes = edges.map(_._1).distinct
    var r = nodes.map(_ -> 1000000000000L).toMap
    for (_ <- 1 to 5) {
      val c = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (src, dst, w) =>
        c(dst) = c.getOrElse(dst, 0L) + (r(src) * w) / totw(src)
      }
      r = nodes.map(n => n -> (150000000000L + 85L * c.getOrElse(n, 0L) / 100L)).toMap
    }
    val expected = nodes.map(n => (n, totw(n), r(n)))
      .sortBy { case (id, _, rank) => (-rank, id) }.take(20)
    assert(out === expected)

    // truncating division never creates mass: every node's rank stays
    // within [0.15e12, N * 1e12]
    val n = nodes.length.toLong
    assert(r.values.forall(v => v >= 150000000000L && v <= n * 1000000000000L))
  }
}
