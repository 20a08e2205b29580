package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

/** q146 streaming ANN: the streamed probe must be row-equal to the
  * batch IVF path — q47 runs the SAME index (Ivf.adaptiveMod-sized
  * codebook, nprobe=4, k=10) for query 0, so q146's qid=0 slice must
  * reproduce it exactly,
  * and the per-query structure must be a dense rank list.
  */
class StreamAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val out =
    Registry.byName("q146_stream_ann").fn(spark, sf).collect()

  test("q146: per-query result lists are dense, sorted, and self-free") {
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to rows.length).toSeq,
        s"ranks not dense for query $qid")
      assert(rows.length <= 10)
      val sims = sorted.map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"cos_sim not non-increasing for query $qid")
      assert(!sorted.exists(_.getLong(2) == qid),
        s"query $qid returned itself")
    }
  }

  test("q146: streamed qid=0 slice equals the batch IVF path (q47)") {
    val batch = Registry.byName("q47_ann_ivf").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val streamed = out.filter(_.getLong(0) == 0L)
      .sortBy(_.getLong(1))
      .map(r => (r.getLong(2), r.getDouble(3))).toSeq
    assert(streamed === batch,
      "streamed ANN for query 0 diverges from the batch IVF result")
  }
}
