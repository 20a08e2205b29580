package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.StreamAsOf
import graft.stream.StreamAsOf.Tagged

/** The streaming as-of operator against the batch composed form
  * ([[graft.ops.AsOf.backward]]): under event-ordered delivery across
  * micro-batches, the incremental enrichment must equal the batch
  * backward as-of — the same batch ≡ streaming contract
  * StreamSessionSpec pins for sessionization. Also checks the
  * semantics the family shares: right-at-equal-ts visible, right ties
  * to the largest seq, unmatched lefts yield nulls.
  */
class StreamAsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("ordered replay across micro-batches equals batch AsOf.backward") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // key 1: rights interleaved with lefts incl. an equal-ts tie pair;
    // key 2: left before any right (null match); key 3: rights only
    val batch1 = Seq(
      Tagged(1L, ts(1), 100L, is_right = true, 1.0),
      Tagged(2L, ts(2), 200L, is_right = false, 0.0),
      Tagged(1L, ts(3), 101L, is_right = true, 2.0),
      Tagged(1L, ts(3), 102L, is_right = true, 3.0), // tie: seq 102 wins
      Tagged(1L, ts(3), 500L, is_right = false, 0.0), // equal-ts left sees it
      Tagged(3L, ts(4), 300L, is_right = true, 9.0))
    val batch2 = Seq(
      Tagged(1L, ts(10), 501L, is_right = false, 0.0), // matches batch-1 state
      Tagged(2L, ts(11), 201L, is_right = true, 7.0),
      Tagged(2L, ts(12), 502L, is_right = false, 0.0),
      Tagged(1L, ts(12), 103L, is_right = true, 4.0),
      Tagged(1L, ts(13), 503L, is_right = false, 0.0))

    val input = MemoryStream[Tagged]
    val query = StreamAsOf.backward(input.toDS())
      .writeStream.format("memory").queryName("asofstream")
      .outputMode("append").start()
    try {
      input.addData(batch1)
      query.processAllAvailable()
      input.addData(batch2)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.table("asofstream")
      .select("key", "seq", "asof_seq", "asof_payload")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).sortBy(t => (t._1, t._2))

    val all = batch1 ++ batch2
    val left = all.filter(!_.is_right)
      .map(e => (e.key, e.ts, e.seq)).toDF("key", "ts", "seq")
    val right = all.filter(_.is_right)
      .map(e => (e.key, e.ts, e.seq, e.payload))
      .toDF("key", "ts", "rseq", "payload")
    val expected = graft.ops.AsOf
      .backward(left, right, "key", "ts", "seq", "rseq", Seq("payload"))
      .select(col("key"), col("seq"), col("asof_rseq"), col("asof_payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).sortBy(t => (t._1, t._2))

    assert(streamed.toSeq === expected.toSeq)
    // spot-check the family semantics directly
    val bySeq = streamed.map(t => t._2 -> t).toMap
    assert(bySeq(500L)._3 === Some(102L), "equal-ts right visible, tie to max seq")
    assert(bySeq(200L)._3 === None, "left before any right matches nothing")
    assert(bySeq(503L)._3 === Some(103L), "state carries latest right forward")
  }
}
