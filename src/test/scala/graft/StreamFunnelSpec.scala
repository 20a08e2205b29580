package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.stream.StreamFunnel

/** The streaming funnel's stage machine pinned on adversarial
  * micro-batch cuts: stage events split across batches, a same-
  * timestamp click that must NOT satisfy the strict after-view rule,
  * out-of-order stages (purchase before any click never advances),
  * and exactly-once transition emission per stage.
  */
class StreamFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int, us: Int = 0): Timestamp = {
    val t = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")
    t.setNanos(us * 1000); t
  }

  test("stage machine == batch closed form across batch cuts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamFunnel.Ev]
    val query = StreamFunnel.run(input.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("funspec")
      .outputMode(OutputMode.Append())
      .start()

    // user 1: view, then a click at the SAME microsecond (no advance),
    // then a later click, then purchase — batches cut mid-funnel.
    // user 2: purchase then click before any view — never advances.
    input.addData(
      StreamFunnel.Ev(1L, ts(1), 10L, 1),
      StreamFunnel.Ev(1L, ts(1), 11L, 2), // same ts as view: strict > fails
      StreamFunnel.Ev(2L, ts(1), 20L, 3),
      StreamFunnel.Ev(2L, ts(2), 21L, 2))
    query.processAllAvailable()
    input.addData(
      StreamFunnel.Ev(1L, ts(5), 12L, 2),  // advances to stage 2
      StreamFunnel.Ev(1L, ts(6), 13L, 2),  // already at 2: no emit
      StreamFunnel.Ev(2L, ts(7), 22L, 1))  // user 2 finally views
    query.processAllAvailable()
    input.addData(
      StreamFunnel.Ev(1L, ts(9), 14L, 3),  // completes the funnel
      StreamFunnel.Ev(2L, ts(9), 23L, 3))  // stage 3 without stage 2: no
    query.processAllAvailable()
    query.stop()

    val got = spark.table("funspec")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    def us(t: Timestamp) = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    val expected = Set(
      (1L, 1, us(ts(1)), 10L),
      (1L, 2, us(ts(5)), 12L),
      (1L, 3, us(ts(9)), 14L),
      (2L, 1, us(ts(7)), 22L))
    assert(got === expected)
  }

  test("randomized differential: streaming == batch argmin closed form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(41)
    // random staged events over 12 users, event-time-ordered delivery
    // (the CDC-replay regime), cut into random micro-batches
    val evs = (1 to 300).map { i =>
      StreamFunnel.Ev(rnd.nextInt(12).toLong + 1L,
        ts(rnd.nextInt(50), rnd.nextInt(3)), i.toLong, rnd.nextInt(3) + 1)
    }.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.seq))
    def us(t: Timestamp) = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

    // INDEPENDENT batch closed form (q120's oracle shape, not a replay
    // of the machine): stage k's transition is the (ts, seq)-argmin of
    // stage-k events strictly after stage k-1's time
    val expected = evs.groupBy(_.key).flatMap { case (k, es) =>
      def argmin(stage: Int, after: Long): Option[(Long, Long)] =
        es.filter(e => e.stage == stage && us(e.ts) > after)
          .map(e => (us(e.ts), e.seq))
          .sorted.headOption
      val s1 = argmin(1, Long.MinValue)
      val s2 = s1.flatMap(t1 => argmin(2, t1._1))
      val s3 = s2.flatMap(t2 => argmin(3, t2._1))
      Seq(s1.map(t => (k, 1, t._1, t._2)), s2.map(t => (k, 2, t._1, t._2)),
        s3.map(t => (k, 3, t._1, t._2))).flatten
    }.toSet

    val input = MemoryStream[StreamFunnel.Ev]
    val query = StreamFunnel.run(input.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("funrand")
      .outputMode(OutputMode.Append())
      .start()
    var rest = evs
    while (rest.nonEmpty) {
      val n = math.min(rest.length, rnd.nextInt(40) + 1)
      input.addData(rest.take(n))
      query.processAllAvailable()
      rest = rest.drop(n)
    }
    query.stop()

    val got = spark.table("funrand")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
  }
}
