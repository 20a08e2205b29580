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
}
