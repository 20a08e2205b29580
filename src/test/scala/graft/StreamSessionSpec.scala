package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.stream.Sessionize
import graft.stream.Sessionize.Event

/** The flatMapGroupsWithState sessionizer's contract is the batch
  * closed form (q75): same sessions, same per-user numbering, emitted
  * exactly once — mid-stream when a later event closes a session,
  * via event-time timeout when only the watermark does.
  */
class StreamSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val gapUs = 10L * 60 * 1000000 // 10 minutes

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  // exact-in-binary values so streaming's running double sum matches
  // the batch decimal sum bit-for-bit
  private val fixture = Seq(
    Event(1L, ts(0), 0.5), Event(1L, ts(4), 2.25), // u1 session 1
    Event(1L, ts(30), 1.0),                        // u1 session 2 (gap 26m)
    Event(2L, ts(2), 4.0),                         // u2 session 1
    Event(2L, ts(14), 8.5), Event(2L, ts(20), 0.25)) // u2 session 2

  test("streaming flatMapGroupsWithState ≡ batch closed form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Event]
    val query = Sessionize.streaming(input.toDS(), gapUs).writeStream
      .format("memory").queryName("sessspec")
      .outputMode(OutputMode.Append())
      .start()

    // feed out of order across batches; then advance the watermark far
    // past every session so timeouts flush the remainder
    input.addData(fixture.take(2): _*)
    query.processAllAvailable()
    // u2's 10:02 event arrives here, out of order but inside the
    // 30-minute watermark delay — must NOT be dropped as late
    input.addData(fixture.drop(2): _*)
    query.processAllAvailable()
    input.addData(Event(99L, Timestamp.valueOf("2026-01-01 11:59:00"), 0.0))
    query.processAllAvailable() // wm -> 11:29, times out every fixture session
    // the sentinel user's own session needs one more watermark push
    input.addData(Event(98L, Timestamp.valueOf("2026-01-01 13:00:00"), 0.0))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("sessspec")
      .filter($"user_id" < 90)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4), r.getDouble(5)))
      .toSet

    val batch = Sessionize.batch(fixture.toDF(), gapUs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4), r.getDouble(5)))
      .toSet

    assert(streamed === batch)
    assert(batch.size === 4)
  }

  test("microsecond timestamps: streaming gap math matches batch exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // events 1 µs apart around the gap boundary: getTime-based (ms)
    // arithmetic would see a zero gap everywhere and fuse the sessions
    def usTs(sec: Int, us: Int): Timestamp = {
      val t = Timestamp.valueOf(f"2026-01-01 10:00:$sec%02d")
      t.setNanos(us * 1000); t
    }
    val gapUs = 1000000L // 1 second
    val fixture = Seq(
      Event(7L, usTs(0, 100), 1.0),
      Event(7L, usTs(1, 100), 2.0),  // gap exactly 1s: same session
      Event(7L, usTs(2, 101), 4.0),  // gap 1s + 1µs: NEW session
      Event(7L, usTs(2, 102), 8.0))
    val input = MemoryStream[Event]
    val query = Sessionize.streaming(input.toDS(), gapUs).writeStream
      .format("memory").queryName("sessspec_us")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(fixture: _*)
      query.processAllAvailable()
      input.addData(Event(99L, Timestamp.valueOf("2026-01-01 13:00:00"), 0.0))
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.table("sessspec_us").filter($"user_id" === 7L)
      .collect()
      .map(r => (r.getLong(1), r.getTimestamp(2), r.getTimestamp(3),
        r.getLong(4), r.getDouble(5))).toSet
    val batch = Sessionize.batch(fixture.toDF(), gapUs)
      .filter($"user_id" === 7L).collect()
      .map(r => (r.getLong(1), r.getTimestamp(2), r.getTimestamp(3),
        r.getLong(4), r.getDouble(5))).toSet
    assert(batch.size === 2, "1µs past the gap must open a new session")
    assert(streamed === batch)
  }
}
