package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization of the event stream, in both execution
  * models:
  *
  *  - [[Sessionize.batch]]: the closed form — a lag/cumsum window per
  *    user (distributed by user_id, no custom state) — used by the q75
  *    CORRECTNESS entry against the DuckDB oracle.
  *  - [[Sessionize.streaming]]: the incremental form via
  *    `flatMapGroupsWithState` + event-time timeout — custom keyed
  *    state (the one Structured Streaming facility the repo's CDC/
  *    window coverage didn't yet exercise). Sessions close either when
  *    a later event arrives past the gap, or when the WATERMARK passes
  *    last_event + gap (the timeout path), so state per user is O(1)
  *    and results stream out in append mode.
  *
  * StreamSessionSpec pins the two forms to each other on a fixture —
  * the streaming operator's contract IS the batch closed form.
  *
  * Scale: state is one small struct per ACTIVE user (bounded by the
  * watermark), keyed shuffles are uniform on user_id; the batch form
  * is two window passes over the same user_id partitioning (one
  * exchange total).
  */
object Sessionize extends Serializable {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionAgg(
      user_id: Long, sess_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)
  /** Keyed state of [[streaming]] (public: the state Encoder's
    * generated code constructs and reads it reflectively).
    */
  case class SessState(
      startUs: Long, lastUs: Long, n: Long, vsum: Double, emitted: Long)

  /** Closed-form batch sessionization: events with columns
    * (user_id, ts, value); a session breaks when the gap to the
    * previous event of the same user exceeds `gapUs` microseconds.
    * sess_id numbers a user's sessions in time order from 1.
    */
  def batch(events: DataFrame, gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevUs = lag(unix_micros(col("ts")), 1).over(byUser)
    val isNew = when(prevUs.isNull || unix_micros(col("ts")) - prevUs > gapUs, 1)
      .otherwise(0)
    events
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("sess_id", sum(isNew).over(run))
      .groupBy("user_id", "sess_id")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        graft.functions.Portable.dsum6(col("value")).as("total_value"))
      .orderBy("user_id", "sess_id")
  }

  /** Full microsecond precision (shared concern with
    * [[StreamAsOf]]): `Timestamp.getTime` alone truncates to
    * milliseconds, which would make streaming gap comparisons coarser
    * than the batch form's `unix_micros`.
    */
  private def micros(t: Timestamp): Long =
    EventTime.micros(t)

  private def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  /** Incremental sessionization with custom keyed state. Emits each
    * session exactly once: mid-stream when a later event of the same
    * user arrives past the gap, or via event-time timeout once the
    * watermark passes session_end + gap. `sess_id` continues the
    * per-user numbering of the batch form.
    */
  def streaming(
      events: Dataset[Event],
      gapUs: Long,
      watermarkDelay: String = "30 minutes"): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    val gapMs = gapUs / 1000L

    def close(userId: Long, s: SessState): SessionAgg =
      SessionAgg(userId, s.emitted + 1,
        tsFromMicros(s.startUs), tsFromMicros(s.lastUs),
        s.n, s.vsum)

    def fn(userId: Long, it: Iterator[Event], state: GroupState[SessState])
        : Iterator[SessionAgg] = {
      if (state.hasTimedOut) {
        val out = close(userId, state.get)
        state.remove()
        Iterator.single(out)
      } else {
        val evs = it.toIndexedSeq.sortBy(e => (micros(e.ts), e.value))
        val out = scala.collection.mutable.ArrayBuffer[SessionAgg]()
        var cur = state.getOption
        for (e <- evs) {
          val us = micros(e.ts)
          cur match {
            case Some(s) if us - s.lastUs > gapUs =>
              out += close(userId, s)
              cur = Some(SessState(us, us, 1L, e.value, s.emitted + 1))
            case Some(s) =>
              cur = Some(s.copy(lastUs = math.max(s.lastUs, us), n = s.n + 1,
                vsum = s.vsum + e.value))
            case None =>
              cur = Some(SessState(us, us, 1L, e.value, 0L))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastUs / 1000L + gapMs)
        }
        out.iterator
      }
    }

    // the watermark bounds BOTH state size and late-data tolerance:
    // events older than wm(=max ts - delay) are dropped before the
    // stateful operator, and a session times out once the watermark
    // passes last_event + gap
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
