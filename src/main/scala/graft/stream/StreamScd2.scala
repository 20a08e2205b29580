package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD TYPE-2 change capture — the incremental form of q99's
  * batch history build: each key watches its attribute stream and
  * emits ONE append-mode row per version OPENED (the first event whose
  * tracked value differs from the current one, in event order).
  * Version opens are immutable once emitted — the closing timestamp of
  * a version is the NEXT version's open, derivable downstream — which
  * is what makes the history appendable at all: an interval-closing
  * update would need a retraction model. State per key is O(1): the
  * current value and version counter, event-time-evicted after
  * idleness (the [[StreamAsOf]]/[[StreamFunnel]] regime). Under
  * ordered replay the emitted set equals q99's change rows exactly —
  * q129 pins that through the driver gate against an independent
  * closed form.
  */
object StreamScd2 extends Serializable {

  case class Ev(key: Long, ts: Timestamp, seq: Long, state: String)
  case class VersionOpen(
      key: Long, version: Long, state: String, ts_us: Long, seq: Long)
  /** Keyed state (public for the state Encoder). */
  case class Scd2State(current: String, version: Long)

  private def micros(t: Timestamp): Long =
    EventTime.micros(t)

  def run(
      events: Dataset[Ev],
      watermarkDelay: String = "30 minutes"): Dataset[VersionOpen] = {
    import events.sparkSession.implicits._

    def fn(key: Long, it: Iterator[Ev], state: GroupState[Scd2State])
        : Iterator[VersionOpen] = {
      val evs = it.toIndexedSeq.sortBy(e => (micros(e.ts), e.seq))
      val out = scala.collection.mutable.ArrayBuffer[VersionOpen]()
      var cur = state.getOption.getOrElse(Scd2State(null, 0L))
      for (e <- evs) {
        if (cur.current == null || cur.current != e.state) {
          cur = Scd2State(e.state, cur.version + 1L)
          out += VersionOpen(key, cur.version, e.state, micros(e.ts), e.seq)
        }
      }
      state.update(cur)
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(fn)
  }
}
