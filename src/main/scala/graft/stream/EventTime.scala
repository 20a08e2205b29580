package graft.stream

/** Event-time arithmetic shared by every stateful streaming operator. */
object EventTime {

  /** Full microsecond precision — `Timestamp.getTime` alone truncates
    * to milliseconds, which coarsens event-time comparisons against
    * microsecond data (the bug once fixed independently in
    * sessionization; ONE definition so a precision fix cannot miss a
    * copy).
    */
  def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
}
