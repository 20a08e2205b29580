package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless point-in-interval RANGE JOIN via time-bin blocking — the
  * second operator family Spark lacks natively (with the as-of join,
  * [[AsOf]]). The naive encoding `points JOIN intervals ON ts >= start
  * AND ts < end` has no equi-key, so Catalyst plans a broadcast
  * nested-loop join: every point is tested against every interval,
  * O(|P|·|I|) — unusable when both sides are large.
  *
  * Formulation: block both sides on a fixed-width time BIN. Each
  * interval is exploded to the bins it overlaps (≤ ceil(len/bin)+1
  * rows — a constant when `binUs` is chosen near the interval length);
  * each point maps to exactly ONE bin. An ordinary equi-join on the
  * bin key then meets every (point, interval) pair whose bin matches,
  * and the exact range predicate filters false positives inside the
  * same stage. Because a point has exactly one bin, every qualifying
  * pair is produced exactly once — no post-join dedup.
  *
  * Scale shape: one shuffle per side, keyed on the time bin. Bin keys
  * are time-uniform, so skew is bounded by the hottest event window
  * and AQE's skew-join splitting applies; the interval side grows by
  * only the constant bins-per-interval factor. This is the standard
  * blocked rewrite (same family as the shingle/band/cell blocking used
  * by every similarity join in this repo, applied to the time axis).
  */
object RangeJoin {

  /** Join `points` (with a microsecond timestamp column `ptTsCol`) to
    * `intervals` (with microsecond `[startCol, endCol)` bounds): one
    * output row per (point, interval) with the point inside the
    * half-open interval. Column sets must be disjoint; empty and
    * inverted intervals (end <= start) match nothing and are dropped
    * before the explode (Spark's `sequence(a, b)` would otherwise step
    * DOWNWARD for b < a and fabricate bins).
    */
  def pointsInIntervals(
      points: DataFrame,
      ptTsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binUs: Long): DataFrame = {
    require(binUs > 0, s"binUs must be positive, got $binUs")
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin",
        explode(sequence(
          expr(s"$startCol DIV ${binUs}L"),
          expr(s"($endCol - 1) DIV ${binUs}L"))))
    val pt = points.withColumn("__bin", expr(s"$ptTsCol DIV ${binUs}L"))
    pt.join(iv, Seq("__bin"))
      .filter(col(ptTsCol) >= col(startCol) && col(ptTsCol) < col(endCol))
      .drop("__bin")
  }
}
