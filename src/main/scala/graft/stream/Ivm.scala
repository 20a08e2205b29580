package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** INCREMENTAL VIEW MAINTENANCE for distributive aggregates over a
  * keyed CDC stream — the delta rule a production matview engine
  * applies instead of [[StreamIngest]]'s full per-batch recompute
  * (SURVEY T5's scale path): for a view `SELECT group, count(*),
  * sum(v) GROUP BY group`, a merge batch contributes
  *
  *   +Δ  the batch's surviving (last-wins) upsert rows
  *   −Δ  the PREVIOUS snapshot's rows whose keys leave it
  *       (tombstoned keys ∪ replaced upsert keys)
  *
  * and the new view is `old view ⊎ Δ` re-aggregated, dropping groups
  * whose key count reaches zero. Cost per batch is O(|batch| +
  * |affected keys| + |groups|) — at 100 TB the difference between
  * touching the delta and rescanning the table; the −Δ lookup joins
  * the (broadcast-sized) batch key set against the snapshot, the same
  * co-partitioned probe TableStore.merge already pays.
  *
  * Exactness: the summed value is cast per-row into DECIMAL(28,6)
  * (the Portable.dsum6 contract), so +Δ/−Δ cancellation is exact and
  * the maintained view is bit-identical to a from-scratch recompute —
  * IvmSpec pins that equivalence per batch, including group death and
  * key migration between groups.
  */
object Ivm {

  /** Within-batch last-wins dedup — TableStore.merge's rule, exposed
    * so the view maintenance sees exactly the rows the merge applies.
    */
  def lastWins(upserts: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("seq").desc)
    upserts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "seq")
  }

  /** One maintenance step. `view` is None before the first batch;
    * `prevSnapshot` is the table state BEFORE this merge (None on
    * bootstrap); `dedupedUpserts` the batch's surviving rows;
    * `removedKeys` every key leaving the old snapshot (tombstones ∪
    * upsert keys, any single column). Returns the new view
    * (groupCol, n_keys, sum_dec) — caller materializes it (the
    * returned plan reads `view`/`prevSnapshot` lazily).
    */
  def applyDelta(
      view: Option[DataFrame],
      prevSnapshot: Option[DataFrame],
      dedupedUpserts: DataFrame,
      removedKeys: DataFrame,
      keyCol: String,
      groupCol: String,
      valueCol: String): DataFrame = {
    val plus = dedupedUpserts
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_keys"),
        sum(col(valueCol).cast("decimal(28,6)")).as("sum_dec"))
    val minus = prevSnapshot.map { old =>
      old
        .join(removedKeys.select(col(removedKeys.columns.head).as(keyCol))
          .distinct(), Seq(keyCol))
        .groupBy(col(groupCol))
        .agg((-count(lit(1))).as("n_keys"),
          (-sum(col(valueCol).cast("decimal(28,6)"))).as("sum_dec"))
    }
    val deltas = minus.map(m => plus.unionByName(m)).getOrElse(plus)
    view.map(v => v.unionByName(deltas)).getOrElse(deltas)
      .groupBy(col(groupCol))
      .agg(sum(col("n_keys")).as("n_keys"),
        sum(col("sum_dec")).cast("decimal(28,6)").as("sum_dec"))
      .filter(col("n_keys") > 0)
  }
}
