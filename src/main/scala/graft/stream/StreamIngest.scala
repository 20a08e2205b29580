package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured Streaming CDC ingest (SURVEY T1-T5; reference:
  * update.py:26-41 nightly cron + pubmed.py:483-548 per-file apply).
  *
  * `readStream` over a landing directory of JSON update files →
  * `foreachBatch` → [[TableStore.merge]]. Each record carries
  * `op` ('upsert' | 'delete') and `source_filename`; within a
  * micro-batch, files are applied in filename order (O4) and each file
  * is one idempotent merge — TableStore's update_log makes redelivery
  * (e.g. after checkpoint loss) a no-op, giving exactly-once table
  * state on top of Spark's at-least-once foreachBatch.
  */
object StreamIngest {

  /** Drain all currently-available files (Trigger.AvailableNow), apply
    * them through the store, and return when caught up.
    */
  def runAvailableNow(
      spark: SparkSession,
      landingDir: String,
      checkpointDir: String,
      schema: StructType,
      store: TableStore,
      table: String,
      keyCol: String,
      maintainCounts: Boolean = false): Unit = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .json(landingDir)

    val query = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val files = batch.select("source_filename").distinct()
          .collect().map(_.getString(0)).sorted
        for (f <- files) {
          val b = batch.filter(col("source_filename") === f)
          val ups = b.filter(col("op") === "upsert").drop("op", "source_filename")
          val dels = b.filter(col("op") === "delete").select(keyCol)
          store.merge(table, ups, dels, f)
        }
        // derived-state maintenance (T5/A1): refresh the tiny count
        // "matview" after each batch, the reference's
        // REFRESH MATERIALIZED VIEW pubmed_rct_count (pubmed.py:163-167)
        if (maintainCounts) store.snapshot(table).foreach(snap =>
          snap.groupBy().count().withColumnRenamed("count", "n_rows")
            .write.mode("overwrite").parquet(store.matviewDir(table)))
        ()
      }
      .start()
    query.awaitTermination()
  }
}
