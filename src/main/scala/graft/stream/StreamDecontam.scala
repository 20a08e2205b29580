package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One micro-batch of STREAMING DECONTAMINATION (q175's foreachBatch
  * body): the benchmark/eval side and the training corpus side both
  * arrive as micro-batches on one stream, and every corpus document
  * is judged against the benchmark shingles LANDED SO FAR — the
  * realistic regime where eval suites are published over time and a
  * doc admitted before a benchmark existed stays admitted (re-audit
  * is a batch re-run, q131's escape hatch).
  *
  * Layout contract (the [[StreamNeardup]] pattern): `benchRoot` and
  * `outRoot` hold one subdir per applied micro-batch (`b<batchId>`,
  * written with Overwrite), so a retried batch id rewrites its own
  * files and the step is idempotent without a transaction log.
  *
  * Scale shape: the standing benchmark shingle set is an on-disk
  * parquet table keyed by the uniform shingle hash — never
  * state-store state, never driver memory; the micro-batch side is
  * small, so the probe join broadcasts the batch's shingles against
  * the bucketable standing side. Verdicts append; nothing rewrites
  * corpus state.
  */
object StreamDecontam {

  /** Apply one micro-batch. `kind` is constant per batch ('bench' or
    * 'docs' — the file-per-batch fixture guarantees it); `shingles`
    * carries (doc_id, h) with one row per DISTINCT shingle hash of
    * each incoming doc.
    */
  def step(spark: SparkSession, batch: DataFrame, shingles: DataFrame,
      batchId: Long, benchRoot: java.io.File,
      outRoot: java.io.File): Unit = {
    val kinds = batch.select("kind").distinct().collect().map(_.getString(0))
    require(kinds.length <= 1, s"mixed-kind batch: ${kinds.mkString(",")}")
    if (kinds.isEmpty) return
    if (kinds.head == "bench") {
      shingles.select("h").distinct()
        .write.mode("overwrite").parquet(s"$benchRoot/b$batchId")
    } else {
      // a RETRIED docs batch must probe the standing set the first
      // attempt saw; bench subdirs land under other batch ids, so
      // excluding this id is only defensive symmetry with q141
      val standing = StreamNeardup.subdirs(benchRoot)
        .filterNot(p => new java.io.File(p).getName == s"b$batchId")
      val hits =
        if (standing.isEmpty)
          shingles.select(col("doc_id")).limit(0)
            .withColumn("n_hit", lit(0L))
        else
          shingles.join(spark.read.parquet(standing: _*)
              .select(col("h")).distinct(), Seq("h"))
            .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      batch.select("doc_id").distinct()
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .withColumn("contaminated", col("n_hit") > 0L)
        .write.mode("overwrite").parquet(s"$outRoot/b$batchId")
    }
  }
}
