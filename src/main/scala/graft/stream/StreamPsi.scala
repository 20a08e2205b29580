package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One micro-batch of the STREAMING PSI DRIFT MONITOR (q205's
  * foreachBatch body): batch 0 establishes the standing REFERENCE
  * histogram; every later batch compares its own histogram against
  * that reference and emits one population-stability reading —
  * the online form of q204's batch PSI table, for the regime where
  * a release pipeline watches arriving data windows for drift
  * against a frozen baseline.
  *
  * Layout contract (the [[StreamNeardup]]/[[StreamDecontam]]
  * pattern): the reference dir and each verdict subdir (`b<id>`) are
  * written with Overwrite, so a retried batch id rewrites its own
  * artifact and the step is idempotent without a transaction log.
  *
  * Scale shape: the reference is an on-disk parquet histogram over
  * the bounded bin domain — never state-store state, never driver
  * memory; each batch's histogram partial-aggregates map-side to the
  * same bounded domain before the full-outer bin join (two
  * histogram-sized frames); the PSI arithmetic is q204's exactly
  * (Laplace +1 smoothing, ln of exact-integer quotients, round-6
  * terms summed as DECIMAL(28,6)).
  */
object StreamPsi {

  def step(batch: DataFrame, batchId: Long, refDir: String,
      verdictsDir: String): Unit = {
    val hist = batch.groupBy("bin").agg(count(lit(1)).as("c"))
    if (batchId == 0L) {
      hist.write.mode("overwrite").parquet(refDir)
    } else {
      val ss = batch.sparkSession
      val ref = ss.read.parquet(refDir).select(col("bin"), col("c").as("cr"))
      val cur = hist.select(col("bin"), col("c").as("cc"))
      val j = ref.join(cur, Seq("bin"), "full_outer")
        .select(col("bin"), coalesce(col("cr"), lit(0L)).as("cr"),
          coalesce(col("cc"), lit(0L)).as("cc"))
      val tots = j.agg(sum("cr").as("nr"), sum("cc").as("nc"),
        count(lit(1)).as("nb"))
      val term = round(
        ((col("cr") + 1).cast("double") / (col("nr") + col("nb")).cast("double") -
          (col("cc") + 1).cast("double") / (col("nc") + col("nb")).cast("double")) *
          log(((col("cr") + 1) * (col("nc") + col("nb"))).cast("double") /
            ((col("cc") + 1) * (col("nr") + col("nb"))).cast("double")), 6)
      j.crossJoin(broadcast(tots))
        .select(term.cast("decimal(28,6)").as("term"),
          col("nb"), col("nr"), col("nc"))
        .groupBy("nb", "nr", "nc")
        .agg(sum("term").cast("double").as("psi6"))
        .select(lit(batchId).as("window_id"), col("nb").as("n_bins"),
          col("nr").as("n_ref"), col("nc").as("n_cur"), col("psi6"))
        .coalesce(1).write.mode("overwrite").parquet(s"$verdictsDir/b$batchId")
    }
  }
}
