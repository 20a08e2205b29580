package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One micro-batch of the STREAMING SCHEMA-DRIFT GATE (q242's
  * foreachBatch body): a landed file whose records are missing a
  * REQUIRED field (JSON schema drift — the field reads as all-null
  * under the fixed stream schema) must not poison the standing
  * table; the gate quarantines the whole batch and keeps draining.
  * This is q61's batch-side quarantine (corrupt files → quarantine
  * dir) lifted to the streaming path, where stopping the query on a
  * poison file would stall ingestion for every downstream consumer.
  *
  * Verdict + apply layout follows the b&lt;id&gt; Overwrite subdir
  * regime (q141/q175/q205/q232): a retried batch re-derives the same
  * verdict and rewrites the same subdir, so the gate is idempotent
  * without a transaction log.
  *
  * Scale shape: the null-audit is one map-side aggregate over the
  * micro-batch; applied batches append as their own subdir (no
  * rewrite of standing data); the quarantine dir holds the poison
  * rows for forensics, exactly like the batch path.
  */
object StreamSchemaGate {

  /** Returns true iff the batch was applied (false = quarantined). */
  def step(batch: DataFrame, batchId: Long, requiredCol: String,
      appliedDir: String, quarantineDir: String,
      verdictsDir: String): Boolean = {
    // coalesce: sum() over an EMPTY micro-batch is null, and empty
    // batches do occur outside the mtime-pinned fixture (source idle
    // tick) — getLong on the null would NPE and kill the query
    val audit = batch.agg(count(lit(1)).as("n"),
      coalesce(sum(when(col(requiredCol).isNull, 1L).otherwise(0L)),
        lit(0L)).as("n_null"))
      .head()
    val (n, nNull) = (audit.getLong(0), audit.getLong(1))
    // drift signature: the required field is absent from the landed
    // file, so EVERY row reads null — a partial null rate is ordinary
    // dirty data and passes through to row-level guards (P10)
    val poisoned = n > 0 && nNull == n
    val target = if (poisoned) quarantineDir else appliedDir
    batch.coalesce(1).write.mode("overwrite").parquet(s"$target/b$batchId")
    batch.sparkSession
      .createDataFrame(Seq((batchId, n, nNull, !poisoned)))
      .toDF("batch_id", "n_rows", "n_null_required", "applied")
      .coalesce(1).write.mode("overwrite").parquet(s"$verdictsDir/b$batchId")
    !poisoned
  }
}
