package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.Tables
import graft.stream.TableStore

/** CDC MERGE correctness entry (SURVEY T2/T3, pubmed.py:483-548).
  *
  * Derives 5 ordered "update files" from the events table
  * (batch = event_id % 5), treats event_type='error' rows as
  * DeleteCitation tombstones and everything else as upserts keyed by
  * user_id, and applies them SEQUENTIALLY through TableStore.merge —
  * deletes first, then last-wins upserts, per batch — then re-applies
  * batch 2 under its already-logged source_filename to prove
  * exactly-once idempotence (the re-run must be a no-op or the hash
  * breaks).
  *
  * The DuckDB oracle computes the equivalent closed form: a key is
  * present iff its best upsert batch >= its last tombstone batch
  * (same-batch upserts re-insert, matching the reference's
  * delete-then-upsert order), valued by the (batch, ts, event_id)-max
  * upsert.
  */
object Cdc {

  private val q44CdcMerge = Q(
    "q44_cdc_merge",
    (s, d) => {
      val root = Files.createTempDirectory("graft-cdc-").toString
      val store = new TableStore(s, root, "user_id")
      val ev = Tables.events(s, d).withColumn("batch", pmod(col("event_id"), lit(5)))

      def upserts(b: Int) = ev.filter(col("batch") === b)
        .filter(col("event_type") =!= "error")
        .select(col("user_id"), col("event_type").as("last_type"),
          col("value").as("last_value"),
          struct(col("ts"), col("event_id")).as("seq"))
      def tombstones(b: Int) = ev.filter(col("batch") === b)
        .filter(col("event_type") === "error")
        .select(col("user_id"))

      for (b <- 0 until 5)
        store.merge("state", upserts(b), tombstones(b), s"batch_$b")
      // idempotence probe: already-logged file must be a no-op
      val reapplied = store.merge("state", upserts(2), tombstones(2), "batch_2")
      require(!reapplied, "update_log failed to gate an already-applied file")

      store.snapshot("state").get.orderBy("user_id")
    },
    Some("""WITH ev AS (SELECT user_id, event_type, value, ts, event_id,
            event_id % 5 AS batch, (event_type = 'error') AS is_del FROM events),
      lu AS (SELECT user_id, event_type AS last_type, value AS last_value, batch,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY batch DESC, ts DESC, event_id DESC) AS rn
             FROM ev WHERE NOT is_del),
      lu1 AS (SELECT * FROM lu WHERE rn = 1),
      ld AS (SELECT user_id, max(batch) AS del_batch FROM ev WHERE is_del GROUP BY 1)
      SELECT u.user_id, u.last_type, u.last_value
      FROM lu1 u LEFT JOIN ld d ON u.user_id = d.user_id
      WHERE d.del_batch IS NULL OR u.batch >= d.del_batch
      ORDER BY u.user_id"""))

  val queries: Seq[Q] = Seq(q44CdcMerge)
}
