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

  /** q76: the STREAMING ingest path end-to-end (SURVEY T1/T5/O4 —
    * round-2 verdict's last spec-only items, now oracle-checked).
    *
    * Same 5 logical update batches as q44, but landed as JSON files in
    * a directory and drained by [[graft.stream.StreamIngest
    * .runAvailableNow]]: `readStream` + `Trigger.AvailableNow` +
    * `maxFilesPerTrigger=1` turns each file into its own micro-batch
    * (T1); files carry ascending modTimes and sortable names so both
    * the source's oldest-first discovery and the in-batch filename
    * sort apply them in order (O4); each micro-batch refreshes the
    * count matview (T5). The result aggregates the FINAL STORED table
    * per last_type and cross-joins the matview's row count, so the
    * oracle proves (a) the streamed CDC state equals the q44 closed
    * form and (b) the maintained matview equals the final table's
    * cardinality.
    */
  private val q76StreamIngest = Q(
    "q76_stream_ingest",
    (s, d) => {
      val root = Files.createTempDirectory("graft-si-").toString
      val landing = new java.io.File(root, "landing")
      landing.mkdirs()
      val store = new TableStore(s, s"$root/store", "user_id")
      val ev = Tables.events(s, d).withColumn("batch", pmod(col("event_id"), lit(5)))

      // one JSON-lines landing file per batch; modTime ascending and
      // names sortable so drain order is deterministic either way
      for (b <- 0 until 5) {
        val stage = s"$root/stage_$b"
        ev.filter(col("batch") === b)
          .select(
            when(col("event_type") === "error", lit("delete"))
              .otherwise(lit("upsert")).as("op"),
            lit(s"batch_$b.json").as("source_filename"),
            col("user_id"), col("event_type").as("last_type"),
            col("value").as("last_value"),
            struct(unix_micros(col("ts")).as("ts_us"), col("event_id")).as("seq"))
          .coalesce(1).write.json(stage)
        val part = new java.io.File(stage).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
          .getOrElse(sys.error(s"no json part file in $stage"))
        val dst = new java.io.File(landing, s"batch_$b.json")
        Files.move(part.toPath, dst.toPath)
        dst.setLastModified(60000L * (b + 1))
      }

      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "op STRING, source_filename STRING, user_id BIGINT, " +
          "last_type STRING, last_value DOUBLE, " +
          "seq STRUCT<ts_us: BIGINT, event_id: BIGINT>")
      graft.stream.StreamIngest.runAvailableNow(
        s, landing.toString, s"$root/ckpt", schema, store, "state", "user_id",
        maintainCounts = true)

      val fin = store.snapshot("state").get
      val mat = s.read.parquet(store.matviewDir("state"))
        .select(col("n_rows").as("total_rows"))
      fin.groupBy("last_type")
        .agg(count(lit(1)).as("n_keys"),
          graft.functions.Portable.dsum6(col("last_value")).as("sum_value"))
        .crossJoin(mat)
        .orderBy("last_type")
    },
    Some("""WITH ev AS (SELECT user_id, event_type, value, ts, event_id,
            event_id % 5 AS batch, (event_type = 'error') AS is_del FROM events),
      lu AS (SELECT user_id, event_type AS last_type, value AS last_value, batch,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY batch DESC, ts DESC, event_id DESC) AS rn
             FROM ev WHERE NOT is_del),
      lu1 AS (SELECT * FROM lu WHERE rn = 1),
      ld AS (SELECT user_id, max(batch) AS del_batch FROM ev WHERE is_del GROUP BY 1),
      fin AS (SELECT u.user_id, u.last_type, u.last_value
              FROM lu1 u LEFT JOIN ld d ON u.user_id = d.user_id
              WHERE d.del_batch IS NULL OR u.batch >= d.del_batch),
      tot AS (SELECT count(*) AS total_rows FROM fin)
      SELECT last_type, count(*) AS n_keys,
        CAST(sum(CAST(last_value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
        total_rows
      FROM fin CROSS JOIN tot
      GROUP BY 1, 4 ORDER BY 1"""))

  val queries: Seq[Q] = Seq(q44CdcMerge, q76StreamIngest)
}
