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

  /** q98: STREAMING backward as-of join through the driver gate — the
    * third execution model of the as-of family (q79 composed window,
    * q92 native operator, this one incremental): clicks and purchases
    * arrive as ONE tagged file stream, drained `AvailableNow`, and
    * [[graft.stream.StreamAsOf]] enriches each purchase with the
    * latest preceding-or-equal click of the same user from O(1) keyed
    * state. The oracle is q79's DuckDB `ASOF LEFT JOIN` — all three
    * implementations are pinned to the same independent replay.
    */
  private val q98StreamAsof = Q(
    "q98_stream_asof",
    (s, d) => {
      import s.implicits._
      // fresh root per run: a reused streaming CHECKPOINT would treat
      // the re-run's input as already processed (q76's pattern)
      val root = Files.createTempDirectory("graft-sasof-").toString
      val tagged = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id").as("key"), col("ts"),
          col("event_id").as("seq"),
          (col("event_type") === "click").as("is_right"),
          when(col("event_type") === "click", col("value"))
            .otherwise(lit(0.0)).as("payload"))
      tagged.write.parquet(s"$root/in")
      val sdf = s.readStream.schema(tagged.schema).parquet(s"$root/in")
        .as[graft.stream.StreamAsOf.Tagged]
      val query = graft.stream.StreamAsOf.backward(sdf)
        .writeStream.format("memory").queryName("q98_sasof")
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      s.table("q98_sasof")
        .select(col("seq").as("purchase_id"), col("key").as("user_id"),
          col("asof_seq").as("click_id"),
          col("asof_payload").as("click_value"),
          (unix_micros(col("ts")) - col("asof_ts_us")).as("gap_us"))
        .orderBy("purchase_id")
    },
    Some("""WITH p AS (SELECT event_id AS purchase_id, user_id, ts
             FROM events WHERE event_type = 'purchase'),
      c0 AS (SELECT user_id, ts, event_id, value AS click_value,
               row_number() OVER (PARTITION BY user_id, ts
                 ORDER BY event_id DESC) AS rn
             FROM events WHERE event_type = 'click'),
      c AS (SELECT user_id, ts, event_id, click_value FROM c0 WHERE rn = 1)
      SELECT p.purchase_id, p.user_id, c.event_id AS click_id, c.click_value,
        epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY purchase_id"""))

  /** q99: SCD TYPE-2 HISTORY build — the warehouse-side complement of
    * q44's last-wins state: instead of keeping only each key's final
    * row, compress its upsert stream into validity intervals
    * [effective_from, effective_to) that open whenever the tracked
    * attribute (event_type) CHANGES, with the open interval flagged
    * current. This is the standard slowly-changing-dimension shape a
    * downstream as-of join (q79/q92/q98) consumes. Plan: one shuffle
    * on user_id feeding two same-partitioning windows (change
    * detection via lag, then versioning + interval close via
    * row_number/lead — Catalyst plans a single Exchange reused by both
    * sorts). Timestamps compare as integer microseconds so the oracle
    * replays every boundary exactly.
    */
  private val q99Scd2History = Q(
    "q99_scd2_history",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byKey = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val ups = Tables.events(s, d)
        .filter(col("event_type") =!= "error")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
      val changes = ups
        .withColumn("prev", lag(col("event_type"), 1).over(byKey))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      changes
        .select(col("user_id"), col("event_type").as("state"),
          col("ts_us").as("effective_from_us"), col("event_id"))
        .withColumn("version", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("effective_from_us"), col("event_id"))).cast("long"))
        .withColumn("effective_to_us", lead(col("effective_from_us"), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("effective_from_us"), col("event_id"))))
        .select(col("user_id"), col("version"), col("state"),
          col("effective_from_us"), col("effective_to_us"),
          col("effective_to_us").isNull.as("is_current"))
        .orderBy("user_id", "version")
    },
    Some("""WITH u AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
             FROM events WHERE event_type <> 'error'),
      l AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
              ORDER BY ts_us, event_id) AS prev FROM u),
      ch AS (SELECT user_id, event_type AS state, ts_us, event_id
             FROM l WHERE prev IS NULL OR prev <> event_type),
      v AS (SELECT user_id, state, ts_us AS effective_from_us,
              CAST(row_number() OVER (PARTITION BY user_id
                ORDER BY ts_us, event_id) AS BIGINT) AS version,
              lead(ts_us) OVER (PARTITION BY user_id
                ORDER BY ts_us, event_id) AS effective_to_us
            FROM ch)
      SELECT user_id, version, state, effective_from_us, effective_to_us,
        effective_to_us IS NULL AS is_current
      FROM v ORDER BY user_id, version"""),
    bench = true)

  val queries: Seq[Q] =
    Seq(q44CdcMerge, q76StreamIngest, q98StreamAsof, q99Scd2History)
}
