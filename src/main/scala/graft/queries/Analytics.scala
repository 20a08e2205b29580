package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Portable._

/** Large-scale analytics operators beyond the reference's own surface:
  * the blocked range join (q80) and sketch-based aggregation (q81) —
  * both named in the round brief as the operator families Spark lacks
  * natively ("as-of join, range join, a novel sketch").
  *
  * Same portability contract as [[Pipeline]]/[[Training]]: timestamps
  * compare as integer microseconds, hashes go through Portable.h32,
  * estimates are integer arithmetic, ratios round to 6 decimals — so
  * the DuckDB oracles replay every value bit-for-bit.
  */
object Analytics {

  /** q80: keyless RANGE JOIN — every event falling inside a 30-minute
    * "incident window" opened by each high-severity error event
    * (`value >= 200`), aggregated per window. Spark plans the naive
    * `ON ts >= start AND ts < end` as a broadcast nested-loop
    * (O(|P|·|I|)); [[graft.ops.RangeJoin]] blocks both sides on a
    * 30-minute time bin instead — each interval explodes to ≤2 bin
    * rows, each point to exactly one, and an ordinary equi-join + the
    * exact predicate meets every qualifying pair exactly once. One
    * uniform-key shuffle per side; the oracle is DuckDB's native
    * inequality join over the same predicate.
    */
  private val q80RangeJoin = Q(
    "q80_range_join",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
      val windows = ev
        .filter(col("event_type") === "error" && col("value") >= 200.0)
        .select(col("event_id").as("window_id"), col("ts_us").as("start_us"),
          (col("ts_us") + 1800000000L).as("end_us"))
      graft.ops.RangeJoin
        .pointsInIntervals(
          ev.select(col("ts_us"), col("user_id"), col("event_type")),
          "ts_us", windows, "start_us", "end_us", binUs = 1800000000L)
        .groupBy("window_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"))
        .orderBy("window_id")
    },
    Some("""WITH w AS (SELECT event_id AS window_id, epoch_us(ts) AS s_us
             FROM events WHERE event_type = 'error' AND value >= 200)
      SELECT w.window_id, count(*) AS n_events,
        count(DISTINCT e.user_id) AS n_users,
        CAST(sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_purchases
      FROM w JOIN events e
        ON epoch_us(e.ts) >= w.s_us AND epoch_us(e.ts) < w.s_us + 1800000000
      GROUP BY 1 ORDER BY 1"""),
    bench = true)

  /** q81: KMV DISTINCT-COUNT SKETCH — per-source distinct-shingle
    * cardinality estimated by the k-minimum-values aggregator
    * ([[graft.functions.Kmv]], k=128) next to the exact count and the
    * relative error. The scale story is the aggregation STATE: exact
    * COUNT(DISTINCT) must shuffle every distinct value per group,
    * while the KMV buffer is O(k) per group per task and collapses
    * map-side like any algebraic aggregate — at 100 TB the sketch is
    * the difference between a distinct-value shuffle and a constant-
    * size one. Estimate and rank pick are pure integer arithmetic, so
    * the oracle replays them exactly (exact-count branch below k is
    * exercised at sf0.001, the estimator branch everywhere).
    *
    * Plan note: co-computing the exact count forces a distinct — THIS
    * entry shuffles on (source, h) because the report needs the true
    * error. The distinct is taken EXPLICITLY before the aggregate
    * (KMV ignores duplicates, so this is semantics-preserving) rather
    * than via countDistinct alongside the udaf: the mixed
    * distinct/non-distinct rewrite plans an Expand (2N rows) and feeds
    * every raw shingle through the non-codegen ObjectHashAggregate,
    * where the explicit form collapses duplicates in a codegen'd
    * partial aggregate first (1.36 s → ~0.8 s at sf0.1, 0.6–0.9 across runs; the residue
    * is the shingle explode itself, shared with q22/q23). The
    * production form drops n_exact, and with it the distinct shuffle:
    * KmvSpec's udaf test pins that the sketch alone
    * partial-aggregates (O(k) state per task).
    */
  private val q81KmvDistinct = Q(
    "q81_kmv_distinct",
    (s, d) => {
      val kmv = graft.functions.Kmv.sketch(128)
      Tables.documents(s, d)
        .select(col("source"),
          explode(graft.functions.Hash32.shingleHashes(col("text"))).as("h"))
        .distinct()
        .groupBy("source")
        .agg(count(lit(1)).as("n_exact"), kmv(col("h")).as("kmv"))
        .select(col("source"), col("n_exact"),
          col("kmv.n_min").cast("long").as("n_min"),
          col("kmv.est").as("est"))
        .withColumn("rel_err",
          round(abs(col("est") - col("n_exact")).cast("double") /
            col("n_exact"), 6))
        .orderBy("source")
    },
    Some(s"""WITH ${Pipeline.shingleCte},
      th AS (SELECT d.source, CAST('0x' || substr(md5(s.s), 1, 8) AS BIGINT) AS h
             FROM sh s JOIN documents d ON s.doc_id = d.doc_id),
      dh AS (SELECT DISTINCT source, h FROM th),
      r AS (SELECT source, h,
              row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
              count(*) OVER (PARTITION BY source) AS nd
            FROM dh),
      k AS (SELECT source, CAST(max(nd) AS BIGINT) AS n_exact,
              max(CASE WHEN rn = LEAST(nd, 128) THEN h END) AS kth
            FROM r GROUP BY 1),
      e AS (SELECT source, n_exact,
              CAST(LEAST(n_exact, 128) AS BIGINT) AS n_min,
              CAST(CASE WHEN n_exact < 128 THEN n_exact
                   ELSE (127 * 4294967296) // kth END AS BIGINT) AS est
            FROM k)
      SELECT source, n_exact, n_min, est,
        round(CAST(abs(est - n_exact) AS DOUBLE) / n_exact, 6) AS rel_err
      FROM e ORDER BY source"""),
    bench = true)

  /** q90: HEAVY-HITTER vocabulary mining — exact frequencies of every
    * token above 0.5% of the corpus, found WITHOUT shuffling the
    * vocabulary. Pass 1 is a single global aggregate whose state is a
    * capacity-255 Misra–Gries summary ([[graft.functions.HeavyHitters]]):
    * O(m) per task, partial-aggregated map-side, merged associatively —
    * candidates ⊇ every token with frequency > N/256, and
    * 0.005 > 1/256, so no heavy token can be missed. Pass 2 confirms
    * candidates exactly: the ≤255-token set rides the plan as an IN
    * filter, so ~the whole vocabulary dies inside the scan stage and
    * the confirming groupBy aggregates a ≤255-key stream (hot keys,
    * but the partial aggregate collapses them map-side to one row per
    * task). Net: two scans, no vocabulary-sized exchange anywhere —
    * vs the exact formulation the oracle runs, which shuffles every
    * distinct token. The confirmed output is deterministic and exact
    * even though the MG candidate set itself is partition-order-
    * dependent.
    */
  private val q90HeavyHitters = Q(
    "q90_heavy_hitters",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
      val mg = graft.functions.HeavyHitters.agg(255)
      val first = toks.agg(count(lit(1)).as("n"), mg(col("w")).as("hh")).head()
      val total = first.getLong(0)
      val cands = first.getStruct(1)
        .getAs[scala.collection.Seq[String]]("words").toSeq
      val thr = math.ceil(0.005 * total).toLong
      toks.filter(col("w").isin(cands: _*))
        .groupBy("w")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= thr)
        .select(col("w"), col("cnt"), lit(total).as("n_total"))
        .orderBy(col("cnt").desc, col("w"))
    },
    Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      tt AS (SELECT w FROM t WHERE len(w) > 0),
      n AS (SELECT count(*) AS total FROM tt)
      SELECT w, count(*) AS cnt, max(total) AS n_total
      FROM tt CROSS JOIN n
      GROUP BY w
      HAVING count(*) >= ceil(0.005 * max(total))
      ORDER BY cnt DESC, w"""),
    bench = true)

  /** q91: BUCKETED CO-LOCATED fact⋈fact join — the storage-level
    * answer to the shuffle question every 100 TB join raises: both
    * sides are written `bucketBy(8, orderkey)` + sorted (the layout a
    * production deployment maintains for its central fact tables), and
    * the sort-merge join then reads bucket i against bucket i with NO
    * exchange on either side — the query itself asserts that on its
    * executed plan, so the zero-shuffle property is checked through
    * the driver gate on every run, not just in BucketingSpec. The
    * only shuffle left is the 5-key priority rollup above the join.
    * The oracle replays the join+rollup on the raw parquet — bucketing
    * must be invisible in the values.
    */
  private val q91BucketedJoin = Q(
    "q91_bucketed_join",
    (s, d) => {
      // fixed per-process scratch root + overwrite, so repeated runs
      // (tri-scale verify, bench warm-up) replace the table files
      // instead of accumulating a fresh temp copy per invocation
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), "graft-bkt").getAbsolutePath
      s.sql("DROP TABLE IF EXISTS graft_li_b")
      s.sql("DROP TABLE IF EXISTS graft_ord_b")
      Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
        .write.mode("overwrite").option("path", s"$root/li")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_li_b")
      Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").option("path", s"$root/ord")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_ord_b")
      val joined = s.table("graft_li_b").hint("merge")
        .join(s.table("graft_ord_b"),
          col("l_orderkey") === col("o_orderkey"))
      // executedPlan (not sparkPlan): exchanges are only inserted by
      // the EnsureRequirements preparation pass
      val joinPlan = joined.queryExecution.executedPlan.toString
      require(!joinPlan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$joinPlan")
      joined.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o.o_orderpriority, count(*) AS n_items,
        CAST(sum(CAST(l.l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1 ORDER BY 1"""))

  val queries: Seq[Q] =
    Seq(q80RangeJoin, q81KmvDistinct, q90HeavyHitters, q91BucketedJoin)
}
