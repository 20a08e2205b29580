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
    Some(rangeJoinOracle),
    bench = true)

  /** Shared by q80 (composed bin-blocked form) and q123 (native
    * operator) — the two implementations are pinned to the same
    * independent DuckDB inequality-join replay, the q79/q92 pairing.
    */
  private def rangeJoinOracle: String =
    """WITH w AS (SELECT event_id AS window_id, epoch_us(ts) AS s_us
             FROM events WHERE event_type = 'error' AND value >= 200)
      SELECT w.window_id, count(*) AS n_events,
        count(DISTINCT e.user_id) AS n_users,
        CAST(sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_purchases
      FROM w JOIN events e
        ON epoch_us(e.ts) >= w.s_us AND epoch_us(e.ts) < w.s_us + 1800000000
      GROUP BY 1 ORDER BY 1"""

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

  /** Exact confirm pass over a Misra–Gries summary row `(n, hh)`,
    * shared by q90 (batch MG buffer) and q136 (the same summary
    * maintained in the streaming state store): IN-filter on the ≤255
    * candidates, exact recount, threshold ceil(0.5% · n). Sharing the
    * pass (and [[heavyHittersOracleSql]]) is what keeps the two
    * entries pinning ONE semantics — a tokenization or threshold
    * change cannot drift them apart.
    */
  private[queries] def mgConfirm(
      toks: org.apache.spark.sql.DataFrame,
      summary: org.apache.spark.sql.Row): org.apache.spark.sql.DataFrame = {
    val total = summary.getLong(0)
    val cands = summary.getStruct(1)
      .getAs[scala.collection.Seq[String]]("words").toSeq
    val thr = math.ceil(0.005 * total).toLong
    toks.filter(col("w").isin(cands: _*))
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thr)
      .select(col("w"), col("cnt"), lit(total).as("n_total"))
      .orderBy(col("cnt").desc, col("w"))
  }

  /** ONE closed form for the exact heavy-hitter set, shared by q90 and
    * q136 (declared before both entries: object vals initialize in
    * order).
    */
  private[queries] val heavyHittersOracleSql =
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      tt AS (SELECT w FROM t WHERE len(w) > 0),
      n AS (SELECT count(*) AS total FROM tt)
      SELECT w, count(*) AS cnt, max(total) AS n_total
      FROM tt CROSS JOIN n
      GROUP BY w
      HAVING count(*) >= ceil(0.005 * max(total))
      ORDER BY cnt DESC, w"""

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
      mgConfirm(toks, first)
    },
    Some(heavyHittersOracleSql),
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
      // fresh scratch per run (a fixed machine-wide dir races with
      // concurrent verify/test JVMs — the q103 lesson), cleaned up
      // below once the small result is materialized
      val root = java.nio.file.Files
        .createTempDirectory("graft-bkt-").toString
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
      val out = joined.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderpriority")
      val result = Scratch.sealAndClean(out, root)
      s.sql("DROP TABLE IF EXISTS graft_li_b")
      s.sql("DROP TABLE IF EXISTS graft_ord_b")
      result
    },
    Some("""SELECT o.o_orderpriority, count(*) AS n_items,
        CAST(sum(CAST(l.l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1 ORDER BY 1"""))

  /** q100: COUNT-MIN SKETCH frequency estimation — the mergeable
    * point-query companion to q81 (cardinality) and q90 (heavy
    * hitters): token frequencies approximated by a d=4 × w=16 counter
    * grid where cell (i, h_i(w) mod 16) accumulates every occurrence
    * hashing there and a token's estimate is the MINIMUM over its d
    * cells — an upper bound with overcount ≤ N/w per row, never an
    * undercount. The sketch build is the scale story: the corpus
    * collapses to ≤ d·w = 64 counter rows in the map-side partial
    * aggregate (counts on a bounded key space are algebraic), so NO
    * vocabulary-sized state or exchange exists anywhere — vs the exact
    * per-token count, which shuffles every distinct token. The probe
    * set here is the full 31-token vocabulary (at 100 TB: a bounded
    * watchlist riding a broadcast; the exact column exists only to
    * report the true overcount). w=16 < |vocab|=31 is deliberately
    * undersized so collisions actually exercise the min-estimator —
    * with w ≥ 2/ε the same plan gives εN-accurate counts. All
    * arithmetic is integer (md5-derived halves, counts, min), so the
    * oracle replays the grid bit-for-bit.
    *
    * Hash cost: the d row hashes are the Kirsch–Mitzenmacher
    * construction h_i = h1 + i·h2 ("Less Hashing, Same Performance",
    * 2006) over the two 32-bit HALVES of ONE md5 digest per
    * occurrence — the sf1 stage profile showed the original
    * 4-independent-md5 variant spending 94% of the query in that one
    * scan stage (md5 per (occurrence, seed)); same estimator
    * guarantees, one digest per row.
    */
  private val q100CmsSketch = Q(
    "q100_cms_sketch",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
      val hashed = toks.withColumn("dg", md5(col("w")))
        .withColumn("h1", conv(substring(col("dg"), 1, 8), 16, 10).cast("long"))
        .withColumn("h2", conv(substring(col("dg"), 9, 8), 16, 10).cast("long"))
      def cells(h1: org.apache.spark.sql.Column, h2: org.apache.spark.sql.Column) =
        array((0 until 4).map(i =>
          pmod(h1 + lit(i.toLong) * h2, lit(16L))): _*)
      val cms = hashed
        .select(posexplode(cells(col("h1"), col("h2"))).as(Seq("seed", "b")))
        .groupBy("seed", "b").agg(count(lit(1)).as("c"))
      // exact counts need no per-occurrence hash: group first (31
      // keys), digest the distinct tokens after the aggregate
      val probes = toks.groupBy("w").agg(count(lit(1)).as("exact_cnt"))
        .withColumn("dg", md5(col("w")))
        .withColumn("h1", conv(substring(col("dg"), 1, 8), 16, 10).cast("long"))
        .withColumn("h2", conv(substring(col("dg"), 9, 8), 16, 10).cast("long"))
      probes
        .select(col("w"), col("exact_cnt"),
          posexplode(cells(col("h1"), col("h2"))).as(Seq("seed", "b")))
        .join(broadcast(cms), Seq("seed", "b"))
        .groupBy("w", "exact_cnt")
        .agg(min(col("c")).as("est_cnt"))
        .select(col("w"), col("exact_cnt"), col("est_cnt"),
          (col("est_cnt") - col("exact_cnt")).as("overcount"))
        .orderBy("w")
    },
    Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      tt AS (SELECT w, CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS h1,
               CAST('0x' || substr(md5(w), 9, 8) AS BIGINT) AS h2
             FROM t WHERE len(w) > 0),
      seeds(i) AS (VALUES (0), (1), (2), (3)),
      cms AS (SELECT i, (h1 + i * h2) % 16 AS b, count(*) AS c
              FROM tt CROSS JOIN seeds GROUP BY 1, 2),
      ex AS (SELECT w, count(*) AS exact_cnt,
               CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS h1,
               CAST('0x' || substr(md5(w), 9, 8) AS BIGINT) AS h2
             FROM tt GROUP BY 1),
      pb AS (SELECT e.w, e.exact_cnt, min(c.c) AS est_cnt
             FROM ex e CROSS JOIN seeds s
             JOIN cms c ON c.i = s.i AND c.b = (e.h1 + s.i * e.h2) % 16
             GROUP BY 1, 2)
      SELECT w, exact_cnt, est_cnt, est_cnt - exact_cnt AS overcount
      FROM pb ORDER BY w"""),
    bench = true)

  /** q101: FUNNEL analysis — ordered view → click → purchase
    * conversion with strict event-time sequencing (each stage's
    * timestamp must follow the user's PREVIOUS stage, not merely
    * exist), the canonical product-analytics query over an event
    * stream. Three stage aggregations, each keyed on user_id: stage
    * k's candidate events join the stage-(k-1) result on user_id
    * before taking min(ts) — all three shuffles share the user_id
    * key, so at 100 TB the stages co-partition (one real exchange,
    * reused; the stage results themselves are |users|-sized, far
    * smaller than the event table, and broadcast back). Gaps sum as
    * integer microseconds.
    */
  private val q101Funnel = Q(
    "q101_funnel",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("t")).as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(broadcast(v), "user_id")
        .filter(col("t") > col("t1"))
        .groupBy("user_id").agg(min(col("t")).as("t2"))
      val p = e.filter(col("event_type") === "purchase")
        .join(broadcast(c), "user_id")
        .filter(col("t") > col("t2"))
        .groupBy("user_id").agg(min(col("t")).as("t3"))
      val gaps = p.join(v, "user_id")
        .agg(count(lit(1)).as("n_purchase_users"),
          sum(col("t3") - col("t1")).as("sum_view_to_purchase_us"))
      v.agg(count(lit(1)).as("n_view_users"))
        .crossJoin(c.agg(count(lit(1)).as("n_click_users")))
        .crossJoin(gaps)
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
      v AS (SELECT user_id, min(t) AS t1 FROM e
            WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(e.t) AS t2 FROM e
            JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.t > v.t1 GROUP BY 1),
      p AS (SELECT e.user_id, min(e.t) AS t3 FROM e
            JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.t > c.t2 GROUP BY 1)
      SELECT (SELECT count(*) FROM v) AS n_view_users,
        (SELECT count(*) FROM c) AS n_click_users,
        (SELECT count(*) FROM p) AS n_purchase_users,
        (SELECT CAST(sum(p.t3 - v.t1) AS BIGINT)
         FROM p JOIN v ON p.user_id = v.user_id) AS sum_view_to_purchase_us"""))

  /** q102: RETENTION COHORTS — users grouped by first-activity week,
    * tracked by distinct active weeks since; each (cohort, offset)
    * cell reports how many of the cohort's users were active and the
    * retention ratio vs the cohort's size (offset 0 contains every
    * member by construction). Plan: the cohort assignment is a
    * min-window over user_id (one shuffle), activity distinct-ifies on
    * (cohort, offset, user) — both keyed on uniform ids; the ratio
    * divides longs inside one final hundreds-of-rows aggregate.
    * Weeks are integer microsecond division, so cohort boundaries are
    * engine-exact.
    */
  private val q102Retention = Q(
    "q102_retention",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
      val act = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 604800000000").as("wk"))
        .withColumn("cohort_wk", min(col("wk")).over(byUser))
        .select(col("cohort_wk"),
          (col("wk") - col("cohort_wk")).as("week_offset"), col("user_id"))
        .distinct()
      val cells = act.groupBy("cohort_wk", "week_offset")
        .agg(count(lit(1)).as("n_users"))
      cells
        .withColumn("cohort_size",
          max(when(col("week_offset") === 0, col("n_users")))
            .over(Window.partitionBy(col("cohort_wk"))))
        .select(col("cohort_wk"), col("week_offset"), col("n_users"),
          round(col("n_users").cast("double") / col("cohort_size"), 6)
            .as("retention"))
        .orderBy("cohort_wk", "week_offset")
    },
    Some("""WITH a AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
      m AS (SELECT *, min(wk) OVER (PARTITION BY user_id) AS cohort_wk FROM a),
      act AS (SELECT DISTINCT cohort_wk, wk - cohort_wk AS week_offset, user_id
              FROM m),
      cells AS (SELECT cohort_wk, week_offset, count(*) AS n_users
                FROM act GROUP BY 1, 2),
      z AS (SELECT *, max(CASE WHEN week_offset = 0 THEN n_users END)
              OVER (PARTITION BY cohort_wk) AS cohort_size FROM cells)
      SELECT cohort_wk, week_offset, n_users,
        round(CAST(n_users AS DOUBLE) / cohort_size, 6) AS retention
      FROM z ORDER BY cohort_wk, week_offset"""))

  /** q103: PARTITION-PRUNED layout — the date-partitioned-table
    * contract every 100 TB event store lives by: the table is written
    * `partitionBy(day_id)` (Hive-style directory partitioning, the
    * layout a production ingest maintains), and a day-filtered read
    * must prune to that day's directory at PLANNING time — the scan
    * never lists, opens, or row-filters the other 29 days. Like q91's
    * zero-exchange assertion, the query ASSERTS the pruning on its own
    * executed plan (`PartitionFilters` on the scan node + exactly one
    * selected partition directory), so the layout contract is
    * driver-gate-checked every run. The oracle replays the day filter
    * over the raw events table — partitioning must be invisible in
    * the values.
    */
  private val q103PartitionPrune = Q(
    "q103_partition_prune",
    (s, d) => {
      val targetDay = 19737L // 2024-01-15
      // fresh scratch per run: a fixed machine-wide dir would race with
      // a concurrent verify/test JVM overwriting it mid-scan
      val root = java.nio.file.Files
        .createTempDirectory("graft-daypart-").toString
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          expr("unix_micros(ts) DIV 86400000000").as("day_id"))
        .write.mode("overwrite").partitionBy("day_id").parquet(root)
      val pruned = s.read.parquet(root).filter(col("day_id") === targetDay)
      val agg = pruned.groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum6(col("value")).as("sum_value"))
        .orderBy("event_type")
      val plan = agg.queryExecution.executedPlan.toString
      require(
        raw"PartitionFilters: \[[^\]]*day_id".r.findFirstIn(plan).isDefined,
        s"day filter must prune at planning time, not per row:\n$plan")
      val scanned = pruned.select(input_file_name()).distinct().collect()
        .map(r => r.getString(0).replaceAll("/[^/]*$", "")).distinct
      require(scanned.length == 1 && scanned.head.endsWith(s"day_id=$targetDay"),
        s"scan must touch exactly the target day's directory: ${scanned.toSeq}")
      // the scratch holds a full events copy — materialize the 5-row
      // result and remove it rather than leaking one copy per run
      Scratch.sealAndClean(agg, root)
    },
    Some("""SELECT event_type, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      FROM events WHERE epoch_us(ts) // 86400000000 = 19737
      GROUP BY 1 ORDER BY 1"""))

  /** q108: Z-ORDER LAYOUT — multi-dimensional data clustering for file
    * skipping, the layout answer when queries filter on TWO columns
    * (q103's directory partitioning only prunes its one partition
    * key): interleaving the bits of (x, y) into a space-filling
    * z-value makes rows close in BOTH dimensions close in the sort
    * order, so equal-size "files" cut from the z-sorted order each
    * cover a small (x, y) tile and a 2-D box predicate touches few of
    * them. The query computes the z-value (pure bit arithmetic — the
    * operator), models 64 files per layout with DETERMINISTIC
    * fixed-boundary range bucketing (`z >> 10` over the z-order — z is
    * bounded in [0, 65536) by construction — vs 64 equal event_id
    * ranges for insertion order), and reports the box-query's file
    * skipping under each: files scanned, rows scanned, rows matched —
    * the z-order row should show ~an order fewer scanned rows for the
    * same matches.
    *
    * Plan shape: both chunk columns are map-side projections (the
    * round-8 verdict's fix — the previous ntile(64) over a GLOBAL
    * Window.orderBy moved the whole table to one partition, exactly
    * the plan PlanHygieneSpec now gates). The only non-map-side work
    * is the 1-row min/max bounds frame, broadcast back. At 100 TB the
    * fixed boundaries become the real writer's
    * `repartitionByRange(z).sortWithinPartitions(z)` and skipping
    * becomes parquet row-group min/max pruning on the persisted z
    * column; (event_id - mn) * 64 stays in int64 for any id span
    * below 2^57 — synthetic ids are dense from 0.
    */
  private val q108ZorderLayout = Q(
    "q108_zorder_layout",
    (s, d) => {
      val x = pmod(col("user_id"), lit(256L))
      val y = pmod(floor(col("value")).cast("long"), lit(256L))
      val z = (0 until 8).map(i =>
        (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
          (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))))
        .reduce(_ + _)
      val ev = Tables.events(s, d)
        .select(col("event_id"), x.as("x"), y.as("y"), z.as("z"))
      val bounds = ev.agg(min("event_id").as("mn"), max("event_id").as("mx"))
      val base = ev.crossJoin(broadcast(bounds))
        .withColumn("in_box",
          col("x").between(64, 127) && col("y").between(32, 95))
        // z ∈ [0, 65536): 64 equal-width z tiles, pure bit shift
        .withColumn("chunk_z", shiftright(col("z"), 10))
        // 64 equal event_id ranges; operands non-negative so Spark's
        // truncating div equals DuckDB's flooring //
        .withColumn("chunk_l",
          expr("((event_id - mn) * 64) div (mx - mn + 1)"))
      def stats(chunkCol: String, label: String) = base
        .groupBy(col(chunkCol).as("chunk"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("in_box"), 1L).otherwise(0L)).as("n_box"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("n_box") > 0, 1L).otherwise(0L)).as("n_chunks_scanned"),
          sum(when(col("n_box") > 0, col("n_rows")).otherwise(0L))
            .as("n_rows_scanned"),
          sum(col("n_box")).as("n_rows_matched"))
        .select(lit(label).as("layout"), col("n_chunks"),
          col("n_chunks_scanned"), col("n_rows_scanned"), col("n_rows_matched"))
      stats("chunk_z", "zorder").unionAll(stats("chunk_l", "linear"))
        .orderBy(col("layout").desc)
    },
    Some {
      val zSql = (0 until 8).map(i =>
        s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH b AS (SELECT event_id, ((user_id % 256) + 256) % 256 AS x,
              ((CAST(floor(value) AS BIGINT) % 256) + 256) % 256 AS y
            FROM events),
        zz AS (SELECT event_id, x, y, $zSql AS z,
                 (x BETWEEN 64 AND 127 AND y BETWEEN 32 AND 95) AS in_box
               FROM b),
        bounds AS (SELECT min(event_id) AS mn, max(event_id) AS mx FROM b),
        c AS (SELECT zz.*, (z >> 10) AS chunk_z,
                ((event_id - mn) * 64) // (mx - mn + 1) AS chunk_l
              FROM zz, bounds),
        sz AS (SELECT chunk_z AS chunk, count(*) AS n_rows,
                 sum(CASE WHEN in_box THEN 1 ELSE 0 END) AS n_box
               FROM c GROUP BY 1),
        sl AS (SELECT chunk_l AS chunk, count(*) AS n_rows,
                 sum(CASE WHEN in_box THEN 1 ELSE 0 END) AS n_box
               FROM c GROUP BY 1),
        az AS (SELECT 'zorder' AS layout, count(*) AS n_chunks,
                 CAST(sum(CASE WHEN n_box > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_chunks_scanned,
                 CAST(sum(CASE WHEN n_box > 0 THEN n_rows ELSE 0 END) AS BIGINT)
                   AS n_rows_scanned,
                 CAST(sum(n_box) AS BIGINT) AS n_rows_matched FROM sz),
        al AS (SELECT 'linear' AS layout, count(*) AS n_chunks,
                 CAST(sum(CASE WHEN n_box > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_chunks_scanned,
                 CAST(sum(CASE WHEN n_box > 0 THEN n_rows ELSE 0 END) AS BIGINT)
                   AS n_rows_scanned,
                 CAST(sum(n_box) AS BIGINT) AS n_rows_matched FROM sl)
        SELECT * FROM az UNION ALL SELECT * FROM al ORDER BY layout DESC"""
    })

  /** q110: REFERENTIAL-INTEGRITY AUDIT — orphan detection across the
    * star schema's foreign keys plus the one edge synthetic reality
    * breaks (events.user_id drawn from a wider range than the customer
    * dimension), the standard pre-training/pre-publish data-quality
    * gate. Each relationship is a left join onto the parent's key set
    * with a null-parent count — Catalyst broadcasts the small parent
    * key sets; the fact-to-fact edge (lineitem→orders) shuffles on its
    * uniform key at scale, same as the q04 join it audits. One row per
    * relationship, so the audit composes into a scheduled freshness/
    * quality dashboard (SURVEY S13's family).
    */
  private val q110FkAudit = Q(
    "q110_fk_audit",
    (s, d) => {
      def audit(label: String, child: org.apache.spark.sql.DataFrame,
          key: String, parent: org.apache.spark.sql.DataFrame,
          pkey: String) =
        child.select(col(key))
          .join(parent.select(col(pkey)).distinct(),
            col(key) === col(pkey), "left")
          .agg(count(lit(1)).as("n_child"),
            sum(when(col(pkey).isNull, 1L).otherwise(0L)).as("n_orphans"))
          .select(lit(label).as("relationship"), col("n_child"),
            col("n_orphans"))
      audit("customer->nation", Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey")
        .unionAll(audit("events->customer", Tables.events(s, d), "user_id",
          Tables.customer(s, d), "c_custkey"))
        .unionAll(audit("lineitem->orders", Tables.lineitem(s, d),
          "l_orderkey", Tables.orders(s, d), "o_orderkey"))
        .unionAll(audit("orders->customer", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"))
        .orderBy("relationship")
    },
    Some("""SELECT 'customer->nation' AS relationship, count(*) AS n_child,
        CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_orphans
      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      UNION ALL
      SELECT 'events->customer', count(*),
        CAST(sum(CASE WHEN cu.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM events e LEFT JOIN customer cu ON e.user_id = cu.c_custkey
      UNION ALL
      SELECT 'lineitem->orders', count(*),
        CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'orders->customer', count(*),
        CAST(sum(CASE WHEN cu.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders o LEFT JOIN customer cu ON o.o_custkey = cu.c_custkey
      ORDER BY relationship"""))

  /** q119: SEQUENCE-PATTERN MATCHING (CEP-lite, the MATCH_RECOGNIZE
    * family): each user's event history becomes an ordered
    * single-char-code string and behavioral patterns are counted as
    * regex matches over it — `vc+p` (view, ≥1 clicks, purchase) and
    * `vp` (view-to-purchase direct) here. Unlike q101's fixed
    * three-stage funnel, the pattern language composes arbitrarily
    * (alternation, repetition, optionality) at zero plan cost. Plan:
    * ONE shuffle on user_id into a sort-free aggregate
    * (`array_sort(collect_list(struct))` orders each user locally —
    * no window, partial aggregation stays enabled), then the regex
    * runs map-side per user. Both engines' regex dialects agree on
    * leftmost, non-overlapping matching for this backtracking-free
    * pattern class (kept inside the RE2 ∩ java.util.regex subset, the
    * q82 discipline). At 100 TB per-user strings are bounded by
    * sessionizing first (q75) — the per-key payload is the documented
    * cost, exactly as in any MATCH_RECOGNIZE engine.
    */
  private val q119SequenceMatch = Q(
    "q119_sequence_match",
    (s, d) => {
      val seq = array_join(
        transform(
          array_sort(collect_list(struct(col("ts_us"), col("event_id"),
            col("code")))),
          x => x.getField("code")), "")
      Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), substring(col("event_type"), 1, 1).as("code"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), seq.as("seq"))
        .select(col("user_id"), col("n_events"),
          size(regexp_extract_all(col("seq"), lit("vc+p"), lit(0)))
            .cast("long").as("n_funnel_paths"),
          size(regexp_extract_all(col("seq"), lit("vp"), lit(0)))
            .cast("long").as("n_direct_paths"))
        .withColumn("converted",
          col("n_funnel_paths") + col("n_direct_paths") > 0)
        .orderBy("user_id")
    },
    Some("""WITH c AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
              substr(event_type, 1, 1) AS code FROM events),
      sq AS (SELECT user_id, count(*) AS n_events,
               string_agg(code, '' ORDER BY ts_us, event_id) AS seq
             FROM c GROUP BY 1)
      SELECT user_id, n_events,
        CAST(len(regexp_extract_all(seq, 'vc+p')) AS BIGINT) AS n_funnel_paths,
        CAST(len(regexp_extract_all(seq, 'vp')) AS BIGINT) AS n_direct_paths,
        len(regexp_extract_all(seq, 'vc+p')) + len(regexp_extract_all(seq, 'vp'))
          > 0 AS converted
      FROM sq ORDER BY user_id"""),
    bench = true)

  /** q123: the NATIVE range-join operator
    * ([[graft.plans.RangeJoin]] — logical node + strategy +
    * [[graft.plans.BroadcastRangeJoinExec]]) on q80's exact workload
    * and oracle: the second operator family taken to the
    * custom-operator ladder's rung (c) beside the as-of join
    * (q79 composed / q92 native pairing). The exec broadcasts the
    * interval side and answers each point by binary search + a
    * prefix-max-end cut — O(|P|·log |I| + output) instead of
    * BroadcastNestedLoop's O(|P|·|I|) — with NO shuffle and NO bin
    * duplication of either side (the point side stays in its scan
    * stage; the composed q80 form explodes intervals into bins and
    * exchanges both sides). The query also ASSERTS the plan shape:
    * its own executed plan must contain the custom exec node and no
    * Exchange below the aggregation.
    */
  private val q123RangeNative = Q(
    "q123_range_native",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
      val windows = ev
        .filter(col("event_type") === "error" && col("value") >= 200.0)
        .select(col("event_id").as("window_id"), col("ts_us").as("start_us"),
          (col("ts_us") + 1800000000L).as("end_us"))
      val joined = graft.plans.NativeRange.pointsInIntervals(
        ev.select(col("ts_us"), col("user_id"), col("event_type")),
        "ts_us", windows, "start_us", "end_us")
      val plan = joined.queryExecution.executedPlan.toString
      require(plan.contains("BroadcastRangeJoin"),
        s"native range join must plan the custom exec:\n$plan")
      require(!plan.contains("Exchange hashpartitioning"),
        s"neither join side may shuffle:\n$plan")
      joined
        .groupBy("window_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"))
        .orderBy("window_id")
    },
    Some(rangeJoinOracle),
    bench = true)

  /** q124: COLUMN PROFILING — the ANALYZE-TABLE statistics pass (row
    * count, null count, exact NDV, min/max per column) every
    * cost-based optimizer and data catalog runs; emitted long-form,
    * one row per profiled lineitem column. Plan: ONE scan computes
    * every measure in a single global aggregate (Catalyst plans the
    * multi-countDistinct via one Expand — |columns|× the scan rows,
    * collapsed immediately by the map-side partial), and the 1-row
    * result unpivots to the report. At 100 TB exact NDV is the
    * documented cost of catalog-grade stats; the mergeable estimate
    * path is q81's KMV seam.
    */
  private val q124Profile = Q(
    "q124_profile",
    (s, d) => {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      val aggs = cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c")))
      val one = Tables.lineitem(s, d)
        .agg(count(lit(1)).as("n_rows"), aggs: _*)
      cols.map(c => one.select(lit(c).as("column"), col("n_rows"),
          col(s"nn_$c").as("n_nulls"), col(s"ndv_$c").as("ndv"),
          col(s"min_$c").as("min_value"), col(s"max_$c").as("max_value")))
        .reduce(_ unionAll _)
        .orderBy("column")
    },
    Some {
      val rows = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount").map(c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
            CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS n_nulls,
            count(DISTINCT $c) AS ndv,
            CAST(min($c) AS DOUBLE) AS min_value,
            CAST(max($c) AS DOUBLE) AS max_value
          FROM lineitem""").mkString("\n      UNION ALL\n      ")
      s"""$rows
      ORDER BY "column""""
    })

  /** q125: CONSTRAINT VALIDATION — the dbt-style declarative test
    * suite (not_null, unique, accepted_values, relationship) evaluated
    * in one report: each check is an aggregate or anti-join counting
    * VIOLATIONS, so the whole contract of a table is one scan-bounded
    * query per check and the dashboard row is (check, n_violations,
    * passed). Complements q110 (which audits only FK edges): these are
    * the column-level invariants a curation pipeline gates a publish
    * on. Uniqueness aggregates on the key (uniform, partial-agg);
    * accepted-values and not-null die in the scan stage.
    */
  private val q125Constraints = Q(
    "q125_constraints",
    (s, d) => {
      def row(name: String, viol: org.apache.spark.sql.DataFrame) =
        viol.agg(count(lit(1)).as("n_violations"))
          .select(lit(name).as("check_name"), col("n_violations"),
            (col("n_violations") === 0L).as("passed"))
      val orders = Tables.orders(s, d)
      val notNull = row("orders.o_custkey not_null",
        orders.filter(col("o_custkey").isNull))
      val unique = row("orders.o_orderkey unique",
        orders.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1))
      val accepted = row("orders.o_orderstatus accepted_values",
        orders.filter(!col("o_orderstatus").isin("O", "F", "P")))
      val rel = row("orders.o_custkey relationship(customer)",
        orders.join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "left_anti"))
      notNull.unionAll(unique).unionAll(accepted).unionAll(rel)
        .orderBy("check_name")
    },
    Some("""SELECT 'orders.o_custkey not_null' AS check_name,
        count(*) FILTER (WHERE o_custkey IS NULL) AS n_violations,
        count(*) FILTER (WHERE o_custkey IS NULL) = 0 AS passed
      FROM orders
      UNION ALL
      SELECT 'orders.o_orderkey unique',
        (SELECT count(*) FROM (SELECT o_orderkey FROM orders
          GROUP BY 1 HAVING count(*) > 1)),
        (SELECT count(*) FROM (SELECT o_orderkey FROM orders
          GROUP BY 1 HAVING count(*) > 1)) = 0
      UNION ALL
      SELECT 'orders.o_orderstatus accepted_values',
        count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')),
        count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) = 0
      FROM orders
      UNION ALL
      SELECT 'orders.o_custkey relationship(customer)',
        (SELECT count(*) FROM orders o WHERE NOT EXISTS
          (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        (SELECT count(*) FROM orders o WHERE NOT EXISTS
          (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) = 0
      ORDER BY check_name"""))

  /** q128: SESSION-ENTRY ATTRIBUTION — the composition a product
    * pipeline runs on top of q75's sessionization: every purchase is
    * attributed to its session's ENTRY event type (the "channel" that
    * opened the 30-minute-gap session), and the report rolls up
    * sessions, purchases, and attributed revenue per entry channel.
    * Plan: ONE user_id exchange feeds everything — gap flag, session
    * cumsum, and per-session first_value share the partitioning, and
    * the per-(user, session) rollup is satisfied by it too (hash on
    * user_id clusters (user_id, sess) for free), so the windowed
    * stream collapses to session rows with no further wide exchange;
    * only the |channels|-key final rollup exchanges again. (The
    * two-consumer formulation — separate session-count and purchase
    * aggregates joined at the end — planned the whole window chain
    * TWICE; folding both measures into the per-session rollup is what
    * makes the single evaluation possible.) Orders are total
    * ((ts, event_id) everywhere) so session boundaries and entry picks
    * are engine-exact.
    */
  private val q128SessionAttribution = Q(
    "q128_session_attribution",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val base = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"), col("value"))
        .withColumn("prev", lag(col("ts_us"), 1).over(byUser))
        .withColumn("is_new",
          (col("prev").isNull || col("ts_us") - col("prev") > 1800000000L)
            .cast("long"))
        .withColumn("sess", sum(col("is_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("entry_type", first(col("event_type")).over(
          Window.partitionBy(col("user_id"), col("sess"))
            .orderBy(col("ts_us"), col("event_id"))))
      val perSession = base.groupBy("user_id", "sess")
        .agg(max(col("entry_type")).as("entry_type"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("np"),
          sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(28,6)"))).as("pv"))
      perSession.groupBy("entry_type")
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("np")).as("n_purchases"),
          coalesce(sum(col("pv")).cast("double"), lit(0.0))
            .as("attributed_value"))
        .orderBy("entry_type")
    },
    Some("""WITH l AS (SELECT user_id, epoch_us(ts) AS t, event_id, event_type,
              value,
              CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      se AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
               ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM l),
      e AS (SELECT *, first_value(event_type) OVER (PARTITION BY user_id, sess
              ORDER BY t, event_id) AS entry_type FROM se),
      ns AS (SELECT entry_type, count(*) AS n_sessions
             FROM (SELECT DISTINCT user_id, sess, entry_type FROM e)
             GROUP BY 1),
      np AS (SELECT entry_type, count(*) AS n_purchases,
               CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                 AS attributed_value
             FROM e WHERE event_type = 'purchase' GROUP BY 1)
      SELECT ns.entry_type, ns.n_sessions,
        CAST(coalesce(np.n_purchases, 0) AS BIGINT) AS n_purchases,
        coalesce(np.attributed_value, 0.0) AS attributed_value
      FROM ns LEFT JOIN np ON ns.entry_type = np.entry_type
      ORDER BY 1"""))

  /** q244: ALGEBRAIC STATS MAINTENANCE under rollup — q124's ANALYZE
    * pass made INCREMENTAL: per-shard column statistics (doc count,
    * length min/max, KMV distinct-token sketch) roll up to the table
    * total by MERGING partial states — count adds, min/max fold, and
    * the KMV total is the bottom-k union of the shard sketches (what
    * Spark's partial aggregation does under `rollup` is exactly the
    * incremental-maintenance merge a delta-batch ANALYZE performs; no
    * re-scan of old shards is ever needed). The oracle computes every
    * level directly from the data, so the merged total is PROVEN
    * equal to the recompute — the algebraic-maintenance claim, not
    * asserted but checked.
    *
    * 100 TB shape: per-shard partials are map-side; the rollup
    * exchange carries O(k) sketch state per shard, never distinct
    * values; cross-shard duplicate hashes dedupe inside the bottom-k
    * union by construction.
    */
  private val q244StatsMerge = Q(
    "q244_stats_merge",
    (s, d) => {
      import graft.functions.Portable.{h32, tokens}
      val docs = Tables.documents(s, d)
        .select(pmod(col("doc_id"), lit(4)).as("part"), col("doc_id"),
          col("n_chars"))
      val docStats = docs.rollup("part")
        .agg(count(lit(1)).as("n_docs"), min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"))
        .select(coalesce(col("part"), lit(-1L)).as("part"),
          col("n_docs"), col("min_chars"), col("max_chars"))
      val kmv = graft.functions.Kmv.sketch(128)
      val th = Tables.documents(s, d)
        .select(pmod(col("doc_id"), lit(4)).as("part"),
          explode(tokens(col("text"))).as("t"))
        .select(col("part"), h32(col("t")).as("h"))
        .distinct()
      val tokStats = th.rollup("part")
        .agg(kmv(col("h")).as("k"))
        .select(coalesce(col("part"), lit(-1L)).as("part"),
          col("k.n_min").cast("long").as("n_min"), col("k.est").as("est"))
      docStats.join(tokStats, "part").orderBy("part")
    },
    Some("""WITH p AS (SELECT doc_id % 4 AS part, n_chars, text
        FROM documents),
      lv AS (SELECT part FROM (SELECT DISTINCT part FROM p)
             UNION ALL SELECT -1),
      ds AS (SELECT l.part, CAST(count(*) AS BIGINT) AS n_docs,
          min(p.n_chars) AS min_chars, max(p.n_chars) AS max_chars
        FROM lv l JOIN p ON l.part = -1 OR l.part = p.part
        GROUP BY 1),
      th AS (SELECT DISTINCT l.part,
          CAST('0x' || substr(md5(t.t), 1, 8) AS BIGINT) AS h
        FROM lv l JOIN (SELECT part, unnest(string_split(text, ' ')) AS t
          FROM p) t ON l.part = -1 OR l.part = t.part),
      r AS (SELECT part, h, row_number() OVER (PARTITION BY part ORDER BY h)
            AS rn, count(*) OVER (PARTITION BY part) AS nd
        FROM th),
      k AS (SELECT part, CAST(max(nd) AS BIGINT) AS nd,
          max(CASE WHEN rn = LEAST(nd, 128) THEN h END) AS kth
        FROM r GROUP BY 1),
      e AS (SELECT part, CAST(LEAST(nd, 128) AS BIGINT) AS n_min,
          CAST(CASE WHEN nd < 128 THEN nd
            ELSE (127 * 4294967296) // kth END AS BIGINT) AS est
        FROM k)
      SELECT ds.part, ds.n_docs, ds.min_chars, ds.max_chars,
        e.n_min, e.est
      FROM ds JOIN e ON ds.part = e.part
      ORDER BY ds.part"""))

  /** q257: BENFORD FIRST-DIGIT AUDIT — the classic fabricated-data /
    * pipeline-bug detector over a metric column: naturally-occurring
    * multiplicative quantities follow P(d) = log10(1 + 1/d), and a
    * first-digit histogram that departs from it flags synthetic,
    * truncated, or unit-mixed data before it trains anything. The
    * first digit is extracted from the EXACT fixed-point integer
    * (floor(value·1e6), leading character of its decimal string —
    * engine-portable where floor(log10 v) is a libm boundary risk);
    * expected shares are floor((ln(1+1/d)/ln(10))·1e6) — the shared
    * libm-ln discipline.
    *
    * 100 TB shape: digit extraction is a scan-stage string op; the
    * census is one 9-key partial aggregate. Nothing else moves.
    */
  private val q257BenfordAudit = Q(
    "q257_benford_audit",
    (s, d) => {
      val digits = Tables.events(s, d)
        .select(floor(col("value") * lit(1e6)).cast("long").as("x"))
        .filter(col("x") > 0L)
        .select(expr("cast(substring(cast(x as string), 1, 1) as bigint)")
          .as("digit"))
      val hist = digits.groupBy("digit").agg(count(lit(1)).as("n_obs"))
      val tot = hist.agg(sum("n_obs").as("n_total"))
      hist.crossJoin(broadcast(tot))
        .select(col("digit"), col("n_obs"), col("n_total"),
          expr("(cast(n_obs as decimal(38,0)) * 1000000) div n_total")
            .as("obs_share_e6"),
          expr("""cast(floor(ln(1.0d + 1.0d / cast(digit as double))
            / ln(10.0d) * 1000000) as bigint)""").as("exp_share_e6"))
        .withColumn("abs_dev_e6",
          abs(col("obs_share_e6") - col("exp_share_e6")))
        .withColumn("suspicious", col("abs_dev_e6") > 50000L)
        .orderBy("digit")
    },
    Some("""WITH x AS (SELECT CAST(floor(value * 1e6) AS BIGINT) AS x
        FROM events),
      dg AS (SELECT CAST(substr(CAST(x AS VARCHAR), 1, 1) AS BIGINT)
          AS digit FROM x WHERE x > 0),
      h AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
        FROM dg GROUP BY 1),
      t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM h),
      sh AS (SELECT digit, n_obs, n_total,
          CAST((n_obs * 1000000) // n_total AS BIGINT) AS obs_share_e6,
          CAST(floor(ln(1.0 + 1.0 / CAST(digit AS DOUBLE))
            / ln(10.0) * 1000000) AS BIGINT) AS exp_share_e6
        FROM h CROSS JOIN t)
      SELECT digit, n_obs, n_total, obs_share_e6, exp_share_e6,
        abs(obs_share_e6 - exp_share_e6) AS abs_dev_e6,
        abs(obs_share_e6 - exp_share_e6) > 50000 AS suspicious
      FROM sh ORDER BY digit"""))

  /** q260: KAPLAN–MEIER CHURN SURVIVAL — the right-censored
    * time-to-churn curve behind q102's retention table: per user,
    * lifetime = last−first event in whole days; users still active
    * within 7 days of corpus end are CENSORED (churn unobserved), not
    * churned — the distinction naive retention curves get wrong. The
    * estimator runs in log space to stay engine-exact: each event
    * time contributes round₆(ln((n_risk−d)/n_risk)) — ln of an
    * exact-integer ratio — and log-survival is the DECIMAL(28,6)
    * cumulative sum of those terms (no product of floats, no exp).
    * `extinct` marks the terminal time where the risk set churns out
    * entirely (survival exactly 0 — log undefined, emitted NULL).
    *
    * 100 TB shape: one user_id exchange to lifetimes, then everything
    * runs on the distinct-lifetime panel (bounded by observed days);
    * the risk-set reverse-cumsum and log-survival cumsum are windows
    * over that panel. (Single-partition panel window: the q172/q228
    * bounded-domain precedent.)
    */
  private val q260KaplanMeier = Q(
    "q260_kaplan_meier",
    (s, d) => {
      val us = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val span = us.groupBy("user_id")
        .agg(min("us").as("first_us"), max("us").as("last_us"))
      val endRow = us.agg(max("us").as("end_us"))
      val byT = span.crossJoin(broadcast(endRow))
        .select(expr("(last_us - first_us) div 86400000000").as("t_days"),
          (col("end_us") - col("last_us") < lit(7L * 86400000000L))
            .as("censored"))
        .groupBy("t_days")
        .agg(sum(when(!col("censored"), 1L).otherwise(0L)).as("n_churn"),
          sum(when(col("censored"), 1L).otherwise(0L)).as("n_censored"))
      val wDesc = org.apache.spark.sql.expressions.Window
        .orderBy(col("t_days").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val wAsc = org.apache.spark.sql.expressions.Window
        .orderBy(col("t_days"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      byT
        .withColumn("n_risk",
          sum(col("n_churn") + col("n_censored")).over(wDesc))
        .withColumn("term",
          when(col("n_churn") < col("n_risk"),
            round(log((col("n_risk") - col("n_churn")).cast("double") /
              col("n_risk").cast("double")), 6))
            .otherwise(lit(null)))
        .withColumn("extinct", col("n_churn") >= col("n_risk"))
        .withColumn("log_s6",
          when(col("extinct"), lit(null))
            .otherwise(sum(col("term").cast("decimal(28,6)")).over(wAsc)
              .cast("double")))
        .select("t_days", "n_risk", "n_churn", "n_censored", "log_s6",
          "extinct")
        .orderBy("t_days")
    },
    Some("""WITH us AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      sp AS (SELECT user_id, min(us) AS first_us, max(us) AS last_us
        FROM us GROUP BY 1),
      e AS (SELECT max(us) AS end_us FROM us),
      lt AS (SELECT (last_us - first_us) // 86400000000 AS t_days,
          end_us - last_us < 604800000000 AS censored
        FROM sp CROSS JOIN e),
      bt AS (SELECT t_days,
          CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT)
            AS n_churn,
          CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT)
            AS n_censored
        FROM lt GROUP BY 1),
      rk AS (SELECT t_days, n_churn, n_censored,
          CAST(sum(n_churn + n_censored) OVER (ORDER BY t_days DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS n_risk
        FROM bt),
      tm AS (SELECT t_days, n_risk, n_churn, n_censored,
          CASE WHEN n_churn < n_risk THEN round(ln(
              CAST(n_risk - n_churn AS DOUBLE) / CAST(n_risk AS DOUBLE)),
              6) ELSE NULL END AS term,
          n_churn >= n_risk AS extinct
        FROM rk)
      SELECT t_days, n_risk, n_churn, n_censored,
        CASE WHEN extinct THEN NULL
          ELSE CAST(sum(CAST(term AS DECIMAL(28,6))) OVER (ORDER BY t_days
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          END AS log_s6,
        extinct
      FROM tm ORDER BY t_days"""))

  val queries: Seq[Q] =
    Seq(q80RangeJoin, q81KmvDistinct, q90HeavyHitters, q91BucketedJoin,
      q100CmsSketch, q101Funnel, q102Retention, q103PartitionPrune,
      q108ZorderLayout, q110FkAudit, q119SequenceMatch, q123RangeNative,
      q124Profile, q125Constraints, q128SessionAttribution, q244StatsMerge,
      q257BenfordAudit, q260KaplanMeier)
}
