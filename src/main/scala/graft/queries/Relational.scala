package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Portable._

/** Core relational operators from SURVEY.md §2 (aggregations, joins,
  * filters, windows, top-k, set ops, scalar functions), expressed over
  * the driver's synthetic tables with DuckDB oracles.
  *
  * Design rules (scale notes inline per query):
  *  - aggregate sums go through exact decimals (Portable.dsum*) so the
  *    result is independent of partial-aggregation order — this is also
  *    what makes the plans safe to scale: partial/final hash aggregation
  *    stays enabled, no single-partition tricks needed;
  *  - every LIMIT has a total-order tiebreaker, so TakeOrderedAndProject
  *    selects the same rows on 32 or 32,000 partitions;
  *  - joins keep their natural shuffle keys; dimension sides small
  *    enough to broadcast are hinted with broadcast().
  */
object Relational {

  /** A2 (dbutil.py:179-186): per-year conditional-sum histogram — the
    * pubmed_year_counts matview shape. Partial+final hash agg; no skew
    * (years ~uniform); scales linearly with input.
    */
  private val q01YearHist = Q(
    "q01_year_hist",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.filter(year(col("o_orderdate")) >= 1995)
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("o_totalprice") > 300000, 1L).otherwise(0L)).as("n_big"),
          round(count(lit(1)) * davg(col("o_totalprice")), 0).as("est_value"))
        .orderBy("o_year")
    },
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      count(*) AS n_orders,
      CAST(sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      round(count(*) * (CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / count(*)), 0) AS est_value
      FROM orders WHERE year(o_orderdate) >= 1995 GROUP BY 1 ORDER BY 1"""),
    bench = true)

  /** A1 (dbutil.py:188): global filtered count — the pubmed_rct_count
    * matview. Map-side partial count, single final row.
    */
  private val q02MetaCount = Q(
    "q02_meta_count",
    (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 100000)
        .agg(count(lit(1)).as("n_rct")),
    Some("""SELECT count(*) AS n_rct FROM orders
      WHERE o_orderstatus = 'O' AND o_totalprice > 100000"""))

  /** O1 (cnxapp.py:216-219): ranked search results — computed score,
    * ORDER BY DESC NULLS LAST LIMIT 250. Spark plans
    * TakeOrderedAndProject: per-partition top-k + driver merge, no full
    * sort, no shuffle of the full table — the 100TB-safe top-k.
    */
  private val q03TopkScore = Q(
    "q03_topk_score",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2).as("score"))
        .orderBy(col("score").desc_nulls_last, col("l_orderkey"), col("l_linenumber"))
        .limit(250),
    Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      round(l_extendedprice * (1 - l_discount), 2) AS score
      FROM lineitem
      ORDER BY score DESC NULLS LAST, l_orderkey, l_linenumber LIMIT 250"""),
    bench = true)

  /** J1 (cnxapp.py:210-214): the central fact⋈fact equi-join with flag
    * filters, then aggregate. Filters are pushed below the join into the
    * parquet scans; the join shuffles on the key both sides (sort-merge),
    * which partitions correctly at any scale.
    */
  private val q04SearchJoin = Q(
    "q04_search_join",
    (s, d) => {
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      val l = Tables.lineitem(s, d).filter(col("l_quantity") >= 25)
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("revenue"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_items,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F' AND l_quantity >= 25
      GROUP BY 1 ORDER BY 1"""),
    bench = true)

  /** J2 (upw.py:20-49): small-dimension lookup join — explicitly
    * broadcast so the fact side never shuffles (hash join, map-side).
    */
  private val q05BroadcastJoin = Q(
    "q05_broadcast_join",
    (s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("revenue"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand, count(*) AS n_items,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1 ORDER BY 1"""),
    bench = true)

  /** P8/U3 (pubmed.py:447-452, mendeley.py:86): skip-list anti-filter —
    * the "todo = all − done" pattern as a left anti join.
    */
  private val q06AntiJoin = Q(
    "q06_anti_join",
    (s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d).select(col("l_orderkey")).distinct()
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus FROM orders
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      ORDER BY o_orderkey"""))

  /** P9 (pubmed.py:492-504): last-wins dedupe per key via row_number
    * window — the reference's reverse-iterate loop, distributed. The
    * window shuffles once on the key; count(*) over the same partition
    * reuses that exchange.
    */
  private val q07LastWins = Q(
    "q07_last_wins",
    (s, d) => {
      val e = Tables.events(s, d)
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val wAll = Window.partitionBy(col("user_id"))
      e.withColumn("rn", row_number().over(wOrd))
        .withColumn("n_events", count(lit(1)).over(wAll))
        .filter(col("rn") === 1)
        .select(
          col("user_id"),
          col("event_type").as("last_type"),
          col("value").as("last_value"),
          col("n_events"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, last_type, last_value, n_events FROM (
        SELECT user_id, event_type AS last_type, value AS last_value,
          count(*) OVER (PARTITION BY user_id) AS n_events,
          row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1 ORDER BY user_id"""),
    bench = true)

  /** U1 (cnxapp.py:221-311): heterogeneous arm union with article_type
    * tags — three schema-aligned projections unioned by name.
    */
  private val q08UnionArms = Q(
    "q08_union_arms",
    (s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey").cast("long").as("id"), col("c_name").as("name"),
          lit("customer").as("arm"))
      val p = Tables.supplier(s, d)
        .select(col("s_suppkey").cast("long").as("id"), col("s_name").as("name"),
          lit("supplier").as("arm"))
      val n = Tables.nation(s, d)
        .select(col("n_nationkey").cast("long").as("id"), col("n_name").as("name"),
          lit("nation").as("arm"))
      c.unionByName(p).unionByName(n).orderBy("arm", "id")
    },
    Some("""SELECT * FROM (
        SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name, 'customer' AS arm FROM customer
        UNION ALL
        SELECT CAST(s_suppkey AS BIGINT), s_name, 'supplier' FROM supplier
        UNION ALL
        SELECT CAST(n_nationkey AS BIGINT), n_name, 'nation' FROM nation) t
      ORDER BY arm, id"""))

  /** P3/P4 (cnxapp.py:187-207): the picosearch containment predicate —
    * AND across terms, OR within a term's expansion, over token arrays.
    * array_contains is codegen'd; the whole predicate runs inside the
    * scan's WholeStageCodegen span.
    */
  private val q09Containment = Q(
    "q09_containment",
    (s, d) => {
      val doc = Tables.documents(s, d)
      val toks = tokens(col("text"))
      doc.filter(
          (array_contains(toks, "spark") || array_contains(toks, "hash")) &&
          (array_contains(toks, "merge") || array_contains(toks, "join")))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang, source, n_chars FROM documents
      WHERE (list_contains(string_split(text, ' '), 'spark')
          OR list_contains(string_split(text, ' '), 'hash'))
        AND (list_contains(string_split(text, ' '), 'merge')
          OR list_contains(string_split(text, ' '), 'join'))
      ORDER BY doc_id"""))

  /** §2.5: grouped top-k via rank window (reference hand-rolls this as
    * ORDER BY + LIMIT per group; we use one windowed shuffle).
    */
  private val q10GroupTopk = Q(
    "q10_group_topk",
    (s, d) => {
      val o = Tables.orders(s, d)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          CAST(row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** O3/S13 (dbutil.py:252-264): latest-row pick — ORDER BY DESC LIMIT 1
    * (status page / update_log recency).
    */
  private val q11LatestUpdate = Q(
    "q11_latest_update",
    (s, d) =>
      Tables.events(s, d)
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(1)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us")),
    Some("""SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
      ORDER BY ts DESC, event_id DESC LIMIT 1"""))

  /** O2/A3 (cnxapp.py:74-104): autocomplete — prefix filter over a term
    * table, count-ranked top 5.
    */
  private val q12Autocomplete = Q(
    "q12_autocomplete",
    (s, d) =>
      Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("term"))
        .filter(col("term").startsWith("s"))
        .groupBy("term")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term"))
        .limit(5),
    Some("""SELECT term, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
      WHERE term LIKE 's%' GROUP BY 1 ORDER BY n DESC, term LIMIT 5"""))

  /** F6 (ictrp.py:31-52): regex extraction — registry-id-style digit
    * extraction from a JSON-ish props string, aggregated.
    */
  private val q13RegexExtract = Q(
    "q13_regex_extract",
    (s, d) =>
      Tables.events(s, d)
        .select(regexp_extract(col("props"), "[0-9]+", 0).cast("long").as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"))
        .orderBy("k"),
    Some("""SELECT CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k,
      count(*) AS n FROM events GROUP BY 1 ORDER BY 1"""))

  /** F9/F10 (ictrp_csv.py:73-92, pmreader.py:143-156): date-part
    * extraction and per-day aggregation over the event stream.
    */
  private val q14DateParts = Q(
    "q14_date_parts",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          // NB: no round(_, scale>0) on aggregates — DuckDB rounds doubles
          // via a 10^s multiply (inexact), Spark via exact decimal
          // expansion; the raw double division of identical inputs is
          // bit-identical in both engines.
          davg(col("value")).as("avg_value"))
        .orderBy("day", "event_type"),
    Some("""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n,
      CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
    bench = true)

  /** P6/P7 (pubmed.py:348-389): calibration thresholding — model chosen
    * by a trust gate, per-model thresholds produce 3 boolean flags.
    * Pure column expressions from (broadcastable) config.
    */
  private val q15ThresholdFlags = Q(
    "q15_threshold_flags",
    (s, d) => {
      val l = Tables.lineitem(s, d)
      val model = when(col("l_returnflag") === "R", "ptyp").otherwise("plain")
      val tPrecise = when(col("l_returnflag") === "R", 48.0).otherwise(45.0)
      val tBalanced = when(col("l_returnflag") === "R", 30.0).otherwise(28.0)
      val tSensitive = when(col("l_returnflag") === "R", 15.0).otherwise(12.0)
      l.select(
          model.as("model"),
          (col("l_quantity") >= tPrecise).as("is_precise"),
          (col("l_quantity") >= tBalanced).as("is_balanced"),
          (col("l_quantity") >= tSensitive).as("is_sensitive"))
        .groupBy("model", "is_precise", "is_balanced", "is_sensitive")
        .agg(count(lit(1)).as("n"))
        .orderBy("model", "is_precise", "is_balanced", "is_sensitive")
    },
    Some("""SELECT CASE WHEN l_returnflag = 'R' THEN 'ptyp' ELSE 'plain' END AS model,
      l_quantity >= (CASE WHEN l_returnflag = 'R' THEN 48.0 ELSE 45.0 END) AS is_precise,
      l_quantity >= (CASE WHEN l_returnflag = 'R' THEN 30.0 ELSE 28.0 END) AS is_balanced,
      l_quantity >= (CASE WHEN l_returnflag = 'R' THEN 15.0 ELSE 12.0 END) AS is_sensitive,
      count(*) AS n
      FROM lineitem GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4"""))

  /** P10 (pubmed.py:611-613): sanity guards — out-of-range values nulled
    * before aggregation, null-aware counts.
    */
  private val q16NullGuards = Q(
    "q16_null_guards",
    (s, d) => {
      val o = Tables.orders(s, d)
      val guarded = when(col("o_totalprice") <= 490000, col("o_totalprice"))
      o.groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          count(guarded).as("n_ok"),
          dsum(guarded).as("s_ok"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, count(*) AS n,
      count(CASE WHEN o_totalprice <= 490000 THEN 1 END) AS n_ok,
      CAST(sum(CASE WHEN o_totalprice <= 490000
        THEN CAST(o_totalprice AS DECIMAL(28,2)) END) AS DOUBLE) AS s_ok
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** U3 (mendeley.py:86): set difference — keys with status-O orders
    * minus keys with status-F orders (EXCEPT ≡ distinct + anti join).
    */
  private val q17SetDiff = Q(
    "q17_set_diff",
    (s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.except(b).orderBy("o_custkey")
    },
    Some("""SELECT o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t
      ORDER BY o_custkey"""))

  /** A5 (minimap.py:204-217, ictrp_csv.py:269): distinct-set semantics —
    * exact distinct counts per group (partial aggregation still applies
    * via Spark's two-phase distinct-agg planning).
    */
  private val q18DistinctAgg = Q(
    "q18_distinct_agg",
    (s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          countDistinct(col("c_mktsegment")).as("n_segments"),
          count(lit(1)).as("n_customers"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name, count(DISTINCT c_mktsegment) AS n_segments,
      count(*) AS n_customers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1 ORDER BY 1"""))

  /** F15 (ictrp.py:156-159): text cleanup — lowercase, strip
    * non-alphanumerics, collapse spaces, tokenize, count.
    */
  private val q19StringClean = Q(
    "q19_string_clean",
    (s, d) =>
      Tables.part(s, d)
        .select(explode(split(trim(regexp_replace(lower(col("p_type")), "[^a-z0-9]+", " ")), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy("token"),
    Some("""SELECT token, count(*) AS n FROM (
        SELECT unnest(string_split(trim(regexp_replace(lower(p_type), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
        FROM part) t
      GROUP BY 1 ORDER BY 1"""))

  /** Flagship (cnxapp.py:168-324): picosearch-shaped three-stage query —
    * term containment (AND of ORs), score ordering with NULLS LAST,
    * LIMIT 250 per arm, tagged union. This is also SparkEntry.entry.
    */
  private val q20PicoFlagship = Q(
    "q20_pico_flagship",
    (s, d) => {
      val doc = Tables.documents(s, d)
      val toks = tokens(col("text"))
      val docArm = doc
        .filter(
          (array_contains(toks, "spark") || array_contains(toks, "query")) &&
          array_contains(toks, "join"))
        .select(
          col("doc_id").cast("long").as("id"),
          col("n_chars").cast("long").as("score"),
          lit("document").as("article_type"))
        .orderBy(col("score").desc_nulls_last, col("id"))
        .limit(250)
      val partArm = Tables.part(s, d)
        .filter(lower(col("p_type")).contains("economy"))
        .select(
          col("p_partkey").cast("long").as("id"),
          round(col("p_retailprice"), 0).cast("long").as("score"),
          lit("part").as("article_type"))
        .orderBy(col("score").desc_nulls_last, col("id"))
        .limit(250)
      docArm.unionByName(partArm).orderBy("article_type", "id")
    },
    Some("""SELECT * FROM (
        SELECT * FROM (
          SELECT CAST(doc_id AS BIGINT) AS id, CAST(n_chars AS BIGINT) AS score,
            'document' AS article_type
          FROM documents
          WHERE (list_contains(string_split(text, ' '), 'spark')
              OR list_contains(string_split(text, ' '), 'query'))
            AND list_contains(string_split(text, ' '), 'join')
          ORDER BY score DESC NULLS LAST, id LIMIT 250) a
        UNION ALL
        SELECT * FROM (
          SELECT CAST(p_partkey AS BIGINT) AS id,
            CAST(round(p_retailprice, 0) AS BIGINT) AS score, 'part' AS article_type
          FROM part
          WHERE lower(p_type) LIKE '%economy%'
          ORDER BY score DESC NULLS LAST, id LIMIT 250) b) t
      ORDER BY article_type, id"""),
    bench = true)

  /** q75: gap-based SESSIONIZATION of the event stream (30-minute
    * gap) — the batch closed form from [[graft.stream.Sessionize]]:
    * lag/cumsum windows + aggregation, all on one user_id
    * partitioning (a single exchange feeds both window passes and the
    * partial aggregation). StreamSessionSpec pins the incremental
    * `flatMapGroupsWithState` operator to this same closed form.
    */
  private val q75Sessionize = Q(
    "q75_sessionize",
    (s, d) => graft.stream.Sessionize.batch(Tables.events(s, d), 1800000000L),
    Some("""WITH l AS (SELECT user_id, ts, value,
        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
          OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
        THEN 1 ELSE 0 END AS is_new FROM events),
      s AS (SELECT user_id, ts, value,
        CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id FROM l)
      SELECT user_id, sess_id, min(ts) AS session_start, max(ts) AS session_end,
        count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
      FROM s GROUP BY 1, 2 ORDER BY 1, 2"""),
    bench = true)

  /** q79: backward AS-OF JOIN — each purchase event picks up the most
    * recent preceding-or-equal click of the same user (the operator
    * Spark lacks natively; [[graft.ops.AsOf]] implements it as a
    * tagged UNION + one window pass per user — single shuffle of
    * |L|+|R| rows, no range-join row blowup). The oracle is DuckDB's
    * NATIVE `ASOF LEFT JOIN`, with right-side ts ties pre-collapsed to
    * the max event id (the operator's documented tie rule), so our
    * window formulation is checked against an independent first-class
    * implementation of the same semantics.
    */
  private val q79AsofJoin = Q(
    "q79_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("value").as("click_value"))
      graft.ops.AsOf
        .backward(purchases, clicks, "user_id", "ts", "purchase_id", "event_id",
          Seq("ts", "click_value"))
        .select(col("purchase_id"), col("user_id"),
          col("asof_event_id").as("click_id"), col("asof_click_value").as("click_value"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
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
      ORDER BY purchase_id"""),
    bench = true)

  /** q92: the same backward as-of join through the NATIVE Catalyst
    * operator ([[graft.plans.AsOfJoin]]: logical node + planner
    * strategy + merge-join physical operator) instead of the q79
    * union+window composition. Same oracle as q79 — DuckDB's native
    * `ASOF LEFT JOIN` — so the custom operator is checked against an
    * independent first-class implementation, through the driver gate.
    *
    * What the native exchange shape buys at 100 TB: each side shuffles
    * separately on its own key with NO row widening (the composed form
    * pushes every left row through the exchange carrying the right
    * payload's null columns and vice versa), the per-partition merge
    * holds O(1) state (vs the window's buffered frame), and a side
    * that is already bucketed by key shuffles not at all.
    */
  private val q92AsofNative = Q(
    "q92_asof_native",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("value").as("click_value"))
      graft.plans.NativeAsOf
        .backward(purchases, clicks, "user_id", "ts", "event_id",
          Seq("ts", "click_value"))
        .select(col("purchase_id"), col("user_id"),
          col("asof_event_id").as("click_id"), col("asof_click_value").as("click_value"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
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
      ORDER BY purchase_id"""),
    bench = true)

  /** q105: ROLLUP / grouping-sets report — the multi-level revenue
    * summary (per (returnflag, linestatus), per returnflag, grand
    * total) computed in ONE pass: Catalyst plans rollup as an Expand
    * (each input row fans out to its 3 grouping sets) feeding the same
    * partial+final hash aggregate as a flat groupBy, so the three
    * levels cost one shuffle instead of three queries — the Expand
    * multiplies rows BEFORE the map-side combine, which collapses them
    * to |groups|·3 immediately. GROUPING() flags disambiguate the
    * NULL-as-ALL supergroup rows; sums go through exact decimals and
    * the sort key coalesces the supergroup NULLs so row order is
    * engine-independent.
    *
    * Oracle caveat (caught by the sf1 probe, where the grand total
    * first needs 17 significant digits): DuckDB's decimal→double cast
    * is not correctly rounded on the GROUPING-SETS path — supergroup
    * rows came back 1 ULP off the exact decimal while Spark's
    * BigDecimal.doubleValue() was correct on every row. The oracle
    * routes the final conversion through VARCHAR (strtod IS correctly
    * rounded), which keeps the driver's typed hash exact at any scale.
    * See the same note on [[graft.functions.Portable.dsum6]].
    */
  private val q105Rollup = Q(
    "q105_rollup",
    (s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"))
        .orderBy(col("g_flag"), col("g_status"),
          coalesce(col("l_returnflag"), lit("")),
          coalesce(col("l_linestatus"), lit("")))
    },
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_items,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS VARCHAR)
          AS DOUBLE) AS sum_qty,
        CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY g_flag, g_status,
        coalesce(l_returnflag, ''), coalesce(l_linestatus, '')"""))

  /** q115: SIX-TABLE STAR JOIN (the TPC-H Q5 shape) — local-supplier
    * revenue per nation inside one region: lineitem ⋈ orders ⋈
    * customer ⋈ supplier ⋈ nation ⋈ region, with the
    * customer-and-supplier-share-a-nation predicate and a date range.
    * The plan this must produce at 100 TB: region→nation prune first
    * (broadcast), customer and supplier reduce to broadcast key maps,
    * and the only real shuffles are the two fact joins
    * (lineitem⋈orders on orderkey — q91's bucketed layout removes
    * even that one). Catalyst's join reorder + AQE get exactly that
    * from the declarative form; the date filter pushes into the
    * orders scan. Revenue goes through exact decimals.
    */
  private val q115StarJoin = Q(
    "q115_star_join",
    (s, d) => {
      val nations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= "1996-01-01" &&
              col("o_orderdate") < "1998-01-01"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n.n_name, count(*) AS n_items,
        CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount)
          AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND c.c_nationkey = s.s_nationkey
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1 ORDER BY revenue DESC, n_name"""),
    bench = true)

  /** q121: JSON column processing — the reference keeps whole records
    * in jsonb and queries into them (SURVEY §1.2); here the events
    * table's `props` JSON is parsed ONCE per row into a typed struct
    * (`from_json` with an explicit schema — codegen'd, no UDF; the
    * stringly `get_json_object` path would re-parse per extraction)
    * and the extracted field drives bucketing and aggregation. At
    * 100 TB the parse is scan-stage work that pipelines into the
    * partial aggregate; the real lesson is the SILVER-layer rule:
    * parse jsonb once into typed columns at ingest, exactly what this
    * projection does.
    */
  private val q121JsonExtract = Q(
    "q121_json_extract",
    (s, d) => {
      val k = from_json(col("props"), lit("k BIGINT")).getField("k")
      Tables.events(s, d)
        .select(col("event_type"), col("value"), k.as("k"))
        .groupBy(expr("k DIV 10").as("k_bucket"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("event_type")).as("n_types"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          dsum6(col("value")).as("sum_value"))
        .orderBy("k_bucket")
    },
    Some("""SELECT (CAST(json_extract_string(props, '$.k') AS BIGINT)
            - (CAST(json_extract_string(props, '$.k') AS BIGINT) % 10)) // 10
          AS k_bucket,
        count(*) AS n, count(DISTINCT event_type) AS n_types,
        min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** q122: PIVOT / UNPIVOT round trip — per-user event counts widen to
    * one column per event type (`groupBy.pivot` with the value list
    * EXPLICIT, so the plan is a single pass with no distinct-values
    * pre-query and the output schema is deterministic), then melt back
    * to long form via `unpivot` and aggregate — proving the reshape
    * loses nothing. The oracle computes the long-form result straight
    * from the raw events, so any pivot/unpivot asymmetry (dropped
    * zero rows, column-order dependence) would break the hash. Pivot
    * at scale is the same single shuffle as the flat groupBy (the
    * type dimension is bounded); zero-count cells materialize as 0s
    * and unpivot back out, which is why the oracle's count filters
    * them.
    */
  private val q122PivotUnpivot = Q(
    "q122_pivot_unpivot",
    (s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
      wide
        .unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "n")
        .filter(col("n") > 0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"),
          max(col("n")).as("max_per_user"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
        count(*) AS n_events,
        CAST(max(c) AS BIGINT) AS max_per_user
      FROM (SELECT event_type, user_id, count(*) OVER
              (PARTITION BY event_type, user_id) AS c FROM events)
      GROUP BY 1 ORDER BY 1"""))

  /** q144: BLOOM SEMI-JOIN REDUCTION — the runtime-filter pattern for a
    * selective fact⋈dim join once the dim slice has outgrown a
    * broadcast-hash build: build a Bloom filter over the dim side's
    * join keys (~10 bits/key at 1% fpp vs ~100 bytes/key for a hash
    * build side — the q86 argument), probe it INSIDE the fact scan
    * stage ([[graft.functions.BloomMightContain]], codegen'd), and
    * only then pay the shuffle join. With 0.8% dim selectivity the
    * exchange moves ~1% of lineitem instead of all of it; false
    * positives only cost shuffle bytes — the exact join behind the
    * probe keeps the result exact, so the oracle is the plain join.
    * The join is pinned to shuffle-merge because that is the regime
    * the operator exists for (a broadcastable dim needs no bloom);
    * BloomSemiJoinSpec asserts the probe sits below the exchange.
    * Spark's own `runtime.bloomFilter` rule is the same idea applied
    * opportunistically; the explicit form keys off semantic knowledge
    * (status+date slice) rather than cost estimates, and the build is
    * one partial-aggregated job over the already-filtered dim.
    * Scale bound: bloom bits grow linearly in dim keys (1.2 MB per
    * million at 1% fpp) — past plan-shippable size the q86
    * bloom-on-hash + exact confirm anti-join shape takes over.
    */
  private val q144BloomSemiJoin = Q(
    "q144_bloom_semi_join",
    (s, d) => {
      val dim = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F" &&
          col("o_orderdate") >= "1997-01-01" &&
          col("o_orderdate") < "1997-03-01")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val nKeys = dim.count() // bounded: the 2-month F-status slice
      val bf = dim.stat.bloomFilter("o_orderkey", math.max(nKeys, 1L), 0.01)
      Tables.lineitem(s, d)
        .filter(graft.functions.Bloom.mightContainCol(col("l_orderkey"), bf))
        .join(dim.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_items,
        CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND o.o_orderdate >= TIMESTAMP '1997-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-03-01'
      GROUP BY 1 ORDER BY 1"""),
    bench = true)

  /** q151: q10's ranked per-group retrieval through the NATIVE
    * [[graft.plans.TopKPerGroup]] operator instead of the window —
    * same rows, same ranks, same oracle, different machine: the window
    * form exchanges EVERY order row and fully sorts each customer's
    * group to discard all but 3; the native operator's partial pass
    * caps the exchange at 3 rows per customer per input partition
    * (bounded heaps, no sort of the input at all) and the final pass
    * re-selects and ranks. One hash exchange either way — the
    * difference is what rides it and the absence of the N·log N sort.
    * NativeTopKSpec pins native ≡ window on real tables and random
    * inputs, and pins the plan (Partial+Final, no Window node).
    */
  private val q151TopkNative = Q(
    "q151_topk_native",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      graft.plans.NativeTopK.topK(o, Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), 3, "rn")
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          CAST(row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn"""),
    bench = true)

  val queries: Seq[Q] = Seq(
    q01YearHist, q02MetaCount, q03TopkScore, q04SearchJoin, q05BroadcastJoin,
    q06AntiJoin, q07LastWins, q08UnionArms, q09Containment, q10GroupTopk,
    q11LatestUpdate, q12Autocomplete, q13RegexExtract, q14DateParts,
    q15ThresholdFlags, q16NullGuards, q17SetDiff, q18DistinctAgg,
    q19StringClean, q20PicoFlagship, q75Sessionize, q79AsofJoin,
    q92AsofNative, q105Rollup, q115StarJoin, q121JsonExtract,
    q122PivotUnpivot, q144BloomSemiJoin, q151TopkNative)
}
