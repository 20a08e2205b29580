package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series regularization operators over the events table — the
  * feature-engineering steps that turn an irregular event stream into
  * model-ready panels: calendar resampling with forward fill, and
  * robust (median/MAD) outlier flagging. Complements the event-
  * sequence family (q75 sessionize, q101 funnel, q102 retention,
  * q162 user sequences), which preserves irregular time; these two
  * normalize it.
  */
object Temporal {

  /** q171: DAILY RESAMPLE + FORWARD FILL per user — the panel-data
    * regularization every per-entity feature pipeline runs (metrics
    * tables, state-of-the-world-at-day-D training features): collapse
    * each user's events to one row per active day (last value wins,
    * (ts, event_id)-deterministic), densify to the user's full
    * [min_day, max_day] calendar, and carry the last observation
    * forward across the gaps. Day counts ride along so downstream can
    * distinguish "observed 0" from "filled".
    *
    * 100 TB shape: ONE exchange on user_id serves everything — the
    * per-(user, day) last-event window, the per-user span aggregate,
    * and the forward-fill window all share the user_id partitioning
    * (Catalyst reuses the exchange; the day-level window sorts within
    * it). The grid explode is bounded by span-days per user, not by
    * event volume, and `last(_, ignoreNulls)` over an ever-growing
    * frame is O(1) running state per user — no per-day re-scan.
    */
  private val q171ResampleFfill = Q(
    "q171_resample_ffill",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("ts"), col("event_id"), col("value"))
      val lastW = Window.partitionBy("user_id", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val daily = ev.withColumn("rn", row_number().over(lastW))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("n_events"),
          max(when(col("rn") === 1, col("value"))).as("v_last"))
      val grid = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
            .as("day"))
      val ffillW = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("v_last"), ignoreNulls = true).over(ffillW).as("v_ffill"))
        .orderBy("user_id", "day")
    },
    Some("""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, ts,
          event_id, value FROM events),
      rk AS (SELECT *, row_number() OVER (PARTITION BY user_id, day
          ORDER BY ts DESC, event_id DESC) AS rn FROM ev),
      daily AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events,
          max(CASE WHEN rn = 1 THEN value END) AS v_last
        FROM rk GROUP BY 1, 2),
      span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        FROM daily GROUP BY 1),
      grid AS (SELECT user_id,
          CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM span)
      SELECT g.user_id, g.day,
        COALESCE(d.n_events, 0) AS n_events,
        last_value(d.v_last IGNORE NULLS) OVER (PARTITION BY g.user_id
          ORDER BY g.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS v_ffill
      FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
      ORDER BY g.user_id, g.day"""))

  /** q172: ROBUST OUTLIER FLAGGING (median / MAD) per event_type — the
    * distribution-audit step before a metric column feeds training
    * (mean/stddev gates break under the very outliers they hunt;
    * median absolute deviation does not). Both medians are the exact
    * LOWER median — the ceil(n/2)-th smallest element under a total
    * order with (value, event_id) tie-break — so no two-value
    * averaging, no float interpolation, and both engines pick the
    * identical element. The flag predicate |v − med| > 3·MAD compares
    * doubles produced by subtraction of stored values only (no
    * accumulation), so it is engine-exact too. Output: per-type
    * median, MAD, n, n_outliers.
    *
    * 100 TB shape: two window passes, both keyed on the (bounded)
    * event_type — each is one exchange; per-group state is a sort.
    * For an unbounded group count or skewed groups the exact median
    * swaps for q133's mergeable LogDigest quantile sketch — this
    * entry is the exact companion the sketch is validated against.
    */
  private val q172MadOutliers = Q(
    "q172_mad_outliers",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"), col("event_id"),
        col("value"))
      val n = Window.partitionBy("event_type")
      val w1 = n.orderBy(col("value"), col("event_id"))
      val med = ev
        .withColumn("rn", row_number().over(w1))
        .withColumn("cnt", count(lit(1)).over(n))
        .withColumn("med",
          max(when(col("rn") === expr("(cnt + 1) div 2"), col("value"))).over(n))
      val w2 = n.orderBy(abs(col("value") - col("med")), col("event_id"))
      val mad = med
        .withColumn("ad", abs(col("value") - col("med")))
        .withColumn("rn2", row_number().over(w2))
        .withColumn("madv",
          max(when(col("rn2") === expr("(cnt + 1) div 2"), col("ad"))).over(n))
      mad.groupBy("event_type")
        .agg(count(lit(1)).as("n"), max("med").as("med"),
          max("madv").as("mad"),
          sum((col("ad") > col("madv") * 3).cast("long")).as("n_outliers"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (SELECT event_type, event_id, value FROM events),
      r1 AS (SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY value, event_id) AS rn,
          count(*) OVER (PARTITION BY event_type) AS cnt FROM ev),
      m1 AS (SELECT *, max(CASE WHEN rn = (cnt + 1) // 2 THEN value END)
          OVER (PARTITION BY event_type) AS med FROM r1),
      r2 AS (SELECT *, abs(value - med) AS ad,
          row_number() OVER (PARTITION BY event_type
            ORDER BY abs(value - med), event_id) AS rn2 FROM m1),
      m2 AS (SELECT *, max(CASE WHEN rn2 = (cnt + 1) // 2 THEN ad END)
          OVER (PARTITION BY event_type) AS madv FROM r2)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n, max(med) AS med,
        max(madv) AS mad,
        CAST(sum(CASE WHEN ad > madv * 3 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_outliers
      FROM m2 GROUP BY 1 ORDER BY 1"""))

  /** q178: MARKOV TRANSITION MATRIX over per-user event sequences —
    * the behavioral-model fit (next-action prediction features,
    * anomaly baselines, synthetic-sequence generators) built from the
    * same (ts, event_id)-ordered per-user streams as q162, but
    * reduced to the global first-order transition statistics:
    * P(to | from) as exact integer millionths `(n·1e6) DIV n_from`
    * (the q106/q113 no-float-ranking discipline).
    *
    * 100 TB shape: `lead` over the user_id window is one exchange on
    * the uniform user key with per-group state of one row; the
    * transition counts then partial-aggregate on the (from, to) key —
    * a key space bounded by |event_type|², so the second exchange
    * carries a few dozen rows per task, and the row-total join is a
    * broadcast of the |event_type|-sized marginal.
    */
  private val q178MarkovTransitions = Q(
    "q178_markov_transitions",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tr = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead("event_type", 1).over(w))
        .filter(col("to_type").isNotNull)
        .select(col("event_type").as("from_type"), col("to_type"))
      val counts = tr.groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n"))
      val marginal = counts.groupBy("from_type").agg(sum("n").as("n_from"))
      counts.join(broadcast(marginal), "from_type")
        .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
          expr("(n * 1000000) DIV n_from").as("p_e6"))
        .orderBy("from_type", "to_type")
    },
    Some("""WITH tr AS (SELECT event_type AS from_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS to_type
        FROM events),
      c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
      m AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        FROM c GROUP BY 1)
      SELECT c.from_type, c.to_type, c.n, m.n_from,
        (c.n * 1000000) // m.n_from AS p_e6
      FROM c JOIN m USING (from_type)
      ORDER BY from_type, to_type"""))

  /** q215: SEASONAL-NAIVE FORECAST BACKTEST — the baseline every
    * forecasting pipeline must beat, evaluated the way production
    * monitors do: predict each (event_type, day)'s total value as the
    * SAME weekday one week earlier, score MAE over all days that have
    * a 7-day-old counterpart. Daily totals quantize value to e6
    * fixed-point BEFORE summing (q202's rule — double sums are
    * merge-order-dependent), so actual, forecast, and every absolute
    * error are exact integers; MAE = Σ|err| div n.
    *
    * 100 TB shape: ONE exchange to the (event_type, day) panel with
    * map-side partials; the forecast attaches by a self-join of that
    * small panel co-keyed on (event_type, day−7); the scorecard is
    * |event_types| rows.
    */
  private val q215SeasonalBacktest = Q(
    "q215_seasonal_backtest",
    (s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          floor(col("value") * lit(1e6)).cast("long").as("v6"))
        .groupBy("event_type", "day").agg(sum("v6").as("actual"))
      val fc = daily.select(col("event_type"),
        date_add(col("day"), 7).as("day"), col("actual").as("forecast"))
      daily.join(fc, Seq("event_type", "day"))
        .select(col("event_type"),
          abs(col("actual") - col("forecast")).as("abs_err"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum("abs_err").as("sum_abs_err"))
        .select(col("event_type"), col("n_days"), col("sum_abs_err"),
          expr("sum_abs_err div n_days").as("mae_v6"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS actual
        FROM events GROUP BY 1, 2),
      fc AS (SELECT event_type, day + 7 AS day, actual AS forecast
        FROM daily)
      SELECT d.event_type, CAST(count(*) AS BIGINT) AS n_days,
        CAST(sum(abs(d.actual - f.forecast)) AS BIGINT) AS sum_abs_err,
        CAST(sum(abs(d.actual - f.forecast)) AS BIGINT) // count(*) AS mae_v6
      FROM daily d JOIN fc f ON d.event_type = f.event_type AND d.day = f.day
      GROUP BY 1 ORDER BY 1"""))

  /** q228: CUSUM CHANGEPOINT DETECTION — the classic one-sided
    * cumulative-sum monitor over the daily metric, in its CLOSED
    * FORM: the textbook recursion S_t = max(0, S_{t−1} + (x_t − μ −
    * slack)) looks inherently sequential, but it equals C_t − min(0, min_{i
    * ≤ t} C_i) for the plain cumulative sum C (the 0 is the implicit
    * empty-prefix C₀ — dropping it was caught by the recursion-replay spec) — so the whole monitor
    * is two windows over the day panel, no recursion, no UDF, and
    * every value is an exact integer in e6 units (μ and the slack
    * are integer divisions of exact totals). Alarm when S clears
    * μ/2 — the upward-shift detector q204/q205 (distribution drift)
    * complement for LEVEL drift.
    *
    * 100 TB shape: one exchange to the day panel with map-side
    * partials; both windows run over |days| rows.
    */
  private val q228CusumChangepoint = Q(
    "q228_cusum_changepoint",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value") * lit(1e6)).cast("long")).as("x"))
      // floorDiv, not `div`: daily sums of floor(value*1e6) can go
      // negative, where Spark `div` truncates but the oracle's `//`
      // floors (the q207 truncate-vs-floor class)
      val tot = daily.agg(sum("x").as("sx"), count(lit(1)).as("nd"))
        .select(expr(Sql.floorDiv("sx", "nd")).as("mu"))
      val wc = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.crossJoin(broadcast(tot))
        .withColumn("dev", expr(s"x - mu - ${Sql.floorDiv("mu", "20")}"))
        .withColumn("c", sum("dev").over(wc))
        .withColumn("s", col("c") - least(lit(0L), min("c").over(wc)))
        .select(col("day"), col("x").as("x_v6"), col("s").as("s_v6"),
          (col("s") > expr(Sql.floorDiv("mu", "2"))).as("alarm"))
        .orderBy("day")
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
          CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1),
      t AS (SELECT CAST(sum(x) AS BIGINT) // count(*) AS mu FROM daily),
      c AS (SELECT day, x, x - mu - (mu // 20) AS dev, mu FROM daily, t),
      cs AS (SELECT day, x, mu,
          sum(dev) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM c),
      ss AS (SELECT day, x, mu, cum,
          cum - least(0, min(cum) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
        FROM cs)
      SELECT day, x AS x_v6, CAST(s AS BIGINT) AS s_v6,
        s > mu // 2 AS alarm
      FROM ss ORDER BY day"""))

  /** q256: WATERMARK-SIZING LATENESS CENSUS — the table a streaming
    * job reads BEFORE choosing its watermark delay: per user stream
    * (event_id = ingest sequence), an event's lateness is how far the
    * per-user event-time high-watermark had already passed it on
    * arrival (`running max(us) − us`); the census reports, per event
    * type and candidate watermark {0, 1s, 10s, 60s}, how many events a
    * watermark that tight would DROP and the lost share in millionths
    * — "what delay keeps losses under 0.1%" answered from data instead
    * of folklore (q114/q135's watermark configs become measured
    * choices).
    *
    * 100 TB shape: the high-watermark is one per-user window (uniform
    * key, shared exchange); all four candidate watermarks are
    * conditional sums in ONE partial-aggregating pass (bounded
    * fan-out #16.2-2), unpivoted with `stack` at |types|×4 rows.
    */
  private val q256LatenessCensus = Q(
    "q256_lateness_census",
    (s, d) => {
      val wmW = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val late = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("late_us", max("us").over(wmW) - col("us"))
      val ws = Seq(0L, 1000000L, 10000000L, 60000000L)
      val aggCols = Seq(
        count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
        max("late_us").as("max_late_us")) ++
        ws.map(w => sum(when(col("late_us") > w, 1L).otherwise(0L))
          .as(s"lost_$w"))
      val agg = late.groupBy("event_type").agg(aggCols.head, aggCols.tail: _*)
      val stacked = ws.map(w => s"${w}L, lost_$w").mkString(", ")
      agg.select(col("event_type"), col("n_events"), col("n_late"),
          col("max_late_us"),
          expr(s"stack(${ws.length}, $stacked) AS (w_us, n_lost)"))
        .withColumn("share_lost_e6",
          expr("(cast(n_lost as decimal(38,0)) * 1000000) div n_events"))
        .select("event_type", "w_us", "n_events", "n_late", "max_late_us",
          "n_lost", "share_lost_e6")
        .orderBy("event_type", "w_us")
    },
    Some {
      val winBody = (w: Long) => s"""SELECT event_type, CAST($w AS BIGINT)
          AS w_us, n_events, n_late, max_late_us,
          lost_$w AS n_lost,
          CAST((lost_$w * 1000000) // n_events AS BIGINT) AS share_lost_e6
        FROM agg"""
      s"""WITH ev AS (SELECT user_id, event_id, event_type,
          epoch_us(ts) AS us FROM events),
      lt AS (SELECT event_type,
          max(us) OVER (PARTITION BY user_id ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - us
            AS late_us
        FROM ev),
      agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
          CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_late,
          CAST(max(late_us) AS BIGINT) AS max_late_us,
          CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS lost_0,
          CAST(sum(CASE WHEN late_us > 1000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS lost_1000000,
          CAST(sum(CASE WHEN late_us > 10000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS lost_10000000,
          CAST(sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS lost_60000000
        FROM lt GROUP BY 1)
      ${winBody(0L)} UNION ALL ${winBody(1000000L)}
      UNION ALL ${winBody(10000000L)} UNION ALL ${winBody(60000000L)}
      ORDER BY event_type, w_us"""
    },
    bench = true)

  /** q258: AUTOCORRELATION FUNCTION at lags 1–7 over the daily metric
    * panel — the seasonality detector that DECIDES q215's backtest
    * period and q228's monitoring cadence instead of assuming them: a
    * weekly cycle shows as a lag-7 peak. Deviations from the
    * floor-divided integer mean are exact longs; lag products and the
    * denominator accumulate in DECIMAL(38,0) (dv² wraps int64 at real
    * scale); r_k is one shared double division, round-6.
    *
    * 100 TB shape: the panel reduction is the only data-scale exchange
    * (map-side partials to |days| rows); the 7 lags fan out over the
    * tiny panel and join co-keyed on integer day. Missing days simply
    * drop their pairs — identically in both engines.
    */
  private val q258Acf = Q(
    "q258_acf",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("dd"))
        .agg(sum(floor(col("value") * lit(1e6)).cast("long")).as("x"))
      val mu = daily.agg(sum("x").as("sx"), count(lit(1)).as("nd"))
        .select(expr(Sql.floorDiv("sx", "nd")).as("mu"))
      val dev = daily.crossJoin(broadcast(mu))
        .select(col("dd"), (col("x") - col("mu")).as("dv"))
      val den = dev.agg(
        sum(col("dv").cast("decimal(38,0)") * col("dv")).as("ss"))
      val devB = dev.toDF("ddb", "dvb")
      val lagged = dev
        .select(col("dd"), col("dv"), explode(expr("sequence(1, 7)")).as("lag"))
        .join(devB, col("ddb") === col("dd") + col("lag"))
        .groupBy("lag")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("dv").cast("decimal(38,0)") * col("dvb")).as("sp"))
      lagged.crossJoin(broadcast(den))
        .select(col("lag").cast("long").as("lag"), col("n_pairs"),
          round(col("sp").cast("double") / col("ss").cast("double"), 6)
            .as("r6"))
        .orderBy("lag")
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS dd,
          CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1),
      m AS (SELECT CAST(sum(x) AS BIGINT) // count(*) AS mu FROM daily),
      dev AS (SELECT dd, x - mu AS dv FROM daily, m),
      den AS (SELECT CAST(sum(CAST(dv AS DECIMAL(38,0)) * dv)
          AS DECIMAL(38,0)) AS ss FROM dev),
      lg AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag),
      pr AS (SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
          CAST(sum(CAST(a.dv AS DECIMAL(38,0)) * b.dv) AS DECIMAL(38,0))
            AS sp
        FROM lg l CROSS JOIN dev a JOIN dev b ON b.dd = a.dd + l.lag
        GROUP BY 1)
      SELECT lag, n_pairs,
        round(CAST(sp AS DOUBLE) / CAST(ss AS DOUBLE), 6) AS r6
      FROM pr CROSS JOIN den ORDER BY lag"""),
    bench = true)

  /** q259: MANN–KENDALL TREND TEST — the nonparametric companion to
    * q196's OLS slope: S = Σ_{i<j} sign(x_j − x_i) over the daily
    * panel needs no distributional assumption and shrugs at the
    * outliers q172 flags. Tie-corrected variance and the ±1-continuity
    * z statistic follow the textbook closed form; S and the variance
    * numerator are exact integers/decimals, z is one shared double
    * expression.
    *
    * 100 TB shape: the all-pairs step runs on the DAY PANEL — |days|²
    * pairs is ~10⁵ rows even for a 300-year corpus — after the one
    * data-scale reduction to daily sums; the panel side broadcasts.
    */
  private val q259MannKendall = Q(
    "q259_mann_kendall",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("dd"))
        .agg(sum(floor(col("value") * lit(1e6)).cast("long")).as("x"))
      val pairs = daily.toDF("d1", "x1")
        .join(broadcast(daily.toDF("d2", "x2")), col("d1") < col("d2"))
      val sRow = pairs.agg(
        sum(when(col("x2") > col("x1"), 1L)
          .when(col("x2") < col("x1"), -1L).otherwise(0L)).as("s_stat"),
        count(lit(1)).as("n_pairs"))
      val nRow = daily.agg(count(lit(1)).as("n_days"))
      val ties = daily.groupBy("x").agg(count(lit(1)).as("t"))
        .filter(col("t") > 1L)
        .agg(coalesce(
          sum(expr("cast(t as decimal(38,0)) * (t - 1) * (2 * t + 5)")),
          expr("cast(0 as decimal(38,0))")).as("tsum"))
      sRow.crossJoin(broadcast(nRow)).crossJoin(broadcast(ties))
        .withColumn("var_num",
          expr("cast(n_days as decimal(38,0)) * (n_days - 1)" +
            " * (2 * n_days + 5) - tsum"))
        .select(col("n_days"), col("n_pairs"), col("s_stat"),
          col("var_num").cast("long").as("var_num"),
          expr("""round(CASE
            WHEN s_stat > 0 THEN (cast(s_stat as double) - 1.0d)
              / sqrt(cast(var_num as double) / 18.0d)
            WHEN s_stat < 0 THEN (cast(s_stat as double) + 1.0d)
              / sqrt(cast(var_num as double) / 18.0d)
            ELSE 0.0d END, 6)""").as("z6"))
        .withColumn("trend",
          expr("""CASE WHEN z6 > 1.959964 THEN 'increasing'
            WHEN z6 < -1.959964 THEN 'decreasing'
            ELSE 'none' END"""))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS dd,
          CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1),
      pr AS (SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
            WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
          CAST(count(*) AS BIGINT) AS n_pairs
        FROM daily a JOIN daily b ON a.dd < b.dd),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
      tt AS (SELECT CAST(coalesce(sum(CAST(t AS DECIMAL(38,0)) * (t - 1)
            * (2 * t + 5)), 0) AS DECIMAL(38,0)) AS tsum
        FROM (SELECT x, CAST(count(*) AS BIGINT) AS t FROM daily
          GROUP BY 1) g WHERE t > 1),
      v AS (SELECT s_stat, n_pairs, n_days,
          CAST(n_days AS DECIMAL(38,0)) * (n_days - 1) * (2 * n_days + 5)
            - tsum AS var_num
        FROM pr, nn, tt),
      z AS (SELECT n_days, n_pairs, s_stat,
          CAST(var_num AS BIGINT) AS var_num,
          round(CASE
            WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
              / sqrt(CAST(var_num AS DOUBLE) / 18.0)
            WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)
              / sqrt(CAST(var_num AS DOUBLE) / 18.0)
            ELSE 0.0 END, 6) AS z6
        FROM v)
      SELECT n_days, n_pairs, s_stat, var_num, z6,
        CASE WHEN z6 > 1.959964 THEN 'increasing'
          WHEN z6 < -1.959964 THEN 'decreasing'
          ELSE 'none' END AS trend
      FROM z"""))

  /** q261: BINARY-SEGMENTATION CHANGEPOINTS — the multiple-changepoint
    * extension of q228's single CUSUM monitor: level 1 splits the day
    * panel at the i maximizing the exact integer CUSUM score
    * |n·C_i − i·C_n| (the scaled "cumsum departs from the linear
    * trend" statistic, division-free so both engines agree bit-for-
    * bit); level 2 re-runs the same score inside each half. Ties break
    * to the smallest i via the (score, −i) struct-max — the argmax
    * needs no sort. Scores widen to DECIMAL(38,0) (n·C wraps int64 at
    * real scale) and are emitted as doubles.
    *
    * 100 TB shape: all segmentation runs on the |days| panel after the
    * one data-scale reduction; each level is a window cumsum + a
    * struct-max aggregate over panel rows. Recursion is unrolled to a
    * fixed depth (2 levels / ≤3 splits) — the q190 fixed-rounds rule
    * that keeps the oracle replayable.
    */
  private val q261BinarySegmentation = Q(
    "q261_binary_segmentation",
    (s, d) => {
      val wo = Window.orderBy("dd")
      val wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val p = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("dd"))
        .agg(sum(floor(col("value") * lit(1e6)).cast("long")).as("x"))
        .withColumn("i", row_number().over(wo).cast("long"))
        .withColumn("c", sum("x").over(wc))
      def argmax(scored: org.apache.spark.sql.DataFrame) =
        scored.agg(max(struct(col("score"), (-col("i")).as("ni"))).as("m"))
          .select((-col("m.ni")).as("split_i"), col("m.score").as("score"))
      def scoreIn(lo: String, hi: String, cLo: String, cHi: String) =
        expr(s"""abs(cast((($hi) - ($lo) + 1) as decimal(38,0))
          * (c - ($cLo))
          - (i - ($lo) + 1) * cast((($cHi) - ($cLo)) as decimal(38,0)))""")
      // level 1 over [1, n]
      val tot = p.agg(max(struct(col("i"), col("c"))).as("m"))
        .select(col("m.i").as("n"), col("m.c").as("cn"))
      val l1 = argmax(p.crossJoin(broadcast(tot)).filter(col("i") < col("n"))
        .withColumn("score", scoreIn("1", "n", "0", "cn")))
      // boundaries for level 2: c at t1 (prefix sum at the split)
      val t1c = p.join(broadcast(l1), col("i") === col("split_i"))
        .select(col("split_i").as("t1"), col("c").as("ct1"))
      val ctx = p.crossJoin(broadcast(tot)).crossJoin(broadcast(t1c))
      val l2a = argmax(ctx.filter(col("i") < col("t1"))
        .withColumn("score", scoreIn("1", "t1", "0", "ct1")))
      val l2b = argmax(ctx.filter(col("i") > col("t1") && col("i") < col("n"))
        .withColumn("score", scoreIn("t1 + 1", "n", "ct1", "cn")))
      def seg(level: Long, side: String, lohi: (String, String),
          am: org.apache.spark.sql.DataFrame) =
        am.crossJoin(broadcast(tot)).crossJoin(broadcast(t1c))
          .join(p.select(col("i").as("split_i"), col("dd").as("split_day")),
            "split_i")
          .select(lit(level).as("level"), lit(side).as("side"),
            expr(lohi._1).as("lo_i"), expr(lohi._2).as("hi_i"),
            col("split_i"), col("split_day"),
            col("score").cast("double").as("score"))
      seg(1L, "all", ("cast(1 as bigint)", "n"), l1)
        .unionByName(seg(2L, "left", ("cast(1 as bigint)", "t1"), l2a))
        .unionByName(seg(2L, "right", ("t1 + 1", "n"), l2b))
        .orderBy("level", "side")
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS dd,
          CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1),
      p AS (SELECT dd, x,
          CAST(row_number() OVER (ORDER BY dd) AS BIGINT) AS i,
          CAST(sum(x) OVER (ORDER BY dd
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS c
        FROM daily),
      tot AS (SELECT max(i) AS n,
          CAST(max_by(c, i) AS BIGINT) AS cn FROM p),
      s1 AS (SELECT i, dd,
          abs(CAST(n AS DECIMAL(38,0)) * c
            - i * CAST(cn AS DECIMAL(38,0))) AS score
        FROM p, tot WHERE i < n),
      l1 AS (SELECT i AS t1, dd AS d1, score AS sc1 FROM s1
        ORDER BY score DESC, i ASC LIMIT 1),
      t1c AS (SELECT l1.t1, l1.d1, l1.sc1, CAST(p.c AS BIGINT) AS ct1
        FROM l1 JOIN p ON p.i = l1.t1),
      s2a AS (SELECT i, dd,
          abs(CAST(t1 AS DECIMAL(38,0)) * c
            - i * CAST(ct1 AS DECIMAL(38,0))) AS score
        FROM p, t1c WHERE i < t1),
      l2a AS (SELECT i AS si, dd AS sd, score FROM s2a
        ORDER BY score DESC, i ASC LIMIT 1),
      s2b AS (SELECT i, dd,
          abs(CAST(n - t1 AS DECIMAL(38,0)) * (c - ct1)
            - (i - t1) * CAST(cn - ct1 AS DECIMAL(38,0))) AS score
        FROM p, tot, t1c WHERE i > t1 AND i < n),
      l2b AS (SELECT i AS si, dd AS sd, score FROM s2b
        ORDER BY score DESC, i ASC LIMIT 1)
      SELECT CAST(1 AS BIGINT) AS level, 'all' AS side,
        CAST(1 AS BIGINT) AS lo_i, n AS hi_i, t1 AS split_i, d1 AS split_day,
        CAST(sc1 AS DOUBLE) AS score
      FROM tot, t1c
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'left', CAST(1 AS BIGINT), t1, si, sd,
        CAST(score AS DOUBLE)
      FROM t1c, l2a
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'right', t1 + 1, n, si, sd,
        CAST(score AS DOUBLE)
      FROM tot, t1c, l2b
      ORDER BY level, side"""))

  val queries: Seq[Q] = Seq(q171ResampleFfill, q172MadOutliers,
    q178MarkovTransitions, q215SeasonalBacktest, q228CusumChangepoint,
    q256LatenessCensus, q258Acf, q259MannKendall, q261BinarySegmentation)
}
