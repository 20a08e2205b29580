package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Invariants of the time-series entries (q171/q172) and the held-out
  * trigram LM (q174) and governance audit (q173) beyond their DuckDB
  * oracles.
  */
class TemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = Registry.byName(name).fn(spark, dir)

  test("q171: grids are contiguous, fully filled, and conserve event counts") {
    val out = run("q171_resample_ffill")
    assert(out.filter(col("v_ffill").isNull).isEmpty,
      "first grid day is always observed, so forward fill leaves no nulls")
    val spans = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("day").as("d0"), max("day").as("d1"),
        sum("n_events").as("tot"))
      .withColumn("span", datediff(col("d1"), col("d0")) + 1)
    assert(spans.filter(col("n") =!= col("span")).isEmpty,
      "one row per calendar day between first and last activity")
    val perUser = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("raw"))
    assert(spans.join(perUser, "user_id")
      .filter(col("tot") =!= col("raw")).isEmpty,
      "resampling must conserve per-user event counts")
  }

  test("q172: medians are group members and outliers are a strict subset") {
    val rows = run("q172_mad_outliers").collect()
    assert(rows.nonEmpty)
    val byType = Tables.events(spark, dir).select("event_type", "value")
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)))
    rows.foreach { r =>
      val (et, n, med, mad, out) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      val vs = byType(et)
      assert(n == vs.length)
      assert(vs.contains(med), "lower median must be an actual group element")
      assert(mad >= 0.0)
      assert(out == vs.count(v => math.abs(v - med) > mad * 3),
        "flag count must match the 3-MAD rule recomputed driver-side")
    }
  }

  test("q173: classes partition the table and gates match thresholds") {
    val out = run("q173_k_anonymity")
    val total = Tables.events(spark, dir).count()
    assert(out.agg(sum("n_rows")).head.getLong(0) == total,
      "quasi-identifier classes must partition the event table")
    assert(out.filter(col("n_users") > col("n_rows")).isEmpty)
    assert(out.filter(col("k_anon") =!= (col("n_rows") >= 5)).isEmpty)
    assert(out.filter(col("l_div") =!= (col("n_users") >= 3)).isEmpty)
  }

  test("q178: transition mass conserves and marginals sum") {
    val out = run("q178_markov_transitions")
    assert(out.filter(col("p_e6") > 1000000L).isEmpty,
      "integer-millionth probabilities cannot exceed 1")
    val marg = out.groupBy("from_type")
      .agg(sum("n").as("s"), max("n_from").as("nf"))
    assert(marg.filter(col("s") =!= col("nf")).isEmpty,
      "per-from transition counts must sum to the marginal")
    val ev = Tables.events(spark, dir)
    val expectedTransitions = ev.count() -
      ev.select("user_id").distinct().count()
    assert(out.agg(sum("n")).head.getLong(0) == expectedTransitions,
      "each user contributes exactly n_events - 1 transitions")
  }

  test("q179: pair set matches q23 candidates; estimates stay in range") {
    val out = run("q179_minhash_estimate")
    assert(out.count() > 0)
    assert(out.filter(col("n_match") < 0 || col("n_match") > 8).isEmpty)
    assert(out.filter(col("jac_e6") > 1000000L || col("jac_e6") < 0).isEmpty)
    assert(out.filter(col("n_inter") > col("n_union")).isEmpty)
    val q23 = run("q23_minhash_lsh").select("a_id", "b_id")
    val mine = out.select("a_id", "b_id")
    assert(mine.exceptAll(q23).isEmpty && q23.exceptAll(mine).isEmpty,
      "audit must cover exactly the LSH candidate pairs")
  }

  test("q180: surrogates are collision-free and conserve the table") {
    val out = run("q180_pseudonymize")
    assert(out.filter(col("n_source_ids") =!= 1L).isEmpty,
      "a surrogate collision would merge two users' histories")
    assert(out.agg(sum("n_events")).head.getLong(0) ==
      Tables.events(spark, dir).count())
    assert(out.count() ==
      Tables.events(spark, dir).select("user_id").distinct().count())
  }

  test("q174: held-out docs only, probabilities below one, OOV bounded") {
    val out = run("q174_trigram_backoff")
    assert(out.count() > 0)
    assert(out.filter(col("doc_id") % 10 < 8).isEmpty,
      "training-split docs must not be scored")
    assert(out.filter(col("n_oov") > col("n_tri")).isEmpty)
    assert(out.filter(col("lp") > 0.0).isEmpty,
      "stupid-backoff scores are log-probabilities of p <= 1")
    assert(out.filter(col("n_oov") === col("n_tri") && col("lp").isNotNull)
      .isEmpty, "all-OOV docs must yield NULL lp (empty sum), as in q93")
  }
  test("q215: seasonal-naive backtest matches a driver recompute") {
    val rows = run("q215_seasonal_backtest").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("sum_abs_err"),
          r.getAs[Long]("mae_v6"))).toMap
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") * lit(1e6)).cast("long").as("v6"))
      .groupBy("event_type", "day").agg(sum("v6").as("a"))
      .collect().map(r => ((r.getString(0), r.getDate(1).toLocalDate),
        r.getLong(2))).toMap
    for ((et, (nDays, sumErr, mae)) <- rows) {
      val errs = daily.collect {
        case ((e, day), a) if e == et && daily.contains((e, day.minusDays(7))) =>
          math.abs(a - daily((e, day.minusDays(7))))
      }
      assert(errs.size.toLong === nDays, s"$et day count")
      assert(errs.sum === sumErr, s"$et error sum")
      assert(mae === errs.sum / errs.size, s"$et MAE")
    }
  }

  test("q228: prefix-min closed form equals the textbook CUSUM recursion") {
    val rows = run("q228_cusum_changepoint").collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * lit(1e6)).cast("long")).as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val mu = daily.map(_._2).sum / daily.length
    val slack = mu / 20
    var s = 0L
    val want = daily.map { case (_, x) =>
      s = math.max(0L, s + (x - mu - slack)); s
    }
    val got = rows.sortBy(_.getAs[java.sql.Date]("day").toLocalDate.toEpochDay)
      .map(_.getAs[Long]("s_v6")).toSeq
    assert(got === want.toSeq,
      "window closed form must replay the sequential recursion exactly")
    rows.foreach(r => assert(r.getAs[Long]("s_v6") >= 0L))
  }

  test("q256: losses shrink as the watermark widens; census conserves") {
    val rows = run("q256_lateness_census").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, g) =>
      val byW = g.sortBy(_.getAs[Long]("w_us"))
      assert(byW.map(_.getAs[Long]("w_us")).toSeq ===
        Seq(0L, 1000000L, 10000000L, 60000000L))
      // a wider watermark can only lose fewer events
      byW.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("n_lost") <= a.getAs[Long]("n_lost"),
            s"$t: losses must be non-increasing in the watermark")
        case _ =>
      }
      // watermark 0 drops exactly the late events
      assert(byW.head.getAs[Long]("n_lost") ===
        byW.head.getAs[Long]("n_late"), s"$t: w=0 loses the late set")
      byW.foreach { r =>
        val (n, lost) = (r.getAs[Long]("n_events"), r.getAs[Long]("n_lost"))
        assert(r.getAs[Long]("n_late") <= n)
        assert(r.getAs[Long]("share_lost_e6") === lost * 1000000L / n,
          s"$t: share derivation")
      }
    }
    // each watermark's rows partition the event stream by type
    val perW = rows.filter(_.getAs[Long]("w_us") == 0L)
      .map(_.getAs[Long]("n_events")).sum
    assert(perW === Tables.events(spark, dir).count())
  }

  test("q258: autocorrelations obey Cauchy–Schwarz and pair bounds") {
    val rows = run("q258_acf").collect().sortBy(_.getAs[Long]("lag"))
    assert(rows.nonEmpty)
    val nDays = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000")).distinct().count()
    rows.foreach { r =>
      val lag = r.getAs[Long]("lag")
      assert(lag >= 1L && lag <= 7L)
      assert(math.abs(r.getAs[Double]("r6")) <= 1.0 + 1e-9,
        s"lag $lag: |r| must not exceed 1")
      assert(r.getAs[Long]("n_pairs") <= nDays - lag,
        s"lag $lag: pair count bound")
    }
  }

  test("q259: Mann–Kendall pins its own closed forms") {
    val r = run("q259_mann_kendall").head()
    val n = r.getAs[Long]("n_days")
    assert(r.getAs[Long]("n_pairs") === n * (n - 1) / 2,
      "every ordered day pair appears once")
    assert(math.abs(r.getAs[Long]("s_stat")) <= r.getAs[Long]("n_pairs"))
    // no ties expected among v6 daily sums → textbook variance
    assert(r.getAs[Long]("var_num") === n * (n - 1) * (2 * n + 5),
      "variance numerator without ties")
    val z = r.getAs[Double]("z6")
    val expected = if (z > 1.959964) "increasing"
      else if (z < -1.959964) "decreasing" else "none"
    assert(r.getAs[String]("trend") === expected)
  }

  test("q261: splits nest and level 1 replays driver-side") {
    val rows = run("q261_binary_segmentation").collect()
      .map(r => r.getAs[String]("side") -> r).toMap
    val all = rows("all")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("split_i") >= r.getAs[Long]("lo_i"))
      assert(r.getAs[Long]("split_i") < r.getAs[Long]("hi_i"))
    }
    val t1 = all.getAs[Long]("split_i")
    rows.get("left").foreach { l =>
      assert(l.getAs[Long]("lo_i") === 1L && l.getAs[Long]("hi_i") === t1)
    }
    rows.get("right").foreach { r =>
      assert(r.getAs[Long]("lo_i") === t1 + 1 &&
        r.getAs[Long]("hi_i") === all.getAs[Long]("hi_i"))
    }
    // driver-side replay of the level-1 argmax from the raw panel
    val xs = Tables.events(spark, dir)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("dd"))
      .agg(sum(floor(col("value") * lit(1e6)).cast("long")).as("x"))
      .orderBy("dd").collect().map(_.getAs[Long]("x"))
    val cum = xs.scanLeft(0L)(_ + _).tail
    val n = xs.length.toLong
    val scores = (1 until xs.length).map(i =>
      (BigInt(n) * cum(i - 1) - BigInt(i) * cum.last).abs)
    val best = scores.max
    val bestI = scores.indexOf(best) + 1
    assert(t1 === bestI.toLong, "level-1 split must be the CUSUM argmax")
    assert(all.getAs[Double]("score") === best.toDouble)
  }
}
