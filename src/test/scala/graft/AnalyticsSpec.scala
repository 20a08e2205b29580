package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Invariant and differential checks for the analytics/curation
  * additions (q99–q107) beyond their DuckDB oracles: the oracle pins
  * exact values at one data set, these pin the ALGEBRAIC properties
  * that must hold on any input (sketch overestimation, SCD2 interval
  * chaining, linkage recall, funnel monotonicity).
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    Registry.byName(name).fn(spark, dir)

  // ---- q100: count-min sketch ---------------------------------------------

  test("q100: CMS never undercounts and matches the naive grid") {
    val rows = run("q100_cms_sketch").collect()
    assert(rows.nonEmpty)
    // upper-bound property: est >= exact for every probed token
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS undercounted ${r.getString(0)}: $est < $exact")
      assert(r.getLong(3) === est - exact)
    }
    // differential: the distributed grid equals a single-threaded CMS
    // built from the same tokens with the same Kirsch–Mitzenmacher
    // hashes (h_i = h1 + i·h2 over the two 32-bit halves of one md5
    // digest — the q100 construction)
    def km(w: String): IndexedSeq[Int] = {
      val dg = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      def half(off: Int) = java.lang.Long.parseLong(
        dg.slice(off, off + 4).map(b => f"$b%02x").mkString, 16)
      val (h1, h2) = (half(0), half(4))
      (0 until 4).map(i => ((h1 + i * h2) % 16).toInt)
    }
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .collect().map(_.getString(0))
    val grid = Array.fill(4, 16)(0L)
    toks.foreach { w =>
      val bs = km(w)
      for (i <- 0 until 4) grid(i)(bs(i)) += 1
    }
    val exactCnt = toks.groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    rows.foreach { r =>
      val w = r.getString(0)
      val bs = km(w)
      val naiveEst = (0 until 4).map(i => grid(i)(bs(i))).min
      assert(r.getLong(2) === naiveEst, s"grid mismatch for $w")
      assert(r.getLong(1) === exactCnt(w))
    }
  }

  // ---- q99: SCD Type-2 ----------------------------------------------------

  test("q99: versions chain into gapless intervals with one open end") {
    val rows = run("q99_scd2_history").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions are 1..n with no gaps
      assert(sorted.map(_._2).toSeq === (1L to sorted.length.toLong),
        s"user $user has version gaps")
      // consecutive intervals chain exactly and states actually change
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $user: interval gap at v${a._2}")
          assert(a._3 !== b._3, s"user $user: no-op version v${b._2}")
        case _ => ()
      }
      // exactly the last version is open/current
      assert(sorted.init.forall(_._5.isDefined) && sorted.last._5.isEmpty,
        s"user $user: open-interval invariant broken")
    }
  }

  test("q99: as-of probe of the history equals the raw event stream") {
    val hist = run("q99_scd2_history").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    val ups = Tables.events(spark, dir)
      .filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // at every upsert's own timestamp, the newest open version must
    // carry that upsert's state (last write wins within (t, event_id))
    val byUserHist = hist.groupBy(_._1)
    ups.groupBy(_._1).foreach { case (user, evs) =>
      val lastState = evs.maxBy(e => (e._3, e._4))
      val histLast = byUserHist(user).maxBy(_._3)
      assert(histLast._2 === lastState._2,
        s"user $user: history tail ${histLast._2} != stream tail ${lastState._2}")
    }
  }

  // ---- q104: fuzzy linkage ------------------------------------------------

  test("q104: every planted corruption links to its source at distance 1") {
    val got = run("q104_fuzzy_linkage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val regIds = Tables.documents(spark, dir)
      .filter(col("doc_id") % 13 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(regIds.nonEmpty)
    val self = got.filter(p => p._1 == p._2).map(p => p._1 -> p._3).toMap
    regIds.foreach { id =>
      assert(self.get(id).contains(1L), s"reg $id missing its dist-1 source")
    }
  }

  test("q104: blocked join equals the naive block-filtered cross product") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect()
      .map { r =>
        val title = r.getString(2).split(" ").take(6).mkString(" ")
        (r.getLong(0), r.getString(1), title.split(" ").head, title)
      }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      (rid, rl, rb, rt) <- docs if rid % 13 == 0
      q = rt.dropRight(1)
      (cid, cl, cb, ct) <- docs
      if rl == cl && rb == cb && lev(q, ct) <= 4
    } yield (rid, cid, lev(q, ct).toLong)).toSet
    val got = run("q104_fuzzy_linkage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  // ---- q101: funnel -------------------------------------------------------

  test("q101: funnel stages are monotonically non-increasing") {
    val r = run("q101_funnel").head()
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel not monotone: $v, $c, $p")
    assert(v > 0)
  }
  test("q244: rolled-up totals equal the merge laws and the direct recompute") {
    val rows = run("q244_stats_merge").collect()
      .map(r => r.getAs[Long]("part") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("min_chars"),
          r.getAs[Long]("max_chars"), r.getAs[Long]("est"))).toMap
    assert(rows.size === 5, "4 shards + the total row")
    val parts = rows.filter(_._1 >= 0)
    val total = rows(-1L)
    assert(total._1 === parts.values.map(_._1).sum, "count merge")
    assert(total._2 === parts.values.map(_._2).min, "min merge")
    assert(total._3 === parts.values.map(_._3).max, "max merge")
    // the merged KMV must equal the sketch computed over everything
    val exact = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .select(graft.functions.Portable.h32(col("t")).as("h"))
      .distinct().collect().map(_.getLong(0)).sorted
    val est =
      if (exact.length < 128) exact.length.toLong
      else 127L * 4294967296L / exact(127)
    assert(total._4 === est,
      "merged sketch must equal the direct whole-table sketch")
  }

  test("q257: Benford expectations are the canonical constants") {
    val rows = run("q257_benford_audit").collect()
    assert(rows.nonEmpty)
    // floor(log10(1 + 1/d) * 1e6), d = 1..9
    val benford = Map(1L -> 301029L, 2L -> 176091L, 3L -> 124938L,
      4L -> 96910L, 5L -> 79181L, 6L -> 66946L, 7L -> 57991L,
      8L -> 51152L, 9L -> 45757L)
    val n = rows.head.getAs[Long]("n_total")
    rows.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(d >= 1L && d <= 9L)
      assert(r.getAs[Long]("exp_share_e6") === benford(d),
        s"digit $d expectation")
      assert(r.getAs[Long]("obs_share_e6") ===
        r.getAs[Long]("n_obs") * 1000000L / n, s"digit $d share")
      assert(r.getAs[Boolean]("suspicious") ===
        (r.getAs[Long]("abs_dev_e6") > 50000L))
    }
    assert(rows.map(_.getAs[Long]("n_obs")).sum === n,
      "digit census must total the positive values")
  }

  test("q260: risk sets telescope and survival is non-increasing") {
    val rows = run("q260_kaplan_meier").collect()
      .sortBy(_.getAs[Long]("t_days"))
    assert(rows.nonEmpty)
    // reverse-cumsum identity: risk at t = everyone with lifetime >= t
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_risk") === b.getAs[Long]("n_risk") +
          a.getAs[Long]("n_churn") + a.getAs[Long]("n_censored"),
          "risk set must telescope")
      case _ =>
    }
    val users = Tables.events(spark, dir).select("user_id")
      .distinct().count()
    assert(rows.head.getAs[Long]("n_risk") === users,
      "every user starts at risk")
    // log-survival never increases; extinct only at the end
    val logs = rows.filter(!_.isNullAt(4)).map(_.getAs[Double]("log_s6"))
    logs.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9, "survival must not rise")
      case _ =>
    }
    rows.dropRight(1).foreach(r =>
      assert(!r.getAs[Boolean]("extinct"), "extinct only at terminal time"))
  }
}
