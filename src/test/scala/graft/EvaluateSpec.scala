package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Driver-side recomputation pins for the Evaluate family (q195–q199):
  * each distributed histogram/moment formulation must equal the naive
  * all-rows definition computed in plain Scala on the sf0.001 slice,
  * plus the analytic range laws (AUC∈[0,1], KL≥0, KS∈[0,1],
  * assortativity∈[−1,1]).
  */
class EvaluateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = Registry.byName(name).fn(spark, dir)

  test("q195: histogram rank-sum AUC equals the naive pairwise AUC") {
    val row = run("q195_auc_rank").collect().head
    val docs = Tables.documents(spark, dir)
      .select(col("n_chars"), (col("lang") === "en").as("pos"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val ps = docs.filter(_._2).map(_._1)
    val ns = docs.filterNot(_._2).map(_._1)
    // naive O(n_pos·n_neg): wins + half-ties, doubled to stay integer
    val u2 = (for (p <- ps; n <- ns) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(row.getAs[Long]("n_pos") === ps.length.toLong)
    assert(row.getAs[Long]("n_neg") === ns.length.toLong)
    assert(row.getAs[Double]("u2") === u2.toDouble)
    val auc = row.getAs[Double]("auc6")
    assert(auc >= 0.0 && auc <= 1.0)
    assert(math.abs(auc - u2.toDouble / (2.0 * ps.length * ns.length)) < 1e-6)
  }

  test("q196: closed-form slope/intercept equal naive least squares") {
    val rows = run("q196_ols_trend").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("slope6"), r.getAs[Double]("intercept6"))).toMap
    val pts = Tables.documents(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("double"),
        col("n_chars").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    for ((src, g) <- pts.groupBy(_._1) if g.length >= 2) {
      val n = g.length.toDouble
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxy = g.map(p => p._2 * p._3).sum
      val sxx = g.map(p => p._2 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      val (s6, i6) = rows(src)
      assert(math.abs(s6 - slope) < 1e-4, s"slope mismatch for $src")
      assert(math.abs(i6 - icept) < 1e-3, s"intercept mismatch for $src")
    }
  }

  test("q197: per-source KL vs corpus is nonnegative (Gibbs) and matches naive") {
    val rows = run("q197_kl_divergence").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("kl_nats")).toMap
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val global = toks.groupBy(_._2).map { case (t, xs) => t -> xs.length }
    val tot = toks.length.toDouble
    for ((src, xs) <- toks.groupBy(_._1)) {
      val ts = xs.length.toDouble
      val naive = xs.groupBy(_._2).map { case (t, g) =>
        val p = g.length / ts
        val q = global(t) / tot
        BigDecimal(p * math.log(p / q)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val got = rows(src)
      assert(got >= -1e-6, s"KL must be nonnegative for $src, got $got")
      assert(math.abs(got - naive.toDouble) < 1e-4, s"KL mismatch for $src")
    }
  }

  test("q198: histogram KS equals the brute-force ECDF sweep") {
    val row = run("q198_ks_test").collect().head
    val vs = Tables.documents(spark, dir)
      .filter(col("lang").isin("en", "de"))
      .select(col("lang"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val as = vs.filter(_._1 == "en").map(_._2).sorted
    val bs = vs.filter(_._1 == "de").map(_._2).sorted
    val grid = (as ++ bs).distinct.sorted
    val d = grid.map { x =>
      math.abs(as.count(_ <= x).toDouble / as.length -
        bs.count(_ <= x).toDouble / bs.length)
    }.max
    assert(row.getAs[Long]("n_a") === as.length.toLong)
    assert(row.getAs[Long]("n_b") === bs.length.toLong)
    val ks = row.getAs[Double]("ks6")
    assert(ks >= 0.0 && ks <= 1.0)
    assert(math.abs(ks - d) < 1e-6, s"KS mismatch: got $ks want $d")
  }

  test("q200: count-of-counts Gini equals the naive sorted-rank form") {
    val row = run("q200_gini_tokens").collect().head
    val counts = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("f"))
      .collect().map(_.getLong(1)).sorted
    val n = counts.length.toDouble
    val tot = counts.sum.toDouble
    val srw = counts.zipWithIndex.map { case (x, i) => (i + 1) * x.toDouble }.sum
    val gini = 2.0 * srw / (n * tot) - (n + 1) / n
    assert(row.getAs[Long]("n_types") === counts.length.toLong)
    assert(row.getAs[Long]("n_tokens") === counts.sum)
    val got = row.getAs[Double]("gini6")
    assert(got >= 0.0 && got < 1.0)
    assert(math.abs(got - gini) < 1e-6, s"gini mismatch: got $got want $gini")
  }

  test("q201: Good–Turing adjusted counts satisfy the r* identity") {
    val rows = run("q201_good_turing").collect()
    assert(rows.length === 10, "the 10 smallest frequencies must be present")
    val hist = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("f"))
      .groupBy("f").agg(count(lit(1)).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tt = hist.map { case (f, m) => f * m }.sum
    rows.foreach { r =>
      val (rr, nr) = (r.getAs[Long]("r"), r.getAs[Long]("n_r"))
      assert(hist(rr) === nr)
      val want = (rr + 1) * hist.getOrElse(rr + 1, 0L) * 1000000L / nr
      assert(r.getAs[Long]("rstar_e6") === want, s"r*=$rr")
      assert(r.getAs[Long]("share_e6") === nr * 1000000L / tt)
    }
  }

  test("q202: CUPED theta equals naive covariance ratio; reduction is rho^2 in [0,1]") {
    val row = run("q202_cuped").collect().head
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * lit(1e6)).cast("long").as("v6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cut = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val per = ev.groupBy(_._1).map { case (_, xs) =>
      (xs.filter(_._2 < cut).map(_._3).sum.toDouble,
        xs.filter(_._2 >= cut).map(_._3).sum.toDouble)
    }.toSeq
    val n = per.length.toDouble
    val sx = per.map(_._1).sum; val sy = per.map(_._2).sum
    val sxy = per.map(p => p._1 * p._2).sum
    val sxx = per.map(p => p._1 * p._1).sum
    val syy = per.map(p => p._2 * p._2).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val rho2 = math.pow(n * sxy - sx * sy, 2) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(row.getAs[Long]("n_users") === per.length.toLong)
    assert(math.abs(row.getAs[Double]("theta6") - theta) < 1e-4)
    val vr = row.getAs[Double]("var_reduction6")
    assert(vr >= 0.0 && vr <= 1.0)
    assert(math.abs(vr - rho2) < 1e-4)
  }

  test("q203: duplication matrix conserves q23's pair set") {
    val matrix = run("q203_dup_matrix").collect()
    val pairs = run("q23_minhash_lsh").count()
    assert(matrix.map(_.getAs[Long]("n_pairs")).sum === pairs,
      "matrix cells must partition the LSH candidate pairs")
    matrix.foreach { r =>
      assert(r.getAs[String]("src_lo") <= r.getAs[String]("src_hi"),
        "matrix must be symmetric-upper")
    }
  }

  test("q204: PSI terms are individually nonnegative and conserve event counts") {
    val rows = run("q204_psi_drift").collect()
    // (p−q)·ln(p/q) ≥ 0 for every bin — sign(p−q) = sign(ln(p/q))
    rows.foreach { r =>
      assert(r.getAs[Double]("term6") >= -1e-9,
        s"PSI term negative at bin ${r.getAs[Long]("bin")}")
    }
    val total = rows.map(r =>
      r.getAs[Long]("c_pre") + r.getAs[Long]("c_post")).sum
    assert(total === Tables.events(spark, dir).count(),
      "pre+post bin counts must partition the events")
  }

  test("q206: NDCG is the DCG/IDCG ratio and IDCG dominates DCG") {
    val row = run("q206_ndcg").collect().head
    val (dcg, idcg, ndcg) = (row.getAs[Double]("dcg6"),
      row.getAs[Double]("idcg6"), row.getAs[Double]("ndcg6"))
    assert(idcg >= dcg, "ideal ranking must dominate the actual ranking")
    assert(ndcg >= 0.0 && ndcg <= 1.0)
    assert(math.abs(ndcg - dcg / idcg) < 1e-6)
    // driver recompute of IDCG from planted relevances over all docs
    val rels = Tables.documents(spark, dir)
      .select(col("doc_id"),
        (graft.functions.Portable.h32(
          concat(lit("rel:"), col("doc_id").cast("string"))) % 4).as("rel"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, rel) => (-rel, id) }.take(10)
    val idcgNaive = rels.zipWithIndex.map { case ((_, rel), i) =>
      BigDecimal(((1L << rel.toInt) - 1).toDouble /
        (math.log(i + 2.0) / math.log(2.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(math.abs(idcg - idcgNaive) < 1e-6, s"IDCG: got $idcg want $idcgNaive")
  }

  test("q207: calibration bins conserve docs and bound their rates") {
    val rows = run("q207_calibration").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === Tables.documents(spark, dir).count())
    rows.foreach { r =>
      val (n, p, e6) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos"),
        r.getAs[Long]("pos_e6"))
      assert(p >= 0 && p <= n)
      assert(e6 === p * 1000000L / n, "pos_e6 must be the exact floor ratio")
    }
  }

  test("q208: greedy k-center trajectory equals the naive driver replay") {
    val rows = run("q208_kcenter_coreset").collect()
      .map(r => (r.getAs[Long]("sel_order"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("d2_at_pick"))).sortBy(_._1)
    assert(rows.length === 8)
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * lit(1e6)).cast("long")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var picks = Seq(vecs.keys.min)
    var dmin = vecs.map { case (id, v) => id -> d2(v, vecs(picks.head)) }
    for (_ <- 1 to 7) {
      val cand = dmin.filterNot { case (id, _) => picks.contains(id) }
      val next = cand.toSeq.sortBy { case (id, dd) => (-dd, id) }.head._1
      picks = picks :+ next
      dmin = dmin.map { case (id, dd) =>
        id -> math.min(dd, d2(vecs(id), vecs(next))) }
    }
    assert(rows.map(_._2).toSeq === picks,
      "distributed trajectory must equal the naive greedy replay")
  }

  test("q209: bootstrap replicate means bracket the true mean") {
    val rows = run("q209_bootstrap").collect()
    assert(rows.length === 16)
    val docs = Tables.documents(spark, dir).select("n_chars")
      .collect().map(_.getLong(0))
    val trueMean = docs.sum.toDouble / docs.length
    val means = rows.map(_.getAs[Long]("mean_e6").toDouble / 1e6)
    // Poisson(1) weights have mean 1: every replicate's effective n is
    // within ±35% of n, and the replicate means straddle the truth
    rows.foreach { r =>
      val ne = r.getAs[Long]("n_eff").toDouble
      assert(ne > docs.length * 0.65 && ne < docs.length * 1.35,
        s"replicate ${r.getAs[Int]("b")} n_eff=$ne vs n=${docs.length}")
    }
    assert(means.min <= trueMean && trueMean <= means.max,
      s"true mean $trueMean outside replicate range [${means.min}, ${means.max}]")
  }

  test("q210: purity equals the contingency recompute; NMI bounded") {
    val row = run("q210_cluster_purity").collect().head
    val e = Tables.embeddings(spark, dir)
    val ct = graft.search.Ivf.assignments(e,
        graft.search.Ivf.adaptiveMod(e.count()))
      .join(e.select(col("vec_id"), col("label")), "vec_id")
      .groupBy("cell", "label").count()
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2)))
    val n = ct.map(_._2).sum
    val sumMax = ct.groupBy(_._1._1).map(_._2.map(_._2).max).sum
    assert(row.getAs[Long]("n_vecs") === n)
    assert(row.getAs[Long]("purity_e6") === sumMax * 1000000L / n)
    val nmi = row.getAs[Double]("nmi6")
    assert(nmi >= 0.0 && nmi <= 1.0 + 1e-9, s"NMI out of range: $nmi")
    assert(row.getAs[Double]("mi6") >= -1e-6, "MI must be nonnegative")
  }

  test("q211: sweep counts are monotone in the threshold and conserve labels") {
    val rows = run("q211_threshold_sweep").collect()
      .sortBy(_.getAs[Long]("thr"))
    assert(rows.length === 5)
    val nPos = rows.head.getAs[Long]("tp") + rows.head.getAs[Long]("fn")
    rows.foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") === nPos)
      val f1 = r.getAs[Long]("f1_e6")
      assert(f1 >= 0L && f1 <= 1000000L)
    }
    val tps = rows.map(_.getAs[Long]("tp"))
    assert(tps.zip(tps.tail).forall { case (a, b) => a >= b },
      "raising the threshold cannot admit more true positives")
    val tns = rows.map(_.getAs[Long]("tn"))
    assert(tns.zip(tns.tail).forall { case (a, b) => a <= b },
      "raising the threshold cannot lose true negatives")
  }

  test("q212: water-filling exhausts the budget with a uniform cap") {
    val rows = run("q212_water_filling").collect()
    val budget = rows.head.getAs[Long]("budget")
    val allocated = rows.map(_.getAs[Long]("allocated")).sum
    assert(allocated <= budget, s"allocation $allocated exceeds budget $budget")
    val capped = rows.filter(_.getAs[Boolean]("capped"))
    capped.foreach(r =>
      assert(r.getAs[Long]("allocated") === capped.head.getAs[Long]("allocated"),
        "every capped source must share one level"))
    rows.filterNot(_.getAs[Boolean]("capped")).foreach(r =>
      assert(r.getAs[Long]("allocated") === r.getAs[Long]("t_s"),
        "uncapped sources keep everything"))
    if (capped.nonEmpty)
      assert(budget - allocated < capped.length.toLong,
        "raising the cap by 1 token must overshoot — else the level is not maximal")
  }

  test("q213: containment is bounded by set sizes and matches a naive pair") {
    val rows = run("q213_containment_confirm").collect()
    assert(rows.nonEmpty, "the LSH candidates must produce confirm rows")
    rows.foreach { r =>
      val (ni, na, nb) = (r.getAs[Long]("n_int"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(ni <= math.min(na, nb), "intersection cannot exceed either set")
      assert(r.getAs[Long]("cont_ab_e6") === ni * 1000000L / na)
      assert(r.getAs[Long]("cont_ba_e6") === ni * 1000000L / nb)
    }
    // naive recompute of the first pair's intersection from shingle sets
    val first = rows.head
    val sh = Tables.documents(spark, dir)
      .filter(size(split(col("text"), " ")) >= 4)
      .select(col("doc_id"),
        explode(graft.functions.Hash32.shingleHashes(col("text"))).as("h"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val (a, b) = (first.getAs[Long]("a_id"), first.getAs[Long]("b_id"))
    assert(first.getAs[Long]("n_int") === (sh(a) & sh(b)).size.toLong)
  }

  test("q216: frontier equals the naive all-pairs skyline") {
    val rows = run("q216_pareto_frontier").collect()
      .map(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("margin"),
        r.getAs[Long]("doc_id"))).sortBy(_._1)
    val toks = split(col("text"), " ")
    val weight = (t: org.apache.spark.sql.Column) =>
      pmod(graft.functions.Portable.h32(concat(lit("w:"),
        pmod(graft.functions.Portable.h32(t), lit(4096L)).cast("string"))),
        lit(2001L)) - lit(1000L)
    val pts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        aggregate(toks, lit(0L), (acc, t) => acc + weight(t)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // naive skyline: (x, ymax-at-x) pairs where no smaller x does >= as well
    val byX = pts.groupBy(_._2).map { case (x, g) =>
      val ymax = g.map(_._3).max
      (x, ymax, g.filter(_._3 == ymax).map(_._1).min)
    }.toSeq.sortBy(_._1)
    val naive = byX.filter { case (x, y, _) =>
      !byX.exists { case (x2, y2, _) => x2 < x && y2 >= y } }
    assert(rows.toSeq === naive,
      "histogram-sweep frontier must equal the all-pairs skyline")
    // frontier margins strictly increase with length
    rows.sliding(2).foreach {
      case Array((_, y1, _), (_, y2, _)) => assert(y2 > y1)
      case _ =>
    }
  }

  test("q217: SPRT trajectory cumulates exactly and decisions match walls") {
    val rows = run("q217_sprt_trajectory").collect()
    assert(rows.nonEmpty)
    var cum = BigDecimal(0)
    rows.foreach { r =>
      cum += BigDecimal(r.getAs[Double]("llr_day6"))
      assert(math.abs(cum.toDouble - r.getAs[Double]("cum_llr6")) < 1e-9,
        s"cumulative drift at ${r.getAs[java.sql.Date]("day")}")
      val want =
        if (r.getAs[Double]("cum_llr6") >= math.log(19.0)) "accept_h1"
        else if (r.getAs[Double]("cum_llr6") <= -math.log(19.0)) "accept_h0"
        else "continue"
      assert(r.getAs[String]("decision") === want)
    }
  }

  test("q218: per-slice AUC equals naive pairwise AUC within each slice") {
    val rows = run("q218_sliced_auc").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          r.getAs[Double]("auc6"))).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"), (col("lang") === "en").as("pos"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    for ((src, g) <- docs.groupBy(_._1)) {
      val ps = g.filter(_._3).map(_._2)
      val ns = g.filterNot(_._3).map(_._2)
      if (ps.nonEmpty && ns.nonEmpty) {
        val u2 = (for (p <- ps; n <- ns) yield
          if (p > n) 2L else if (p == n) 1L else 0L).sum
        val (np, nn, auc) = rows(src)
        assert(np === ps.length.toLong && nn === ns.length.toLong)
        assert(math.abs(auc - u2.toDouble / (2.0 * ps.length * ns.length)) < 1e-6,
          s"slice $src AUC mismatch")
      } else assert(!rows.contains(src),
        s"single-class slice $src must be excluded, not scored")
    }
  }

  test("q219: interval-arithmetic trimmed mean equals the naive sorted trim") {
    val rows = run("q219_trimmed_mean").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("k_trim"),
          r.getAs[Long]("trimmed_mean_e6"))).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    for ((src, g) <- docs.groupBy(_._1)) {
      val sorted = g.map(_._2).sorted
      val k = sorted.length * 5 / 100
      val kept = sorted.slice(k, sorted.length - k)
      val want = kept.sum * 1000000L / kept.length
      val (n, kt, mean) = rows(src)
      assert(n === sorted.length.toLong && kt === k.toLong)
      assert(mean === want, s"trimmed mean mismatch for $src")
    }
  }

  test("q220: preference pairs are true per-group extrema with the gap floor") {
    val rows = run("q220_preference_pairs").collect()
    assert(rows.nonEmpty)
    val toks = split(col("text"), " ")
    val weight = (t: org.apache.spark.sql.Column) =>
      pmod(graft.functions.Portable.h32(concat(lit("w:"),
        pmod(graft.functions.Portable.h32(t), lit(4096L)).cast("string"))),
        lit(2001L)) - lit(1000L)
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        aggregate(toks, lit(0L), (acc, t) => acc + weight(t)).as("m"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = scored.groupBy(_._2)
    rows.foreach { r =>
      val g = bySrc(r.getAs[String]("source"))
      val (mhi, mlo) = (g.map(_._3).max, g.map(_._3).min)
      assert(r.getAs[Long]("chosen_m") === mhi)
      assert(r.getAs[Long]("rejected_m") === mlo)
      assert(r.getAs[Long]("gap") === mhi - mlo && mhi - mlo >= 500)
      assert(r.getAs[Long]("chosen_id") ===
        g.filter(_._3 == mhi).map(_._1).min)
      assert(r.getAs[Long]("rejected_id") ===
        g.filter(_._3 == mlo).map(_._1).min)
    }
  }

  test("q221: ladder levels nest — class floor grows, violations shrink") {
    val rows = run("q221_generalization_ladder").collect()
      .sortBy(_.getAs[Int]("level"))
    assert(rows.length === 3)
    rows.sliding(2).foreach {
      case Array(fine, coarse) =>
        assert(coarse.getAs[Long]("n_classes") <= fine.getAs[Long]("n_classes"),
          "coarsening cannot create classes")
        assert(coarse.getAs[Long]("min_class") >= fine.getAs[Long]("min_class"),
          "every coarse class contains a fine class, so the floor can only rise")
        assert(coarse.getAs[Long]("n_violating_rows") <=
          fine.getAs[Long]("n_violating_rows"),
          "coarsening can only absolve re-identifiable rows")
      case _ =>
    }
  }

  test("q222: persisted-index probe equals the in-memory expression path") {
    val roundtrip = run("q222_index_roundtrip")
    val e = Tables.embeddings(spark, dir)
    val direct = graft.search.Ivf.search(spark, e, queryId = 0L,
      centroidMod = graft.search.Ivf.adaptiveMod(e.count()),
      nprobe = 4, k = 10)
    assert(roundtrip.exceptAll(direct).isEmpty &&
      direct.exceptAll(roundtrip).isEmpty,
      "serving from parquet tables must reproduce the expression path")
  }

  test("q225: Apriori pairs satisfy support laws and match a naive recount") {
    val rows = run("q225_frequent_pairs").collect()
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ts"))
      .collect().map(r => r.getSeq[String](1).toSet)
    // sf0.001 has 50 docs; the floor of 40 still yields pairs because
    // the synthetic vocabulary is tiny and dense
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("a"), r.getAs[String]("b"))
      assert(a < b, "pairs must be canonically ordered")
      val support = docs.count(s => s.contains(a) && s.contains(b)).toLong
      assert(r.getAs[Long]("support") === support, s"support of ($a,$b)")
      assert(support >= 40L)
      assert(r.getAs[Long]("support") <= math.min(
        r.getAs[Long]("df_a"), r.getAs[Long]("df_b")),
        "pair support cannot exceed either singleton df")
    }
  }

  test("q226: required n shrinks quadratically as the detectable effect grows") {
    val rows = run("q226_power_analysis").collect()
      .sortBy(_.getAs[Long]("delta_e6"))
    assert(rows.length === 4)
    rows.sliding(2).foreach {
      case Array(small, big) =>
        assert(small.getAs[Long]("n_required") > big.getAs[Long]("n_required"),
          "a bigger effect needs fewer samples")
      case _ =>
    }
    // doubling delta divides n by ~4 (the formula is 1/delta^2)
    val n0 = rows(0).getAs[Long]("n_required").toDouble
    val n1 = rows(1).getAs[Long]("n_required").toDouble
    assert(math.abs(n0 / n1 - 4.0) < 0.01, s"quadratic law violated: ${n0 / n1}")
  }

  test("q227: collision audit conserves the vocabulary") {
    val row = run("q227_hash_collision_audit").collect().head
    val vocab = Tables.documents(spark, dir)
      .select(explode(array_distinct(split(col("text"), " "))).as("t"))
      .distinct().count()
    assert(row.getAs[Long]("n_tokens") === vocab)
    assert(row.getAs[Long]("n_used_buckets") <= math.min(vocab, 4096L))
    // driver recompute of the bucket loads from the same hash
    val loads = Tables.documents(spark, dir)
      .select(explode(array_distinct(split(col("text"), " "))).as("t"))
      .distinct()
      .select(pmod(graft.functions.Portable.h32(col("t")), lit(4096L)).as("b"))
      .collect().map(_.getLong(0))
      .groupBy(identity).map(_._2.length)
    assert(row.getAs[Long]("max_load") === loads.max.toLong)
    assert(row.getAs[Long]("n_colliding_tokens") ===
      loads.filter(_ > 1).sum.toLong)
    assert(row.getAs[Long]("collision_rate_e6") ===
      row.getAs[Long]("n_colliding_tokens") * 1000000L / vocab)
  }

  test("q230: raking converges row margins toward the equal-share target") {
    val rows = run("q230_ipf_raking").collect()
    assert(rows.nonEmpty)
    val rowTarget = {
      val bySrc = rows.groupBy(_.getAs[String]("source"))
      val tt = rows.map(_.getAs[Long]("n")).sum
      tt * 1000000L / bySrc.size
    }
    val maxErr = rows.head.getAs[Long]("max_row_err")
    // initial margins differ from the target by far more than the
    // post-raking error — 3 rounds must have actually moved them
    val worstInitial = rows.groupBy(_.getAs[String]("source"))
      .map { case (_, g) =>
        math.abs(g.map(_.getAs[Long]("n")).sum * 1000000L - rowTarget) }
      .max
    if (worstInitial == 0L)
      assert(maxErr <= rows.groupBy(_.getAs[String]("source")).size.toLong,
        "already-balanced margins must stay balanced (mod per-cell rounding)")
    else
      assert(maxErr < worstInitial / 10,
        s"raking barely converged: err $maxErr vs initial $worstInitial")
    rows.foreach(r => assert(r.getAs[Long]("w_e6") > 0L))
  }

  test("q231: SNIPS equals the naive weighted estimate and bounds raw IPS") {
    val rows = run("q231_snips_off_policy").collect()
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        when(col("event_type") === "purchase",
          floor(col("value") * lit(1e6)).cast("long")).otherwise(0L)
          .as("r"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { row =>
      val et = row.getAs[String]("event_type")
      val g = ev.filter(_._1 == et)
      val ws = g.map { case (_, u, r) =>
        val p = 100000L + graft.functions.Portable.h32s(s"prop:$u") % 800000L
        (1000000000L / p, r)
      }
      assert(row.getAs[Long]("n") === g.length.toLong)
      assert(row.getAs[Long]("sum_w") === ws.map(_._1).sum)
      assert(row.getAs[Long]("sum_wr") === ws.map(p => p._1 * p._2).sum)
      val want = ws.map(p => p._1 * p._2).sum.toDouble / ws.map(_._1).sum
      assert(math.abs(row.getAs[Double]("snips_v6") - want) < 1e-4)
    }
  }

  test("q233: normalized values are the exact global quantile lookups") {
    val rows = run("q233_quantile_norm").collect()
    assert(rows.nonEmpty)
    val all = Tables.documents(spark, dir).select("n_chars")
      .collect().map(_.getLong(0)).sorted
    val ng = all.length.toLong
    rows.foreach { r =>
      val (cums, ns, vn) = (r.getAs[Long]("cums"), r.getAs[Long]("ns"),
        r.getAs[Long]("v_norm"))
      // v_norm must be the smallest global value whose cumulative
      // count reaches the source fraction (cross-multiplied)
      val want = all.find(g => all.count(_ <= g).toLong * ns >= cums * ng
        || all.count(_ <= g).toLong * ns * 1 >= cums * ng).get
      // recompute exactly as the query: first g with cums*ng <= cumg*ns
      val want2 = all.distinct.find(g =>
        cums * ng <= all.count(_ <= g).toLong * ns).get
      assert(vn === want2, s"lookup mismatch at ${r.getAs[String]("source")}/" +
        s"${r.getAs[Long]("v")}: got $vn want $want2 (sanity $want)")
    }
    // normalization is monotone within each source
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Long]("v")).map(_.getAs[Long]("v_norm"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q234: rendezvous moves ~1/9 of keys where mod moves ~8/9") {
    val row = run("q234_rendezvous_rebalance").collect().head
    val n = row.getAs[Long]("n_docs")
    val hrw = row.getAs[Long]("hrw_moved").toDouble / n
    val mod = row.getAs[Long]("mod_moved").toDouble / n
    assert(hrw > 0.02 && hrw < 0.25, s"HRW moved fraction $hrw implausible")
    assert(mod > 0.7, s"mod-hash moved fraction $mod implausible")
    assert(mod > 4 * hrw, "rendezvous must move far fewer keys than mod")
    // driver recompute of the HRW placements
    val ids = Tables.documents(spark, dir).select("doc_id")
      .collect().map(_.getLong(0))
    def place(id: Long, ns: Int): Int = (0 until ns).maxBy(sh =>
      (graft.functions.Portable.h32s(s"shard:$sh:$id"), sh))
    val moved = ids.count(id => place(id, 8) != place(id, 9)).toLong
    assert(row.getAs[Long]("hrw_moved") === moved)
  }

  test("q235: sliding HLL estimate tracks the exact sliding distinct") {
    val rows = run("q235_sliding_hll").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getAs[Double]("est"),
        r.getAs[Long]("exact_distinct"))
      // 512 registers -> ~4.6% relative error; allow 4 sigma
      assert(math.abs(est - exact) <= math.max(5.0, 0.2 * exact),
        s"day ${r.getAs[java.sql.Date]("day")}: est $est vs exact $exact")
      assert(r.getAs[Long]("v_zero") >= 0L && r.getAs[Long]("v_zero") <= 512L)
    }
    // windows only grow the distinct count vs the single day
    val singleDay = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count_distinct(col("user_id")).as("d1"))
      .collect().map(r => r.getDate(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val day = r.getAs[java.sql.Date]("day")
      assert(r.getAs[Long]("exact_distinct") >= singleDay(day),
        "a trailing window cannot see fewer users than its last day")
    }
  }

  test("q236: flag predicate equals the naive z>2 test per cell") {
    val rows = run("q236_vector_outliers").collect()
    assert(rows.length ===
      Tables.embeddings(spark, dir).count().toInt)
    val byCell = rows.groupBy(_.getAs[Long]("cell"))
    byCell.foreach { case (_, g) =>
      val xs = g.map(_.getAs[Long]("cos_e6").toDouble)
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / n)
      g.foreach { r =>
        val x = r.getAs[Long]("cos_e6").toDouble
        val want = sd > 0 && (mean - x) / sd > 2.0
        assert(r.getAs[Boolean]("flag") === want,
          s"vec ${r.getAs[Long]("vec_id")}: z=${(mean - x) / sd}")
      }
    }
  }

  test("q237: PR sweep is threshold-monotone and recovers planted copies at t=1") {
    val rows = run("q237_dedup_pr_eval").collect()
      .sortBy(_.getAs[Long]("t"))
    assert(rows.length === 4)
    // predictions shrink as the band threshold rises; tp can only drop
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(hi.getAs[Long]("n_pred") <= lo.getAs[Long]("n_pred"))
        assert(hi.getAs[Long]("tp") <= lo.getAs[Long]("tp"))
      case _ =>
    }
    val t1 = rows.head
    assert(t1.getAs[Long]("tp") + t1.getAs[Long]("fn") > 0,
      "the fixture must plant at least one shadow")
    // one-token mutation preserves most shingles: t=1 recall is high
    assert(t1.getAs[Long]("recall_e6") >= 600000L,
      s"t=1 recall ${t1.getAs[Long]("recall_e6")} too low for 1-token edits")
  }

  test("q238: coverage shares are monotone in k and conserve the head") {
    val rows = run("q238_vocab_coverage").collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.length === 3)
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(hi.getAs[Long]("covered") >= lo.getAs[Long]("covered"))
        assert(hi.getAs[Long]("share_e6") >= lo.getAs[Long]("share_e6"))
      case _ =>
    }
    // driver recompute: top-k coverage from the sorted type frequencies
    val freqs = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count()
      .collect().map(_.getLong(1)).sortBy(-_)
    rows.foreach { r =>
      val k = r.getAs[Long]("k").toInt
      val want = freqs.take(k).sum
      assert(r.getAs[Long]("covered") === want, s"coverage at k=$k")
      assert(r.getAs[Long]("n_types_used") === math.min(k, freqs.length).toLong)
    }
  }

  test("q239: hard negatives share the anchor's bucket and exclude the pair") {
    val rows = run("q239_hard_negatives").collect()
    assert(rows.nonEmpty)
    val base = Tables.documents(spark, dir)
      .filter(size(split(col("text"), " ")) >= 4)
    // Adaptive prefix width, same sizing as the query (a fixed 6-bit
    // pin here would fight the adaptive-bits fix exactly as the old
    // EvaluateSpec mod-25 pin fought the codebook conversion).
    val nBits = math.min(16, math.max(4,
      63 - java.lang.Long.numberOfLeadingZeros(base.count() / 16)))
    val bkt = base
      .select(col("doc_id"),
        shiftright(graft.functions.Hash32.simhashCol(col("text")),
          32 - nBits).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(r => (r.getAs[Long]("anchor_id"), r.getAs[Long]("pos_id")))
      .foreach { case ((a, p), g) =>
        assert(g.length <= 2, "at most 2 negatives per pair")
        assert(g.map(_.getAs[Long]("neg_rank")).sorted.toSeq ===
          (1L to g.length).toSeq)
        g.foreach { r =>
          val neg = r.getAs[Long]("neg_id")
          assert(neg != a && neg != p, "negatives exclude the pair itself")
          assert(bkt(neg) === bkt(a),
            "hard negatives must come from the anchor's coarse bucket")
        }
      }
  }

  test("q240: kappa matches the naive 2x2 computation and cells conserve") {
    val row = run("q240_classifier_kappa").collect().head
    val (n, yy, yn, ny, nn) = (row.getAs[Long]("n"), row.getAs[Long]("yy"),
      row.getAs[Long]("yn"), row.getAs[Long]("ny"), row.getAs[Long]("nn"))
    assert(yy + yn + ny + nn === n, "confusion cells must partition the corpus")
    assert(n === Tables.documents(spark, dir).count())
    val po = (yy + nn).toDouble / n
    val pe = ((yy + yn).toDouble * (yy + ny) +
      (ny + nn).toDouble * (yn + nn)) / (n.toDouble * n)
    val kappa = (po - pe) / (1 - pe)
    assert(math.abs(row.getAs[Double]("kappa6") - kappa) < 1e-6)
    assert(row.getAs[Double]("kappa6") >= -1.0 &&
      row.getAs[Double]("kappa6") <= 1.0)
  }

  test("q241: folds partition the corpus and the variance matches") {
    val rows = run("q241_cv_folds").collect()
    assert(rows.length === 5)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, dir).count())
    val means = rows.map(_.getAs[Long]("mean_e6").toDouble)
    val k = means.length.toDouble
    val mu = means.sum / k
    val varr = means.map(m => (m - mu) * (m - mu)).sum / k
    val got = rows.head.getAs[Double]("between_fold_var")
    assert(rows.forall(_.getAs[Double]("between_fold_var") === got))
    // emitted as exact half-up INTEGER (e12-magnitude variance; 6-decimal
    // doubles there are engine-divergent) — allow the ±0.5 integer step
    assert(math.abs(got - varr) < math.abs(varr) * 1e-9 + 0.5 + 1e-3)
    assert(got === math.rint(got), "between_fold_var is integer-valued")
  }

  test("q246: lang-id metrics conserve the corpus and match the matrix") {
    val rows = run("q246_lang_id_metrics").collect()
    val total = rows.map(_.getAs[Long]("support")).sum
    assert(total === Tables.documents(spark, dir).count())
    val matrix = run("q27_lang_id").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    rows.foreach { r =>
      val l = r.getAs[String]("lang")
      assert(r.getAs[Long]("tp") === matrix.getOrElse((l, l), 0L))
      assert(r.getAs[Long]("fp") ===
        matrix.collect { case ((al, p), n) if p == l && al != l => n }.sum)
      assert(r.getAs[Long]("fn") ===
        r.getAs[Long]("support") - r.getAs[Long]("tp"))
      Seq("precision_e6", "recall_e6", "f1_e6").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0L && v <= 1000000L, s"$c out of range for $l")
      }
    }
  }

  test("q199: moment-form assortativity equals naive Pearson over edge degrees") {
    val row = run("q199_assortativity").collect().head
    val ue = Tables.events(spark, dir)
      .groupBy(col("user_id"),
        (lit(2000000000L) +
          graft.functions.Portable.h32(col("event_type")) % 1000000000L)
          .as("tid"))
      .agg(count(lit(1)))
      .select("user_id", "tid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = ue.flatMap { case (u, t) => Seq((u, t), (t, u)) }
    val deg = edges.groupBy(_._1).map { case (n, xs) => n -> xs.length.toDouble }
    val pairs = edges.map { case (s, t) => (deg(s), deg(t)) }
    val n = pairs.length.toDouble
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val r = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(row.getAs[Long]("n_edges") === pairs.length.toLong)
    val got = row.getAs[Double]("assort6")
    assert(got >= -1.0 && got <= 1.0)
    assert(math.abs(got - r) < 1e-5, s"assortativity mismatch: got $got want $r")
  }

  test("q263: conformal table derives and splits partition the stream") {
    val rows = run("q263_conformal_coverage").collect()
    assert(rows.nonEmpty)
    val perType = Tables.events(spark, dir).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_test") === perType(t),
        s"$t: calibration + test must partition the type")
      assert(r.getAs[Long]("qhat_v6") >= 0L)
      val cov = r.getAs[Long]("coverage_e6")
      assert(cov === r.getAs[Long]("n_covered") * 1000000L /
        r.getAs[Long]("n_test"), s"$t: coverage derivation")
      assert(r.getAs[Boolean]("meets_target") === (cov >= 900000L))
      // exchangeable splits: empirical coverage should sit near the
      // 90% target (loose band — the guarantee is in expectation)
      assert(cov > 800000L && cov <= 1000000L, s"$t: coverage $cov")
    }
  }
}
