package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Algebraic properties of the Corpus entries (q160–q163) beyond their
  * DuckDB oracles: whole-vector aggregation ≡ explode formulation,
  * shuffle permutation laws, sequence-order determinism, run-length
  * entropy ≡ explode/group-by counts.
  */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = Registry.byName(name).fn(spark, dir)

  test("q160: VecSum centroids equal the posexplode formulation") {
    val q = Tables.embeddings(spark, dir).select(col("label"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(1e6)).cast("long")).as("q"))
    val exploded = q.select(col("label"), posexplode(col("q")))
      .groupBy(col("label"), col("pos").cast("int").as("dim"))
      .agg(sum("col").as("s"), count(lit(1)).as("n_members"))
      .select(col("label"), col("dim"),
        floor(col("s").cast("double") / col("n_members"))
          .cast("long").as("cval"),
        col("n_members"))
    val native = run("q160_vector_centroids")
    assert(native.exceptAll(exploded).isEmpty &&
      exploded.exceptAll(native).isEmpty,
      "whole-vector aggregate must reproduce the explode+groupBy result")
  }

  test("q160: VecSum is partitioning-invariant") {
    val q = Tables.embeddings(spark, dir).select(col("label"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(1e6)).cast("long")).as("q"))
    val a = q.repartition(1).groupBy("label")
      .agg(graft.functions.VecSum.vecSum(col("q")).as("vs"))
      .select(col("label"), col("vs.s"), col("vs.n"))
    val b = q.repartition(7, col("q")).groupBy("label")
      .agg(graft.functions.VecSum.vecSum(col("q")).as("vs"))
      .select(col("label"), col("vs.s"), col("vs.n"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "integer vector sums must not depend on partitioning / merge order")
  }

  test("q160: VecSum rejects mixed dimensionality loudly") {
    import spark.implicits._
    val bad = Seq((1, Seq(1L, 2L)), (1, Seq(1L, 2L, 3L))).toDF("g", "q")
    val e = intercept[Exception] {
      bad.repartition(1).groupBy("g")
        .agg(graft.functions.VecSum.vecSum(col("q"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("mixed dimensionality"))),
      s"expected a mixed-dimensionality failure, got: ${e.getMessage}")
  }

  test("q161: output is a permutation with dense per-shard positions") {
    val out = run("q161_global_shuffle")
    val n = Tables.documents(spark, dir).count()
    assert(out.count() === n, "shuffle must be a permutation: no row lost")
    assert(out.select("doc_id").distinct().count() === n)
    // per-shard positions are 1..count(shard) with no gaps
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("c"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("c") || col("mn") =!= 1L)
    assert(bad.isEmpty, "positions must be dense 1..n per shard")
    // deterministic: a second run is bit-identical
    val again = run("q161_global_shuffle")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("q162: sequence equals the window-ordered formulation") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val viaWindow = Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        array_join(transform(
            array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x.getField("event_type")), "|").as("seq"))
    val native = run("q162_user_sequences")
    assert(native.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(native).isEmpty,
      "struct-sort secondary sort must equal the window row_number order")
  }

  test("q163: run-length entropy equals explode+groupBy counts") {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val g = t.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val expl = g.groupBy("doc_id")
      .agg(sum("c").cast("long").as("n_words"),
        count(lit(1)).cast("long").as("n_distinct"),
        sum((col("c").cast("double") * log(col("c").cast("double")))
          .cast("decimal(28,6)"))
          .cast("decimal(28,6)").cast("double").as("slnc"))
    val native = run("q163_word_entropy")
    assert(native.exceptAll(expl).isEmpty && expl.exceptAll(native).isEmpty,
      "map-side run-length entropy must equal the two-shuffle formulation")
  }

  test("q164: HLL estimate is within the expected error of exact") {
    val rows = run("q164_hll_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est")
      val exact = r.getAs[Long]("exact_distinct").toDouble
      // 3 standard errors at m=512: 3 * 1.04/sqrt(512) ≈ 13.8%
      assert(math.abs(est - exact) / exact <= 0.14,
        s"${r.getAs[String]("source")}: est $est vs exact $exact")
    }
  }

  test("q164: HLL registers are partitioning-invariant") {
    val t = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .select(col("source"), graft.functions.Portable.h32(col("w")).as("h"))
    val a = t.repartition(1).groupBy("source")
      .agg(graft.functions.Hll.hll(col("h")).as("sk"))
      .select(col("source"), col("sk.v_zero"), col("sk.t_total"))
    val b = t.repartition(7, col("h")).groupBy("source")
      .agg(graft.functions.Hll.hll(col("h")).as("sk"))
      .select(col("source"), col("sk.v_zero"), col("sk.t_total"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "register maxima must not depend on partitioning / merge order")
  }

  test("q165: positive-overlap docs agree with q72's inner-join counts") {
    val frac = run("q165_contam_frac")
      .filter(col("n_hit") > 0).select(col("doc_id"), col("n_hit"))
    val q72 = run("q72_decontam")
      .select(col("doc_id"), col("n_shared_shingles").as("n_hit"))
    assert(frac.exceptAll(q72).isEmpty && q72.exceptAll(frac).isEmpty,
      "the graded score must agree with the flag query where both exist")
  }

  test("q166: funnel is monotone and chains stage to stage") {
    val rows = run("q166_quality_funnel").orderBy("stage_idx").collect()
    assert(rows.length === 4)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_out") <= r.getAs[Long]("n_in"),
        s"stage ${r.getAs[String]("stage")} grew the corpus"))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_out") === b.getAs[Long]("n_in"),
        "each stage's survivors must be the next stage's input")
    }
  }

  test("q167: quantized stats stay in int8 range and hit the scale") {
    val rows = run("q167_int8_quant").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getAs[Long]("q_min") >= -127L && r.getAs[Long]("q_max") <= 127L,
        s"dim ${r.getAs[Int]("dim")}: quantized range escaped int8")
    }
    // some dimension must reach the boundary: the abs-max row
    // quantizes to exactly ±127
    assert(rows.exists(r =>
      r.getAs[Long]("q_max") == 127L || r.getAs[Long]("q_min") == -127L),
      "the scale-defining element must quantize to the boundary")
  }

  test("q163: plan is shuffle-free below the final sort") {
    val df = run("q163_word_entropy")
    val plan = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the range partition for the output
    // ORDER BY; the entropy computation itself must not shuffle
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected at most the order-by exchange, got:\n$plan")
  }

  test("q176: ranks are dense, terms occur in the doc, one doc recomputes") {
    val rows = run("q176_tfidf_keyterms").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq,
        "per-doc ranks must be dense from 1")
      assert(rs.length <= 3)
    }
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.forall(r =>
      docs(r.getLong(0)).split(" ").contains(r.getString(2))),
      "every keyterm must be a token of its document")
    // integer score law: score_e6 = tf * floor(ln(N/df)*1e6)
    val n = docs.size.toDouble
    val df = docs.values.flatMap(_.split(" ").distinct).toSeq
      .groupBy(identity).view.mapValues(_.size)
    val (d0, rs0) = byDoc.head
    val tf0 = docs(d0).split(" ").groupBy(identity).view.mapValues(_.size)
    rs0.foreach { r =>
      val t = r.getString(2)
      val expect = tf0(t).toLong *
        math.floor(math.log(n / df(t)) * 1e6).toLong
      assert(r.getLong(4) == expect, s"score law broken for term $t")
    }
  }

  test("q184: packing accounting laws hold at every context length") {
    val rows = run("q184_packing_ablation").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(128L, 256L, 512L))
    val totalTokens = Tables.documents(spark, dir)
      .agg(sum(size(split(col("text"), " ")))).head.getLong(0)
    rows.foreach { r =>
      val (ctx, nDocs, nCross, nSeqs, pad) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nSeqs * ctx - pad == totalTokens,
        "padded sequences must account for every token exactly once")
      assert(nCross <= nDocs)
    }
    assert(rows.map(_.getLong(3)).sliding(2).forall(p => p(0) >= p(1)),
      "larger contexts never need more padded sequences")
  }

  test("q187: replicates obey the leave-one-out identity") {
    val rows = run("q187_jackknife_replicates").collect()
    assert(rows.length == 8, "8 deterministic shards")
    val n = rows.map(_.getLong(1)).sum
    val s = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      assert(r.getLong(3) == (s - r.getLong(2)) * 1000000L / (n - r.getLong(1)),
        "loo_mean_e6 must derive from the complement partials")
      assert(r.getLong(4) == s * 1000000L / n)
    }
  }

  test("q177: novelty counts conserve the distinct-shingle space") {
    val out = run("q177_ngram_novelty")
    assert(out.filter(col("n_novel") > col("n_shingles")).isEmpty)
    val th = Tables.documents(spark, dir)
      .filter(size(split(col("text"), " ")) >= 4)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.Hash32.shingleHashes(col("text")))).as("h"))
    val totalDistinct = th.select("h").distinct().count()
    assert(out.agg(sum("n_novel")).head.getLong(0) == totalDistinct,
      "every distinct shingle has exactly one first owner")
    val firstDoc = out.agg(min("doc_id")).head.getLong(0)
    val firstRow = out.filter(col("doc_id") === firstDoc).head
    assert(firstRow.getLong(1) == firstRow.getLong(2),
      "the earliest doc's shingles are all novel by definition")
  }

  test("q192: the detector recovers exactly the planted mojibake") {
    val out = run("q192_mojibake_audit").collect()
    val docs = Tables.documents(spark, dir)
    // planted docs that actually contain an 'a' are the only 'Ã' sources
    val expectedFlagged = docs
      .filter(col("doc_id") % 7 === 0 && col("text").contains("a")).count()
    val expectedMoji = docs.filter(col("doc_id") % 7 === 0)
      .select(sum(length(col("text")) -
        length(regexp_replace(col("text"), "a", ""))).cast("long"))
      .head.getLong(0)
    assert(out.map(_.getLong(1)).sum == docs.count(), "all docs audited")
    assert(out.map(_.getLong(2)).sum == expectedFlagged,
      "flagged set == planted docs containing 'a'")
    assert(out.map(_.getLong(3)).sum == expectedMoji,
      "each planted 'a' contributes exactly one lead byte")
    out.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  test("q193: readability summary bounds and one-doc recomputation") {
    val out = run("q193_readability").collect()
    assert(out.map(_.getLong(1)).sum == Tables.documents(spark, dir).count())
    out.foreach { r =>
      val (mean, mn, mx) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mn <= mean + 1e-9 && mean <= mx + 1e-9,
        "mean lies within [min, max]")
    }
    // recompute one document driver-side with the same proxies
    val first = Tables.documents(spark, dir).orderBy("doc_id")
      .select("text", "source").head
    val (text, src) = (first.getString(0), first.getString(1))
    val w = text.split(" ", -1).length.toDouble
    val sent = math.max("[.!?]+".r.findAllIn(text).size, 1).toDouble
    val syl = "[aeiouy]+".r.findAllIn(text.toLowerCase).size.toDouble
    val flesch = BigDecimal(206.835 - 1.015 * (w / sent) - 84.6 * (syl / w))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = out.find(_.getString(0) == src).get
    assert(flesch >= row.getDouble(3) - 1e-9 && flesch <= row.getDouble(4) + 1e-9,
      "a member doc's score lies inside its source's [min, max]")
  }

  test("q194: ntile phases are balanced, ordered, and conserve docs") {
    val out = run("q194_curriculum_phases").collect()
    val byLang = out.groupBy(_.getString(0))
    val docTotal = Tables.documents(spark, dir).count()
    assert(out.map(_.getLong(2)).sum == docTotal, "every doc gets a phase")
    byLang.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length),
        "phases are 1..k contiguous")
      val counts = sorted.map(_.getLong(2))
      assert(counts.max - counts.min <= 1, "ntile balance within 1")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(5) <= b.getLong(4),
            "difficulty ranges are non-overlapping in phase order")
        case _ =>
      }
    }
  }

  test("q247: union estimate obeys the register-max set-algebra bounds") {
    val rows = run("q247_hll_setops").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ea, eb) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"))
      val eu = r.getAs[Double]("est_union")
      // union registers dominate each member's → estimate is monotone
      // (0.99 absorbs the small-range-correction branch boundary)
      assert(eu >= math.max(ea, eb) * 0.99,
        s"${r.get(0)}/${r.get(1)}: union $eu below member max($ea,$eb)")
      assert(eu <= (ea + eb) * 1.01,
        s"${r.get(0)}/${r.get(1)}: union $eu above member sum")
      // inclusion–exclusion overlap lands within the combined sketch
      // error of the exact overlap (3 estimates at ~4.6% standard
      // error each; bound on the summed cardinalities)
      val exact = r.getAs[Long]("exact_overlap").toDouble
      assert(math.abs(r.getAs[Double]("est_overlap") - exact)
        <= 0.14 * (ea + eb) + 1.0,
        s"${r.get(0)}/${r.get(1)}: overlap est far from exact $exact")
    }
  }

  test("q253: growth curve is monotone, totals the corpus, fit replays") {
    val rows = run("q253_heaps_law").collect().sortBy(_.getAs[Long]("k"))
    assert(rows.length === 8)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_tokens") >= a.getAs[Long]("n_tokens"))
        assert(b.getAs[Long]("v_distinct") >= a.getAs[Long]("v_distinct"))
        assert(b.getAs[Long]("n_docs") >= a.getAs[Long]("n_docs"))
      case _ =>
    }
    // k=8 checkpoint covers the whole corpus
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    assert(rows.last.getAs[Long]("n_tokens") === toks.count())
    assert(rows.last.getAs[Long]("v_distinct") ===
      toks.distinct().count())
    // the fitted exponent is the plain OLS over the fixed-point logs
    val pts = rows.map(r => (
      math.floor(math.log(r.getAs[Long]("n_tokens").toDouble) * 1e6),
      math.floor(math.log(r.getAs[Long]("v_distinct").toDouble) * 1e6)))
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(rows.head.getAs[Double]("beta6") - beta) < 1e-4,
      s"beta6 ${rows.head.getAs[Double]("beta6")} vs recomputed $beta")
  }

  test("q264: Hill estimator replays from the sorted length tail") {
    val r = run("q264_hill_tail").head()
    assert(r.getAs[Long]("k") === 100L)
    val lens = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long")
        .as("x")).filter(col("x") >= 1L)
      .collect().map(row => (row.getLong(1), row.getLong(0)))
      .sortBy { case (x, id) => (-x, id) }
    val xk1 = lens(100)._1
    assert(r.getAs[Long]("x_kplus1") === xk1)
    val hs = lens.take(100).map { case (x, _) =>
      BigDecimal(math.log(x.toDouble / xk1.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    assert(math.abs(r.getAs[Double]("hill_sum6") - hs.toDouble) < 1e-9,
      "decimal term sum must replay")
    if (hs > 0)
      assert(math.abs(r.getAs[Double]("alpha6") - 100.0 / hs.toDouble) < 1e-4)
  }

  test("q265: drift census statuses derive from the two rankings") {
    val rows = run("q265_topk_drift").collect()
    assert(rows.nonEmpty && rows.length <= 40)
    rows.foreach { r =>
      val (ra, rb) = (Option(r.getAs[Any]("rank_a")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("rank_b")).map(_.asInstanceOf[Long]))
      val expected = (ra, rb) match {
        case (None, _) => "new"
        case (_, None) => "dropped"
        case (Some(a), Some(b)) if a == b => "held"
        case _ => "moved"
      }
      assert(r.getAs[String]("status") === expected,
        s"word ${r.getAs[String]("w")}")
      ra.foreach(x => assert(x >= 1L && x <= 20L))
      rb.foreach(x => assert(x >= 1L && x <= 20L))
    }
    // both top-20 lists are fully represented
    assert(rows.count(r => !r.isNullAt(1)) === 20)
    assert(rows.count(r => !r.isNullAt(2)) === 20)
  }
}
