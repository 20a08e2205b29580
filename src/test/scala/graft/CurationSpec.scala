package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Property tests for the curation operators (q82-q85) on top of the
  * oracle hash-match: hand-derived PII expectations per fixture row,
  * BM25 ranking invariants, sampling-rate sanity, and the
  * nothing-dropped => text-unchanged rebuild identity for passage
  * dedup.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q82: per-pass counts and redaction match hand-derived expectations") {
    val rows = Registry.byName("q82_pii_redact").fn(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)), r.getString(5)))
      .toMap
    // (n_email, n_ip, n_ssn, n_phone)
    assert(rows(1L)._1 === ((2L, 0L, 0L, 0L)))
    assert(rows(1L)._2 ===
      "contact <EMAIL> or <EMAIL> for details")
    // pass ordering: dotted quads are IPs, never phones
    assert(rows(2L)._1 === ((0L, 2L, 0L, 0L)))
    assert(rows(3L)._1 === ((0L, 0L, 0L, 2L)))
    assert(rows(3L)._2 === "call <PHONE> or <PHONE> before 9pm")
    // pass ordering: an SSN is an SSN, not a phone
    assert(rows(4L)._1 === ((0L, 0L, 1L, 0L)))
    assert(rows(5L)._1 === ((1L, 1L, 0L, 1L)))
    // word-boundary guard: version strings survive untouched
    assert(rows(7L)._1 === ((0L, 0L, 0L, 0L)))
    assert(rows(7L)._2 === "v1.2.3.4beta is a version string not an address")
    // documented naive-IPv4 overmatch
    assert(rows(8L)._1 === ((0L, 1L, 0L, 0L)))
    assert(rows(9L)._1 === ((0L, 0L, 0L, 0L)))
    assert(rows(9L)._2 === "")
    assert(rows(10L)._1 === ((1L, 1L, 0L, 0L)))
  }

  test("q83: top-k is sorted, positive, and dominated by the rare term") {
    val out = Registry.byName("q83_bm25").fn(spark, sf).collect()
    assert(out.length === 10)
    val scores = out.map(_.getDouble(5))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    assert(scores.forall(_ > 0.0))
    // idf('dup') is ~10x the common terms' idf: every top-10 doc
    // contains it as long as >= 10 docs do (true at every sf)
    assert(out.forall(_.getLong(1) > 0L), "expected tf_dup > 0 in all top-10")
  }

  test("q84: per-stratum rates are honored within binomial noise") {
    val out = Registry.byName("q84_stratified_sample").fn(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet === Set("en", "de", "es", "fr", "zh"))
    out.foreach { case (lang, (permille, total, kept)) =>
      assert(kept <= total)
      val expected = total * permille / 1000.0
      val tol = 4 * math.sqrt(total * (permille / 1000.0) *
        (1 - permille / 1000.0)) + 1
      assert(math.abs(kept - expected) <= tol,
        s"$lang: kept=$kept expected~$expected tol=$tol")
    }
    assert(out("zh")._3 === out("zh")._2, "rate 1000 must keep everything")
  }

  test("q85: threshold fires, and no-drop docs rebuild to the original text") {
    val out = Registry.byName("q85_passage_dedup").fn(spark, sf)
    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      md5(col("text")).as("orig_md5"))
    val joined = out.join(docs, "doc_id")
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        col("kept_md5"), col("orig_md5"))
      .collect()
    assert(joined.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(joined.exists(r => r.getLong(2) < r.getLong(1)),
      "expected at least one boilerplate chunk dropped at this sf")
    // aligned chunks partition the token stream, so an untouched doc
    // reassembles to exactly its original single-spaced text
    val untouched = joined.filter(r => r.getLong(2) === r.getLong(1))
    assert(untouched.nonEmpty)
    untouched.foreach(r => assert(r.getString(3) === r.getString(4),
      s"doc ${r.getLong(0)}: rebuild changed an untouched document"))
  }

  test("prefix-filter completeness: df-ordered prefixes never lose a true pair") {
    // Randomized differential for the q69 core (Prefix.prefix): on
    // random corpora with planted near-duplicates, every pair with
    // true Jaccard >= 0.88 must share at least one feature in both
    // docs' rarest-first prefixes — the ppjoin soundness property the
    // blocked join relies on (candidates are a superset; the exact
    // verify join removes the rest).
    val rnd = new scala.util.Random(23)
    val vocab = Array("agg", "row", "scan", "slow", "fast", "table", "key", "dup")
    def randDoc(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(vocab.length)))
    val base = (1 to 80).map(_ => randDoc(6 + rnd.nextInt(8)))
    val nearDups = base.take(25).map(d => d :+ vocab(rnd.nextInt(vocab.length)))
    val docs = (base ++ nearDups)
      .map(toks => graft.functions.Hash32.shingles(toks.mkString(" ")).distinct)
      .filter(_.nonEmpty)

    val dfCount = docs.flatten.groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    val pairs = dfCount.filter(_._2 >= 2)
    val dfm = new graft.functions.FeatureDfMap(
      pairs.keys.toArray, pairs.values.toArray)
    val prefixes = docs.map(fs => graft.functions.Prefix
      .prefix(new org.apache.spark.sql.catalyst.util.GenericArrayData(fs), dfm)
      .toLongArray().toSet)

    var truePairs = 0
    for (i <- docs.indices; j <- docs.indices if i < j) {
      val a = docs(i).toSet; val b = docs(j).toSet
      val common = (a intersect b).size
      if (common * 100L >= 88L * (a.size + b.size - common)) {
        truePairs += 1
        assert((prefixes(i) intersect prefixes(j)).nonEmpty,
          s"true pair ($i,$j) lost by the prefix filter")
      }
    }
    assert(truePairs >= 10, s"planted near-dups missing: $truePairs")
  }

  test("Passage/Prefix expression edge cases") {
    import graft.functions.{FeatureDfMap, Passage, Prefix, PassageHotSet}
    // chunking: empty string is one empty chunk (split keeps the empty
    // token); exact multiples and ragged tails
    assert(Passage.chunks("").toSeq === Seq(""))
    assert(Passage.chunks("a b c d").toSeq === Seq("a b c d"))
    assert(Passage.chunks("a b c d e").toSeq === Seq("a b c d", "e"))
    assert(Passage.chunks("a b c d e f g h").toSeq === Seq("a b c d", "e f g h"))
    // rebuild: drop middle / drop all / drop none
    def rb(text: String, hot: Seq[String]) = {
      val r = Passage.rebuild(
        org.apache.spark.unsafe.types.UTF8String.fromString(text),
        new PassageHotSet(hot.toArray))
      (r.getLong(0), r.getLong(1), r.getUTF8String(2).toString)
    }
    assert(rb("a b c d e f g h i", Seq("e f g h")) === ((3L, 2L, "a b c d i")))
    assert(rb("a b c d", Seq("a b c d")) === ((1L, 0L, "")))
    assert(rb("a b c d", Seq()) === ((1L, 1L, "a b c d")))
    // prefix: n=1 keeps 1; absent features order by value ascending;
    // listed (hot) features sort after all df-1 features
    def pfx(toks: Seq[Long], dfm: FeatureDfMap) = Prefix.prefix(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(toks.toArray),
      dfm).toLongArray().toSeq
    val empty = new FeatureDfMap(Array.empty, Array.empty)
    assert(pfx(Seq(42L), empty) === Seq(42L))
    // n=10: prefLen = 10 - ceil(8.8) + 1 = 2
    val ten = Seq(9L, 5L, 7L, 1L, 3L, 8L, 2L, 6L, 4L, 10L)
    assert(pfx(ten, empty) === Seq(1L, 2L))
    val hot = new FeatureDfMap(Array(1L, 2L), Array(50L, 9L))
    assert(pfx(ten, hot) === Seq(3L, 4L)) // 1 and 2 pushed past the rare tier
  }

  test("q86: bloom-prefiltered decontamination equals the exact q72 form") {
    val exact = Registry.byName("q72_decontam").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloomed = Registry.byName("q86_bloom_decontam").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloomed === exact)
    assert(exact.nonEmpty)
  }

  test("q143: keys replay the max-of-w-uniforms A-ES identity per row") {
    import graft.functions.Portable
    val out = Registry.byName("q143_weighted_sample").fn(spark, sf).collect()
    val langs = out.map(_.getString(0)).distinct
    assert(langs.nonEmpty)
    langs.foreach { l =>
      val rows = out.filter(_.getString(0) == l).sortBy(_.getLong(1))
      assert(rows.map(_.getLong(1)).toSeq === (1L to rows.length).toSeq,
        s"ranks not dense for lang $l")
      assert(rows.length <= 5)
      // keys non-increasing in rank (the sample IS the top-k by key)
      val keys = rows.map(_.getLong(4))
      assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
      rows.foreach { r =>
        val (id, wt, key) = (r.getLong(2), r.getLong(3), r.getLong(4))
        assert(wt >= 1L && wt <= 4L)
        val expected = (0L until wt)
          .map(j => Portable.h32s(s"$id:ws:$j") % 2147483648L).max
        assert(key === expected,
          s"A-ES key mismatch for doc $id (wt=$wt)")
      }
    }
  }

  test("q188: fertility is bounded below by 1 and above by characters") {
    val rows = Registry.byName("q188_bpe_fertility").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 10 >= 8), "held-out docs only")
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        "BPE emits at least one token per word")
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1))
    }
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("nc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall(r => r.getLong(2) <= docs(r.getLong(0))),
      "token count cannot exceed non-space character count")
    assert(rows.exists(r => r.getLong(2) < docs(r.getLong(0))),
      "five trained merges must compress at least one held-out doc")
  }

  test("q189: funnel chains, shrinks monotonically, and packs nonzero") {
    val rows = Registry.byName("q189_curation_e2e").fn(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 7))
    rows.take(6).foreach(r => assert(r.getLong(3) <= r.getLong(2),
      s"stage ${r.getString(1)} cannot add documents"))
    rows.sliding(2).foreach { case Array(a, b) =>
      if (b.getInt(0) <= 6)
        assert(a.getLong(3) == b.getLong(2), "funnel stages must chain")
    }
    assert(rows.head.getLong(2) ==
      Tables.documents(spark, sf).count(), "stage 1 starts from the corpus")
    assert(rows.last.getLong(3) > 0, "packing must emit sequences")
  }

  test("q249: census is internally consistent and totals the corpus") {
    val rows = Registry.byName("q249_gopher_rules").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val failCols =
      Seq("fail_len", "fail_word_len", "fail_symbol", "fail_alpha", "fail_stop")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val fails = failCols.map(c => r.getAs[Long](c))
      fails.foreach(f => assert(f >= 0L && f <= n))
      val pass = r.getAs[Long]("n_pass")
      // union bound below, single-worst-rule bound above
      assert(pass >= n - fails.sum && pass <= n - fails.max,
        s"${r.getString(0)}: pass $pass outside [${n - fails.sum}, " +
          s"${n - fails.max}]")
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).count(), "census must cover every doc")
  }

  test("q255: span decontam refines q72's any-shingle flag") {
    val spans = Registry.byName("q255_overlap_spans").fn(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hit_pos"), r.getAs[Long]("max_run"),
          r.getAs[Boolean]("contaminated"))).toMap
    val any = Registry.byName("q72_decontam").fn(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_shared_shingles")).toMap
    // a doc has a matched POSITION iff it has a matched shingle
    assert(spans.keySet === any.keySet,
      "span and any-shingle decontam must flag the same doc set")
    spans.foreach { case (id, (nPos, maxRun, flag)) =>
      // positions count duplicates that the distinct-shingle count folds
      assert(nPos >= any(id), s"doc $id position count below shingle count")
      assert(maxRun >= 1L && maxRun <= nPos, s"doc $id run bounds")
      assert(flag === (maxRun >= 3L), s"doc $id flag derivation")
    }
  }

  test("q249: fail_len matches an independent word-count filter") {
    val expected = Tables.documents(spark, sf)
      .filter(!(size(split(col("text"), " ")).cast("long").between(50L, 100000L)))
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Registry.byName("q249_gopher_rules").fn(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("fail_len") ===
        expected.getOrElse(r.getString(0), 0L), s"source ${r.getString(0)}")
    }
  }
}
