package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Algebraic properties of the ScaleOps entries (q152–q155) beyond
  * their DuckDB oracles: pigeonhole completeness, layout bounds,
  * salting invariance, chunk coverage.
  */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = Registry.byName(name).fn(spark, dir)

  test("q152: blocked pairs equal brute-force Hamming<=1 pairs") {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), graft.functions.Hash32.simhashCol(col("text")).as("sh"))
    val a = sh.select(col("doc_id").as("a_id"), col("sh").as("sha"))
    val b = sh.select(col("doc_id").as("b_id"), col("sh").as("shb"))
    val brute = a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("sha").bitwiseXOR(col("shb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 1)
    val blocked = run("q152_simhash_hamming")
    assert(blocked.exceptAll(brute).isEmpty && brute.exceptAll(blocked).isEmpty,
      "pigeonhole blocking must be exactly complete for k=1 over 2 blocks")
    assert(blocked.count() > 0, "fixture corpus should contain near-dup fingerprints")
  }

  test("q153: tiles partition the table and respect interleave bounds") {
    val rows = run("q153_zorder_layout").collect()
    val total = Tables.events(spark, dir).count()
    for (layout <- Seq("zorder", "time")) {
      val tiles = rows.filter(_.getString(0) == layout)
      assert(tiles.map(_.getLong(2)).sum === total, s"$layout tiles must partition rows")
    }
    // z DIV 32 fixes u bits 3,2 and d bit 3: u confined to a
    // 4-wide quarter, d to an 8-wide half — the pruning guarantee
    rows.filter(_.getString(0) == "zorder").foreach { r =>
      assert(r.getLong(3) <= 4, s"zorder tile ${r.getLong(1)} u_span ${r.getLong(3)} > 4")
      assert(r.getLong(4) <= 8, s"zorder tile ${r.getLong(1)} d_span ${r.getLong(4)} > 8")
    }
    // the time layout nails days but cannot bound the user dimension
    rows.filter(_.getString(0) == "time").foreach { r =>
      assert(r.getLong(4) <= 2, s"time tile ${r.getLong(1)} d_span ${r.getLong(4)} > 2")
    }
  }

  test("q154: salted join result is identical to the plain join") {
    val plain = Tables.events(spark, dir)
      .select((pmod(col("user_id"), lit(1500L)) + 1L).as("ck"), col("value"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("ck") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Portable.dsum6(col("value")).as("total_value"))
    val salted = run("q154_salted_join")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salting must be result-invariant")
  }

  test("q155: chunks tile every document with stride 48 and cover all tokens") {
    val chunks = run("q155_chunk_docs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val nTokens = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet === nTokens.keySet, "every document must chunk")
    for ((doc, cs) <- chunks) {
      val sorted = cs.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, idx, start, _), i) =>
        assert(idx === i.toLong, s"doc $doc chunk indices must be dense")
        assert(start === i.toLong * 48 + 1, s"doc $doc stride must be 48")
      }
      val (_, _, lastStart, lastLen) = sorted.last
      val n = nTokens(doc)
      assert(lastStart + lastLen - 1 === n,
        s"doc $doc: last chunk must end exactly at token $n")
      sorted.dropRight(1).foreach { case (_, idx, _, len) =>
        assert(len === 64L, s"doc $doc chunk $idx: only the tail may run short")
      }
      // a doc at or under one window is exactly one chunk
      if (n <= 64) assert(sorted.length === 1)
    }
  }

  test("q156: importance weights separate the target domain") {
    val langs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = run("q156_dsir_weights").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.length === langs.size, "every document must score")
    // the likelihood ratio must, on average, rank target-domain (en)
    // docs above the rest — that separation is the whole point of DSIR
    val (en, rest) = rows.partition { case (id, _) => langs(id) == "en" }
    val enMean = en.map(_._2).sum / en.length
    val restMean = rest.map(_._2).sum / rest.length
    assert(enMean > restMean,
      s"mean log-weight of target docs ($enMean) must exceed the rest ($restMean)")
  }

  test("q157: the day filter prunes the partitioned scan to one directory") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = java.nio.file.Files.createTempDirectory("graft-partspec-").toString
    val ev = Tables.events(spark, dir)
      .withColumn("day", expr("unix_micros(ts) DIV 86400000000"))
    ev.write.partitionBy("day").parquet(s"$root/t")
    val nDays = ev.select("day").distinct().count()
    assert(nDays > 1, "fixture must span multiple partitions")
    val probeDay = ev.agg(min("day")).head().getLong(0) + 1L
    val pruned = spark.read.parquet(s"$root/t").filter(col("day") === probeDay)
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a file scan")
    scans.foreach { f =>
      assert(f.partitionFilters.nonEmpty,
        "day predicate must reach the scan as a partition filter")
      assert(f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .length === 1,
        s"exactly 1 of $nDays partitions must survive pruning")
    }
    graft.queries.Scratch.rmTree(root)
  }

  test("q158: resize letterboxes to 224 and frame samples respect the stride/cap") {
    val rows = run("q158_media_frames").collect()
    val perDoc = rows.groupBy(_.getLong(0))
    assert(perDoc.size === Tables.documents(spark, dir).count(),
      "every media item must emit frames")
    rows.foreach { r =>
      val (w, h, px, py) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(math.max(w, h) === 224L, "the long side must hit the target exactly")
      assert(w >= 1 && h >= 1 && px >= 0 && py >= 0)
      assert(px * 2 <= 224 - w && (224 - w) - px * 2 <= 1, "pad must center (±1 for odd)")
      assert(r.getLong(5) % 10 === 0L, "frame stride must be 10")
    }
    perDoc.values.foreach { fs =>
      assert(fs.length <= 8, "sample cap is 8 frames")
      assert(fs.map(_.getLong(5)).sorted.sameElements(
        (0 until fs.length).map(_ * 10L)), "frames must be the dense stride prefix")
    }
  }

  test("q159: sketch ranges are non-overlapping, complete, and balanced-ish") {
    val rows = run("q159_sketch_range_partition").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val total = Tables.documents(spark, dir)
      .filter(size(split(col("text"), " ")) >= 1).count()
    assert(rows.map(_._2).sum === total, "partitions must cover every row")
    // value ranges must form a total order — the merge-join /
    // file-skipping guarantee a range layout exists to provide
    rows.sliding(2).foreach {
      case Array((pa, _, _, aMax), (pb, _, bMin, _)) =>
        assert(pa < pb && aMax < bMin,
          s"partition $pa [..$aMax] must precede $pb [$bMin..]")
      case _ =>
    }
    // balance at bin granularity: nobody should exceed 2x the ideal
    // share unless a single heavy bin forces it (none in this corpus)
    val ideal = total.toDouble / 8
    rows.foreach { case (p, n, _, _) =>
      assert(n <= 2 * ideal + 1,
        s"partition $p holds $n rows vs ideal $ideal — splits degenerated")
    }
  }
  test("q214: every planted shadow copy is recovered with tiny Hamming distance") {
    val rows = run("q214_media_phash_dedup").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("hamming")))
    val planted = Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(13)) === 0)
      .select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val hit = rows.find(p => p._1 == id && p._2 == id + 10000000L)
      assert(hit.isDefined, s"planted shadow of $id not recovered")
      // the mutation touches only payload block 0 -> at most 1 bit,
      // plus 1 slack for the block-boundary edge
      assert(hit.get._3 <= 2, s"shadow of $id drifted: hamming ${hit.get._3}")
    }
    rows.foreach(p => assert(p._3 <= 3, "confirm filter must cap hamming"))
  }
  test("q223: skew audit matches the naive frequency recompute and sizes salt") {
    val row = run("q223_join_skew_audit").collect().head
    val freqs = Tables.events(spark, dir).groupBy("user_id").count()
      .collect().map(_.getLong(1)).sorted
    val (nk, tot, mx) = (freqs.length.toLong, freqs.sum, freqs.max)
    assert(row.getAs[Long]("n_keys") === nk)
    assert(row.getAs[Long]("total") === tot)
    assert(row.getAs[Long]("max_freq") === mx)
    // p99: smallest f with >= 1% of keys at or above it
    val p99 = freqs.reverse.filter(f =>
      freqs.count(_ >= f) * 100L >= nk).lastOption.getOrElse(mx)
    assert(row.getAs[Long]("p99_freq") === p99)
    assert(row.getAs[Long]("top_share_e6") === mx * 1000000L / tot)
    val saltN = row.getAs[Long]("salt_n")
    assert(saltN >= 1L)
    // the recommendation caps any salted sub-key at ~4x the mean
    assert(mx / saltN <= 4 * (tot / nk) + saltN,
      s"salt_n=$saltN leaves sub-keys above the 4x-mean target")
  }
  test("q243: windows tile every payload byte and the peak law holds") {
    val rows = run("q243_media_windows").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("w"),
        r.getAs[Long]("win_len"), r.getAs[Long]("feat_e3"),
        r.getAs[Long]("total_bytes"), r.getAs[Long]("peak_w")))
    assert(rows.nonEmpty)
    val byteLens = Tables.documents(spark, dir)
      .select(col("doc_id"), octet_length(encode(col("text"), "UTF-8"))
        .cast("long").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (id, g) =>
      val total = byteLens(id)
      assert(g.map(_._3).sum === total,
        s"doc $id: windows must conserve every byte")
      assert(g.head._5 === total)
      // contiguous window indices 0..n-1
      assert(g.map(_._2).sorted.toSeq === (0L until g.length.toLong).toSeq)
      // all but the last window are full 256 bytes
      g.sortBy(_._2).dropRight(1).foreach(r => assert(r._3 === 256L))
      // peak = min index among max-feature windows
      val mx = g.map(_._4).max
      assert(g.head._6 === g.filter(_._4 == mx).map(_._2).min,
        s"doc $id peak law")
    }
  }

  test("q248: segments are exactly the maximal active runs of q243") {
    // q243 emits the SAME per-window feature stream; recompute the
    // active set from it and check q248's segments are its maximal
    // consecutive runs — correct bounds, no gaps, full coverage
    val active = run("q243_media_windows").collect()
      .filter(_.getAs[Long]("feat_e3") >= 500L)
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("w"))).toSet
    val segs = run("q248_vad_segments").collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val (id, a, b) = (r.getAs[Long]("doc_id"),
        r.getAs[Long]("seg_start"), r.getAs[Long]("seg_end"))
      assert(r.getAs[Long]("n_win") === b - a + 1, s"doc $id run length")
      (a to b).foreach(w => assert(active((id, w)),
        s"doc $id window $w inside a segment but inactive"))
      // maximality: the neighbors just outside the run are inactive
      assert(!active((id, a - 1)), s"doc $id segment not left-maximal")
      assert(!active((id, b + 1)), s"doc $id segment not right-maximal")
    }
    assert(segs.map(_.getAs[Long]("n_win")).sum === active.size,
      "segments must cover every active window exactly once")
  }

  test("q250: chunks partition the sentence stream and conserve tokens") {
    val rows = run("q250_sentence_chunks").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, g) =>
      val sorted = g.sortBy(_.getAs[Long]("chunk_id"))
      // sentence spans are contiguous from 1 with no overlap or gap
      assert(sorted.head.getAs[Long]("first_s") === 1L, s"doc $id start")
      sorted.foreach { r =>
        assert(r.getAs[Long]("n_sentences") ===
          r.getAs[Long]("last_s") - r.getAs[Long]("first_s") + 1,
          s"doc $id span vs count")
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("first_s") === a.getAs[Long]("last_s") + 1,
            s"doc $id chunk boundary gap/overlap")
          assert(b.getAs[Long]("chunk_id") > a.getAs[Long]("chunk_id"))
        case _ =>
      }
      // token conservation against an independent recount
      val expected = Tables.documents(spark, dir)
        .filter(col("doc_id") === id)
        .select(explode(split(col("text"), "[.!?]+")).as("s0"))
        .select(trim(col("s0")).as("s")).filter(length(col("s")) > 0)
        .select(size(split(col("s"), " ")).cast("long").as("n"))
        .collect().map(_.getLong(0)).sum
      assert(g.map(_.getAs[Long]("n_tokens")).sum === expected,
        s"doc $id token conservation")
    }
  }
}
