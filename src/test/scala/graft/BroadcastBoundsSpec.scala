package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Passage, Prefix}
import graft.search.{Ivf, Pq}

/** The three driver-side collections flagged at round 5 are now bounded
  * BY CONSTRUCTION: q69's feature ordering and q85's hot-chunk set ride
  * capped `SparkContext.broadcast` handles, and the Ivf/Pq codebook
  * fetches are TakeOrdered-with-cap, failing loudly on overflow. Each
  * bound gets a spec here: the happy path is unchanged, the cap is a
  * hard error (never a silent truncation) where output depends on every
  * member, and an AUDITED truncation where truncation is provably sound
  * (any shared total order keeps the prefix filter exact).
  */
class BroadcastBoundsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- q85: Passage.broadcastHotSet -------------------------------

  test("broadcastHotSet under cap: rebuild drops exactly the hot chunks") {
    val docs = Seq(
      (1L, "copyright notice all rights reserved unique alpha text here now"),
      (2L, "copyright notice all rights reserved unique beta words here too"),
      (3L, "copyright notice all rights reserved gamma body content goes here")
    ).toDF("doc_id", "text")
    val hotDf = docs
      .select(explode(Passage.chunksCol(col("text"))).as("chunk"))
      .groupBy("chunk").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 3).select("chunk")
    val hot = Passage.broadcastHotSet(hotDf, cap = 100)
    val out = docs
      .select(col("doc_id"), Passage.rebuildCol(col("text"), hot).as("r"))
      .select(col("doc_id"), col("r.n_chunks"), col("r.n_kept"), col("r.kept_text"))
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    // the shared leading boilerplate chunk is removed from every doc
    out.foreach { r =>
      assert(r.getLong(2) < r.getLong(1),
        s"doc ${r.getLong(0)} kept all chunks: $r")
      assert(!r.getString(3).startsWith("copyright notice"))
    }
  }

  test("broadcastHotSet overflow fails loudly, never truncates") {
    val hotDf = (1 to 10).map(i => s"chunk number $i distinct")
      .toDF("chunk")
    val e = intercept[IllegalArgumentException] {
      Passage.broadcastHotSet(hotDf, cap = 4)
    }
    assert(e.getMessage.contains("broadcast cap"))
  }

  // ---- q69: Prefix.broadcastDfMap ----------------------------------

  test("broadcastDfMap caps at top-df entries with a truncation audit") {
    val dfRows = Seq((10L, 9L), (20L, 7L), (30L, 5L), (40L, 3L), (50L, 2L))
      .toDF("w", "df")
    val (full, truncFull) = Prefix.broadcastDfMap(dfRows, cap = 10)
    assert(!truncFull)
    assert(full.value.feats.length === 5)
    val (cut, truncCut) = Prefix.broadcastDfMap(dfRows, cap = 3)
    assert(truncCut)
    // the kept entries are the HIGHEST-df ones; demoted ones read df=1
    assert(cut.value.feats.sorted.toSeq === Seq(10L, 20L, 30L))
    assert(cut.value.df(40L) === 1L && cut.value.df(50L) === 1L)
    assert(cut.value.df(20L) === 7L)
  }

  test("truncated df ordering is sound: candidates stay a superset of true pairs") {
    // truncation only demotes the least-frequent listed features to
    // df=1 — the prefix guarantee (any two docs with jaccard >= tau
    // share a prefix feature) holds for ANY total order, so the
    // confirm-join output is invariant. Pin that: every brute-force
    // true pair is a candidate under BOTH the full and truncated maps.
    val tau = 0.88
    val docs = Seq(
      (1L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L)),
      (2L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 10L)), // j=0.8 with 1
      (3L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)), // j=0.9 with 1
      (4L, Seq(20L, 21L, 22L, 23L, 24L, 25L, 26L, 27L)),
      (5L, Seq(20L, 21L, 22L, 23L, 24L, 25L, 26L, 27L)) // j=1.0 with 4
    ).toDF("doc_id", "toks")
    val truePairs = Set((1L, 3L), (4L, 5L))
    val dfRows = docs.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("df")).filter(col("df") >= 2)
    for (cap <- Seq(1000, 4)) {
      val (dfm, _) = Prefix.broadcastDfMap(dfRows, cap = cap)
      val pref = docs.select(col("doc_id"),
        explode(Prefix.prefixCol(col("toks"), dfm)).as("w"))
      val cands = pref.as("a").join(pref.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(truePairs.subsetOf(cands),
        s"cap=$cap lost true pairs: ${truePairs -- cands}")
      assert(tau > 0) // silence unused warning, tau documents the regime
    }
  }

  // ---- Ivf/Pq codebook caps ----------------------------------------

  test("Ivf.codebook enforces its centroid cap by construction") {
    val rnd = new scala.util.Random(11)
    val e = (0 until 60)
      .map(i => (i.toLong, Seq.fill(4)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    // mod 2 -> 30 sampled centroids; cap 8 must refuse
    val err = intercept[IllegalArgumentException] {
      Ivf.codebook(e, centroidMod = 2, cap = 8)
    }
    assert(err.getMessage.contains("centroid cap"))
    // raising the mod (the named knob) brings it back under the cap
    assert(Ivf.codebook(e, centroidMod = 16, cap = 8) != null)
  }

  test("Pq.model enforces the same cap with the same knob") {
    val q = (0 until 40)
      .map(i => (i.toLong, Seq.fill(8)((i % 7).toLong)))
      .toDF("vec_id", "q")
    val err = intercept[IllegalArgumentException] {
      Pq.model(q, centroidMod = 2, m = 2, cap = 4)
    }
    assert(err.getMessage.contains("centroid cap"))
    val ok = Pq.model(q, centroidMod = 16, m = 2, cap = 4)
    assert(ok.cids.length <= 4)
  }
}
