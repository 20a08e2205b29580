package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Adversarial dedup robustness (round-2 verdict item 7): a corpus of
  * thousands of identical / near-identical documents must not melt the
  * LSH band join.
  *
  *  - Exact-dedup-first (q21 ordering): byte-identical copies collapse
  *    before LSH, so the flood never reaches the band buckets.
  *  - Bucket-size cap: for near-identical floods that survive exact
  *    dedup, capped candidate generation bounds the self-join at
  *    buckets × cap² and reports the skipped buckets.
  */
class DedupRobustnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val floodText =
    "aspirin versus placebo randomized controlled trial of mortality outcomes"

  /** 3000 byte-identical docs + 40 near-identical variants (one token
    * appended — same 4-gram prefix) + 60 distinct docs.
    */
  private lazy val corpus = {
    val identical = (1 to 3000).map(i => (i.toLong, floodText))
    val nearIdentical = (3001 to 3040).map(i =>
      (i.toLong, floodText + s" variant${i % 7}"))
    val distinct = (3041 to 3100).map(i =>
      (i.toLong, s"completely different text number $i about topic ${i % 13} " +
        s"with words w${i}a w${i}b w${i}c"))
    spark.createDataset(identical ++ nearIdentical ++ distinct)
      .toDF("doc_id", "text")
  }

  private def withShingles(df: org.apache.spark.sql.DataFrame) =
    df.filter(size(split(col("text"), " ")) >= 4)
      .select(col("doc_id"),
        graft.functions.Hash32.shingleHashes(col("text")).as("hs"))

  test("exact dedup first collapses an identical-doc flood before LSH") {
    // q21's md5 groupBy: one representative per distinct byte content
    val deduped = corpus
      .withColumn("h", md5(encode(col("text"), "UTF-8")))
      .groupBy("h").agg(min(col("doc_id")).as("doc_id"),
        first(col("text")).as("text"))
    val n = deduped.count()
    assert(n == 1L + 7L + 60L) // flood -> 1, variants -> 7, distinct -> 60
    // LSH after exact dedup: uncapped candidates stay small (the 8
    // surviving near-identical representatives pair up; the flood is
    // one doc and pairs with the variants at most)
    val cands = Dedup.candidates(Dedup.bandSignatures(withShingles(deduped)))
      .count()
    assert(cands <= 8L * 7L / 2 + 8L * 60L,
      s"post-dedup candidate count exploded: $cands")
  }

  test("bucket cap bounds candidate generation under a raw flood") {
    val bands = Dedup.bandSignatures(withShingles(corpus))
    // uncapped would pair the 3000-doc flood: ~4.5M pairs per band.
    // capped: the flood buckets (3000 > cap) are skipped entirely.
    val cap = 50
    val capped = Dedup.candidates(bands, Some(cap)).count()
    assert(capped <= 4L * 50 * 49 / 2,
      s"capped candidate count exceeded bucket bound: $capped")
    // the skipped buckets are observable (quarantine-table seam)
    val over = Dedup.oversized(bands, cap).collect()
    assert(over.nonEmpty)
    assert(over.forall(_.getAs[Long]("bucket_n") >= 3000),
      "oversized buckets must be the identical-doc flood")
  }

  test("cap does not change results on a benign corpus") {
    val benign = withShingles(corpus.filter(col("doc_id") > 3000))
    val bands = Dedup.bandSignatures(benign)
    val uncapped = Dedup.candidates(bands).orderBy("a_id", "b_id").collect()
    val capped = Dedup.candidates(bands, Some(50)).orderBy("a_id", "b_id").collect()
    assert(uncapped.sameElements(capped))
  }

  test("hot band key under AQE: cap bounds per-task work, audit names the skips") {
    // round-5 verdict item 8: ONE hot band key (the 3000-doc flood all
    // signature-collides into the same buckets) with the cap disabled
    // vs enabled, under AQE (Spark 4 default — asserted, since AQE's
    // skew splitting CANNOT help here: a single bucket's pair
    // generation is one task however the exchange is split, which is
    // exactly why the cap is semantic, not physical).
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val bands = Dedup.bandSignatures(withShingles(corpus))
      .localCheckpoint(true) // isolate generation cost from shingling

    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        maxTaskMs.updateAndGet(m => math.max(m, te.taskInfo.duration))
    }
    def measured(body: => Long): (Long, Long, Double) = {
      maxTaskMs.set(0)
      spark.sparkContext.addSparkListener(listener)
      try {
        val t0 = System.nanoTime()
        val n = body
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener bus drains async
        (n, maxTaskMs.get(), secs)
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    val cap = 50
    val (uncappedN, uncappedTask, uncappedSecs) =
      measured(Dedup.candidates(bands).count())
    val (cappedN, cappedTask, cappedSecs) =
      measured(Dedup.candidates(bands, Some(cap)).count())

    // uncapped: the flood alone is ~C(3000,2) pairs per band — the
    // hot bucket's quadratic blowup really happened
    assert(uncappedN >= 3000L * 2999 / 2, s"flood did not flood: $uncappedN")
    // capped: candidate space bounded by buckets x cap^2
    assert(cappedN <= 4L * cap * (cap - 1) / 2,
      s"capped candidates above bucket bound: $cappedN")
    // the skipped buckets are exactly the audit seam's content
    val over = Dedup.oversized(bands, cap).collect()
    assert(over.nonEmpty && over.forall(_.getAs[Long]("bucket_n") >= 3000))
    // bounded task time: the capped run's slowest task must not exceed
    // the uncapped run's hot-bucket task (generously slack against CI
    // noise; the real margin is recorded in SCALING.md)
    assert(cappedTask <= math.max(uncappedTask, 50L),
      s"capped max task ${cappedTask}ms vs uncapped ${uncappedTask}ms")
    info(f"uncapped: $uncappedN pairs, ${uncappedSecs}%.2fs wall, ${uncappedTask}ms max task")
    info(f"capped:   $cappedN pairs, ${cappedSecs}%.2fs wall, ${cappedTask}ms max task")
  }

  test("SemDeDup flood: exact vector dedup first collapses identical copies") {
    import spark.implicits._
    // 500 byte-identical embeddings + 20 distinct ones: ALL copies land
    // in one cell regardless of codebook size, so the q89-documented
    // ordering (exact dedup on the vector hash BEFORE cluster-then-
    // prune) is what bounds the within-cell pair space
    val rnd = new scala.util.Random(31)
    val flood = (0L until 500L).map(id => (id, Seq.fill(16)(1.0f)))
    val distinctRows = (500L until 520L).map(id =>
      (id, Seq.fill(16)(rnd.nextFloat())))
    val e = (flood ++ distinctRows).toDF("vec_id", "embedding")
    val deduped = e
      .withColumn("vh", md5(col("embedding").cast("string")))
      .withColumn("rep", min(col("vec_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vh"))))
      .filter(col("vec_id") === col("rep"))
      .drop("vh", "rep")
    assert(deduped.count() === 21) // 1 representative + 20 distinct
    // the residual within-cell pair space is bounded by the survivor
    // count, not the flood size: at most C(21,2) pairs remain possible
    val cells = graft.search.Ivf.assignments(deduped, centroidMod = 5)
      .groupBy("cell").agg(count(lit(1)).as("n")).collect()
    val worst = cells.map(r => { val n = r.getLong(1); n * (n - 1) / 2 }).sum
    assert(worst <= 21L * 20L / 2,
      s"post-dedup pair space must be survivor-bounded, got $worst")
  }
}
