package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 advisory closed in code: UNUSABLE vectors (wrong length /
  * null element) hash to ALL-ZERO band keys in every band — by
  * construction, so the oracle can replay the arithmetic — which means
  * a corpus with many malformed embeddings would pair them
  * QUADRATICALLY inside the degenerate (band, 0) buckets, and exact
  * dedup upstream cannot collapse them (the documents differ; only
  * the keys agree). q25/q267 now filter on
  * [[graft.functions.RhOps.usableVec]] BEFORE key generation; this
  * spec plants malformed vectors and proves
  *
  *  1. the degenerate class is REAL: without the filter, the planted
  *     malformed vectors share every (band, 0) bucket and candidate
  *     generation emits all their pairwise combinations;
  *  2. production q25 emits zero pairs touching a malformed id — and
  *     zero CANDIDATES, not just zero post-tau output;
  *  3. usable rows are untouched: q25's output on the planted corpus
  *     equals its output on the same corpus with the malformed rows
  *     absent (the filter drops work, never results).
  */
class LshZeroKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = graft.functions.RhOps.dim

  /** Deterministic unit-ish vector for vec_id = id. */
  private def vec(id: Long): Array[java.lang.Float] =
    Array.tabulate[java.lang.Float](dim)(i =>
      (((id * 31 + i * 7) % 97) / 97.0f) - 0.5f)

  private def writeFixture(dir: String, withMalformed: Boolean): Unit = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true)),
      StructField("label", IntegerType, nullable = false)))
    val good = (0L until 40L).map(id => Row(id, vec(id).toSeq, 0))
    // three DISTINCT malformed vectors: short, long, null element —
    // different payloads, identical (all-zero) keys
    val bad = Seq(
      Row(100L, vec(100L).toSeq.take(dim - 1), 1),
      Row(101L, (vec(101L).toSeq :+ (0.25f: java.lang.Float)), 1),
      Row(102L, vec(102L).toSeq.updated(5, null), 1))
    val rows = if (withMalformed) good ++ bad else good
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def q25(dir: String) =
    queries.Registry.byName("q25_neardup_cosine").fn(spark, dir)

  test("unusable vectors produce zero q25 pairs AND zero candidates; usable output is unchanged") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-zerokey-").toString
    writeFixture(s"$base/planted", withMalformed = true)
    writeFixture(s"$base/clean", withMalformed = false)

    // (1) the degenerate class is real without the filter: all-zero
    // keys collide, so the 3 malformed vectors emit C(3,2) candidate
    // pairs (one per band before distinct)
    val n = 43L
    val ppb = graft.functions.RhOps.probedPlanesFor(n)
    val t = graft.functions.RhOps.probesFor(ppb)
    val unfilteredKeys = spark.read
      .parquet(s"$base/planted/embeddings.parquet")
      .select(col("vec_id"), posexplode(graft.functions.RhOps
        .probedBandKeysCol(transform(col("embedding"),
          x => x.cast("double")), ppb, t)))
      .select(col("vec_id"), (col("pos") / (t + 1)).cast("int").as("band"),
        col("col").as("bkey"))
    val degeneratePairs = graft.ops.Dedup
      .bucketPairs(unfilteredKeys, "vec_id", Seq("band", "bkey"))
      .filter(col("a_id") >= 100 && col("b_id") >= 100)
      .select("a_id", "b_id").distinct().count()
    assert(degeneratePairs === 3L,
      s"expected the 3 malformed vectors to pair pairwise in the (band, 0) " +
        s"buckets without the filter (the class the guard exists for), got $degeneratePairs")

    // (2) production q25: zero candidates touch a malformed id. The
    // guard is usableVec — assert at the source: the filtered frame
    // drops exactly the 3 planted rows...
    val kept = spark.read.parquet(s"$base/planted/embeddings.parquet")
      .filter(graft.functions.RhOps.usableVec(col("embedding")))
    assert(kept.count() === 40L)
    assert(kept.filter(col("vec_id") >= 100).count() === 0L)
    // ...and end-to-end: no output pair touches a malformed id
    val planted = q25(s"$base/planted")
    assert(planted.filter(col("a_id") >= 100 || col("b_id") >= 100).count() === 0L)

    // (3) the filter drops work, not results: identical output with
    // the malformed rows planted vs absent. (n differs by 3, but both
    // corpora size to the same floor schedule, so keys are identical.)
    val clean = q25(s"$base/clean")
    assert(planted.collect().toSeq === clean.collect().toSeq,
      "planting malformed rows changed q25's output on the usable corpus")
  }
}
