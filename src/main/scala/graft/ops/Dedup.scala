package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash-LSH banded candidate generation, shared by the q23 entry and
  * the adversarial-robustness guard (round-2 verdict item 7).
  *
  * Bucket-size blowup: a flood of identical (or signature-identical)
  * documents lands in ONE band bucket, and the bucket self-join is
  * quadratic in the bucket size. Two-layer mitigation, in order:
  *
  *  1. EXACT dedup first (q21's md5 groupBy): byte-identical copies —
  *     the only way to mass-produce identical signatures without
  *     already being near-duplicates — collapse to one representative
  *     per hash before any LSH runs. This is the documented standard
  *     ordering of the dedup pipeline.
  *  2. A bucket-size cap for the residual adversarial case
  *     (near-identical-but-not-byte-identical floods): buckets larger
  *     than `maxBucket` are dropped from candidate generation (with
  *     the drop observable via [[oversized]]), bounding the join at
  *     buckets × maxBucket² instead of N².
  *
  * Scale shape: the bucket-size count and the candidate self-join
  * shuffle on the SAME (band, sig) key, so AQE co-partitions them; the
  * cap turns the worst-case quadratic bucket into a skipped key — the
  * same move as AQE's skew-join splitting, but semantic (an oversized
  * bucket is near-certainly a duplicate FLOOD better handled by exact
  * dedup than by pairing).
  */
object Dedup {

  /** Fixed (i, a, b) permutation parameters for MinHash (shared with
    * the q23 oracle SQL).
    */
  val mhParams: Seq[(Int, Long, Long)] = Seq(
    (0, 1299721L, 15485863L), (1, 611953L, 32452843L),
    (2, 824633L, 49979687L), (3, 186583L, 67867967L),
    (4, 961751L, 86028121L), (5, 437071L, 104395301L),
    (6, 746777L, 122949823L), (7, 526363L, 141650939L))

  /** Per-doc (band, sig) rows from a shingle-hash array column `hs` —
    * 8 permutations min-folded map-side, 4 bands × 2 rows.
    */
  def bandSignatures(docs: DataFrame): DataFrame = {
    def mh(i: Int): Column = {
      val (_, a, b) = mhParams(i)
      array_min(transform(col("hs"), h => (lit(a) * h + lit(b)) % 2147483647L))
    }
    val bandStructs = (0 until 4).map { bd =>
      struct(lit(bd).as("band"),
        concat_ws(",", mh(2 * bd).cast("string"), mh(2 * bd + 1).cast("string")).as("sig"))
    }
    docs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Band buckets exceeding `maxBucket` (audit view: what a capped run
    * skipped — at 100 TB this goes to a quarantine table, mirroring the
    * ingest shim's md5 quarantine).
    */
  def oversized(bands: DataFrame, maxBucket: Int): DataFrame =
    bands.groupBy("band", "sig").agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)

  /** Candidate pairs (a_id < b_id, n_bands agreement count); buckets
    * larger than `maxBucket` (if set) are excluded.
    */
  def candidates(bands: DataFrame, maxBucket: Option[Int] = None): DataFrame = {
    val kept = maxBucket match {
      case None => bands
      case Some(cap) =>
        val sizes = bands.groupBy("band", "sig")
          .agg(count(lit(1)).as("__bucket_n"))
          .filter(col("__bucket_n") <= cap)
          .drop("__bucket_n")
        // same (band, sig) shuffle key as the self-join below
        bands.join(sizes, Seq("band", "sig"))
    }
    kept.as("x")
      .join(kept.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_bands"))
  }
}
