package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash-LSH banded candidate generation, shared by the q23 entry and
  * the adversarial-robustness guard (round-2 verdict item 7).
  *
  * Bucket-size blowup: a flood of identical (or signature-identical)
  * documents lands in ONE band bucket, and within-bucket pair
  * generation is quadratic in the bucket size. Two-layer mitigation,
  * in order:
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
  * Scale shape: [[bucketPairs]] groups each bucket once and emits its
  * pairs through pipelined generators — one shuffle, no self-join, and
  * the cap is a free filter on the collected bucket; the cap turns the
  * worst-case quadratic bucket into a skipped key — the same move as
  * AQE's skew-join splitting, but semantic (an oversized bucket is
  * near-certainly a duplicate FLOOD better handled by exact dedup than
  * by pairing).
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
    * 8 permutations min-folded map-side, 4 bands × 2 rows. The fold
    * runs in ONE codegen'd pass over the array
    * ([[graft.functions.Hash32.minhashBandSigsCol]]); the previous 8
    * `array_min(transform(…))` HOFs were interpreted and materialized
    * 8 permuted copies of the array per document (round 16, guide §4:
    * prefer codegen expressions over per-element lambdas in the hot
    * path).
    */
  def bandSignatures(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(graft.functions.Hash32.minhashBandSigsCol(col("hs"))).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))

  /** Band buckets exceeding `maxBucket` (audit view: what a capped run
    * skipped — at 100 TB this goes to a quarantine table, mirroring the
    * ingest shim's md5 quarantine).
    */
  def oversized(bands: DataFrame, maxBucket: Int): DataFrame =
    bands.groupBy("band", "sig").agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)

  /** Ordered id pairs (a_id < b_id) of rows sharing a bucket key —
    * the candidate-generation core shared by every blocked similarity
    * join in the repo (MinHash bands, prefix-filter features,
    * random-hyperplane bands).
    *
    * Shape: ONE shuffle (the groupBy on the bucket key), then two
    * pipelined codegen'd Generates emit the within-bucket pairs —
    * no self-join, so the upstream pipeline that produces `rows`
    * (shingle hashing, df ordering, band hashing…) is evaluated ONCE
    * instead of once per join side, and no join build side is
    * materialized. The bucket-size cap is a plain filter on the
    * collected bucket (`size(ids) <= cap`): the former
    * count-aggregate + co-partitioned join pre-pass is gone.
    *
    * A bucket of k ids streams k² pair rows through the generators
    * (never materialized as one array beyond the k-element id list
    * itself, ≤8·cap bytes/row under a cap), so the quadratic worst
    * case is bounded exactly as before — buckets × cap².
    */
  def bucketPairs(
      rows: DataFrame,
      idCol: String,
      keyCols: Seq[String],
      maxBucket: Option[Int] = None): DataFrame = {
    val buckets = rows
      .groupBy(keyCols.map(col): _*)
      .agg(collect_list(col(idCol)).as("__ids"))
    val kept = maxBucket.fold(buckets)(cap =>
      buckets.filter(size(col("__ids")) <= cap))
    kept
      .filter(size(col("__ids")) > 1)
      .select(explode(col("__ids")).as("a_id"), col("__ids"))
      .select(col("a_id"), explode(col("__ids")).as("b_id"))
      .filter(col("a_id") < col("b_id"))
  }

  /** [[bucketPairs]] with PAYLOAD columns carried through the bucket
    * shuffle and emitted on both sides of every pair (`a_<p>` /
    * `b_<p>`): the FUSED-VERIFY shape for blocked similarity joins
    * whose verification needs per-row payload (q25's embedding
    * vectors past broadcast scale).
    *
    * WHY this exists (round-15 finding): verifying candidates by
    * re-JOINING the pair stream against the payload table is the
    * broadcast shape — past the broadcast threshold it forces the
    * SECOND join to re-shuffle the pair stream WITH the first side's
    * payload attached. At the 4×-sf1 probe (2.17 G candidate rows ×
    * ~540 B of vector+norm) that intermediate is ~1.2 TB of shuffle
    * — it filled a 76 GB disk before dying, and no cluster wants it
    * either. Fusing instead puts the payload on the BUCKET rows: the
    * one (bucket-key) shuffle grows by the payload factor (19.8 M ×
    * ~540 B ≈ 10 GB at the same probe — 100× less), and the k²
    * pair-payload rows exist only INSIDE the post-shuffle
    * WholeStageCodegen span (Generate → project → filter), never
    * shuffled, never spilled: the verify arithmetic and the
    * selectivity filter run at pair-generation time and only
    * survivors leave the stage.
    */
  def bucketPairsCarrying(
      rows: DataFrame,
      idCol: String,
      keyCols: Seq[String],
      payloadCols: Seq[String],
      maxBucket: Option[Int] = None): DataFrame = {
    val buckets = rows
      .groupBy(keyCols.map(col): _*)
      .agg(collect_list(struct((idCol +: payloadCols).map(col): _*))
        .as("__rows"))
    val kept = maxBucket.fold(buckets)(cap =>
      buckets.filter(size(col("__rows")) <= cap))
    kept
      .filter(size(col("__rows")) > 1)
      .select(explode(col("__rows")).as("__a"), col("__rows"))
      .select(col("__a"), explode(col("__rows")).as("__b"))
      .filter(col("__a")(idCol) < col("__b")(idCol))
      .select(
        col("__a")(idCol).as("a_id") +: col("__b")(idCol).as("b_id") +:
          (payloadCols.map(p => col("__a")(p).as(s"a_$p")) ++
            payloadCols.map(p => col("__b")(p).as(s"b_$p"))): _*)
  }

  /** Candidate pairs (a_id < b_id, n_bands agreement count); buckets
    * larger than `maxBucket` (if set) are excluded.
    */
  def candidates(bands: DataFrame, maxBucket: Option[Int] = None): DataFrame =
    bucketPairs(bands, "doc_id", Seq("band", "sig"), maxBucket)
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_bands"))

  /** EXACT pigeonhole blocking for Hamming-distance joins (Manku,
    * Jain & Sarma, WWW'07 §3 — the scalable construction, not the
    * fixed two-half split): a `bits`-wide fingerprint is cut into
    * `blocks` equal slices; a pair within Hamming distance k damages
    * at most k slices, so it AGREES on the fingerprint masked by at
    * least one of the C(blocks, k) "zero these k slices" masks.
    * Bucketing on (mask_idx, fingerprint & mask) therefore finds
    * EVERY such pair — the blocking is exact, never probabilistic,
    * which is why the all-pairs oracles of q152/q214 validate any
    * block count: a wrong mask set would LOSE pairs and fail the
    * compare at every scale.
    *
    * The block count is the SCALE knob ([[pigeonholeBlocksFor]]):
    * more blocks ⇒ wider matched bits (32·(b−k)/b) ⇒ exponentially
    * smaller buckets, at the linear cost of C(b, k) keys per row.
    * A FIXED split (the pre-round-13 2×16 / 4×15) makes expected
    * candidates grow N²/2^w — the last member of the fixed-width
    * quadratic class; Manku's 8B-doc configs match 30+ bits for
    * exactly this reason.
    */
  def pigeonholeMasks(bits: Int, blocks: Int, k: Int): Seq[Long] = {
    require(blocks >= 2, "pigeonholeMasks: need at least 2 blocks")
    require(bits > 0 && bits <= 64 && bits % blocks == 0,
      s"pigeonholeMasks: blocks=$blocks must divide bits=$bits (<=64)")
    require(k >= 1 && k < blocks,
      s"pigeonholeMasks: need 1 <= k < blocks, got k=$k blocks=$blocks")
    val bw = bits / blocks
    val blockMask = (1L << bw) - 1  // bw <= 32, shift is safe
    // bits == 64 (the simhash-64 production fingerprint) fills the
    // whole long; 1L << 64 would wrap, so special-case the full mask
    val full = if (bits == 64) -1L else (1L << bits) - 1
    (0 until blocks).combinations(k).map { zeroed =>
      zeroed.foldLeft(full)((m, j) => m & ~(blockMask << (j * bw)))
    }.toSeq
  }

  /** Smallest admissible block count whose matched-bit width
    * w = bits·(b−k)/b reaches min(max available w, floor(log2 N) + 4)
    * — i.e. expected per-mask RANDOM collisions N²/2^w stay ≲ N/16,
    * the same bucket-size target as the LSH planesFor schedule. At
    * the committed scales this resolves to the historical splits
    * (q152: 2 blocks for the 500–5000-doc fixtures; q214: 4 blocks
    * at ≤ ~4k docs) and grows past them exactly when the fixed width
    * would start going quadratic (q152: 4 blocks / 24 matched bits
    * at sf1's 50k docs up to ~2^20, 8 / 28 to ~2^24, 16 / 30 beyond;
    * past ~2^26 the right move is a 64-bit fingerprint, where the
    * same masks widen to 60+ matched bits — PigeonholeSpec pins the
    * boundary resolutions).
    */
  def pigeonholeBlocksFor(n: Long, bits: Int, k: Int, choices: Seq[Int]): Int = {
    require(n >= 1 && choices.nonEmpty)
    def width(b: Int) = bits - bits * k / b
    val log2n = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val target = math.min(choices.map(width).max, log2n + 4)
    choices.sorted.find(width(_) >= target).getOrElse(choices.max)
  }
}
