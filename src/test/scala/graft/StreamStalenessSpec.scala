package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.stream.StreamStaleness

/** Streaming-regime pins for q254 beyond its DuckDB oracle: the
  * zero-drift law (a window identical to the build batch scores zero
  * shift), retry idempotence (Overwrite-per-batch-id), and the
  * empty-window guard (an idle source tick must emit a well-formed
  * zero-count reading, not nulls — this round's StreamCusum lesson).
  */
class StreamStalenessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Tiny batches: adaptiveMod(N<=32) = 1, so EVERY vector is its own
  // centroid — the degenerate-but-valid small-stream regime
  private def mkBatch(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, Array(1.0f * (i % 7), 1.0f, 2.0f + (i % 3))))
      .toDF("vec_id", "embedding")
  }

  test("q254 step: a window identical to the build batch has zero shift") {
    val root = java.nio.file.Files.createTempDirectory("stl-spec-").toString
    val ids = Seq(1L, 5L, 9L, 26L, 30L, 47L)
    StreamStaleness.step(mkBatch(ids), 0L, s"$root/c", s"$root/r", s"$root/v")
    StreamStaleness.step(mkBatch(ids), 1L, s"$root/c", s"$root/r", s"$root/v")
    val row = spark.read.parquet(s"$root/v/b1").head()
    assert(row.getAs[Long]("n_ref") === ids.length.toLong)
    assert(row.getAs[Long]("n_cur") === ids.length.toLong)
    assert(row.getAs[Long]("n_new") === 0L)
    assert(row.getAs[Long]("n_drifted") === 0L)
    assert(row.getAs[Long]("max_shift_e6") === 0L,
      "identical windows must show zero occupancy shift")
    graft.queries.Scratch.rmTree(root)
  }

  test("q254 step: retry rewrites the identical verdict; drift detected") {
    val root = java.nio.file.Files.createTempDirectory("stl-spec-").toString
    StreamStaleness.step(mkBatch(Seq(1L, 5L, 9L, 26L)), 0L,
      s"$root/c", s"$root/r", s"$root/v")
    // all mass in different cells than the build distribution
    val w = mkBatch(Seq(2L, 16L, 23L, 44L, 58L))
    StreamStaleness.step(w, 1L, s"$root/c", s"$root/r", s"$root/v")
    val first = spark.read.parquet(s"$root/v/b1").collect().toSeq
    StreamStaleness.step(w, 1L, s"$root/c", s"$root/r", s"$root/v")
    val second = spark.read.parquet(s"$root/v/b1").collect().toSeq
    assert(first === second, "retry must rewrite the same artifact")
    assert(first.head.getAs[Long]("max_shift_e6") > 0L)
    graft.queries.Scratch.rmTree(root)
  }

  test("q254 step: an empty monitoring window emits a zero reading") {
    val root = java.nio.file.Files.createTempDirectory("stl-spec-").toString
    StreamStaleness.step(mkBatch(Seq(1L, 5L, 26L)), 0L,
      s"$root/c", s"$root/r", s"$root/v")
    StreamStaleness.step(mkBatch(Seq.empty), 1L,
      s"$root/c", s"$root/r", s"$root/v")
    val row = spark.read.parquet(s"$root/v/b1").head()
    assert(row.getAs[Long]("n_cur") === 0L)
    assert(row.getAs[Long]("n_new") === 0L)
    // every build cell lost all its share: shift = its full share
    assert(row.getAs[Long]("max_shift_e6") > 0L)
    assert(!row.anyNull, "empty window must not emit nulls")
    graft.queries.Scratch.rmTree(root)
  }

  test("q254 step: an empty FIRST batch defers the build, not freezes it") {
    val root = java.nio.file.Files.createTempDirectory("stl-spec-").toString
    // idle tick before any data: no codebook, no histogram, no verdict
    StreamStaleness.step(mkBatch(Seq.empty), 0L,
      s"$root/c", s"$root/r", s"$root/v")
    assert(!new java.io.File(s"$root/c").exists(),
      "an empty build batch must not freeze an empty codebook")
    // the first NON-EMPTY batch becomes the build...
    StreamStaleness.step(mkBatch(Seq(1L, 5L, 9L, 26L)), 1L,
      s"$root/c", s"$root/r", s"$root/v")
    assert(new java.io.File(s"$root/c").exists())
    // ...and later windows score against it (not against themselves)
    StreamStaleness.step(mkBatch(Seq(1L, 5L, 9L, 26L)), 2L,
      s"$root/c", s"$root/r", s"$root/v")
    val row = spark.read.parquet(s"$root/v/b2").head()
    assert(row.getAs[Long]("n_ref") === 4L)
    assert(row.getAs[Long]("max_shift_e6") === 0L)
    // a RETRY of the build batch rebuilds (idempotent), never scores
    StreamStaleness.step(mkBatch(Seq(1L, 5L, 9L, 26L)), 1L,
      s"$root/c", s"$root/r", s"$root/v")
    assert(!new java.io.File(s"$root/v/b1").exists(),
      "a retried build batch must rebuild, not emit a verdict")
    graft.queries.Scratch.rmTree(root)
  }

  test("q254 step: codebook sizes adaptively from the build batch and is loaded whole") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("stl-spec-").toString
    // two clean clusters: ids 1..220 point along (1,0), 221..400 along
    // (0,1); sampled centroids (adaptiveMod(400)=20 -> cids ≡ 1 mod 20)
    // exist in both clusters, so every A-vector ties to cid 1 and every
    // B-vector to cid 221
    val batch = (1L to 400L).map { i =>
      (i, if (i <= 220L) Array(1.0f, 0.0f) else Array(0.0f, 1.0f))
    }.toDF("vec_id", "embedding")
    StreamStaleness.step(batch, 0L, s"$root/c", s"$root/r", s"$root/v")
    val cids = spark.read.parquet(s"$root/c")
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(cids.toSeq === (1L to 400L by 20L).toSeq,
      "build must sample the codebook at adaptiveMod(batch size)")
    val hist = spark.read.parquet(s"$root/r").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("c")).toMap
    // cell 221 is NOT ≡ 1 mod 25: a cellsOf that re-sampled the
    // persisted codebook with a fixed modulus would lose it and land
    // the B cluster on a surviving A-side centroid instead
    assert(hist === Map(1L -> 220L, 221L -> 180L),
      "scoring must load the persisted codebook whole (no re-sampling)")
    graft.queries.Scratch.rmTree(root)
  }

  test("q254: streamed readings cover both non-build windows") {
    val rows = graft.queries.Registry.byName("q254_stream_staleness")
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getAs[Long]("window_id")).toSeq === Seq(1L, 2L))
    val total = Tables.embeddings(spark, "/root/testdata/sf0.001").count()
    val nonBuild = rows.map(_.getAs[Long]("n_cur")).sum
    val build = rows.map(_.getAs[Long]("n_ref")).distinct
    assert(build.length === 1, "frozen reference must be identical")
    assert(build.head + nonBuild === total,
      "windows must partition the vector corpus")
  }
}
