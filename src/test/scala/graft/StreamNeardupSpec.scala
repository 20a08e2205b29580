package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.stream.StreamNeardup

/** Greedy incremental near-dup semantics (q141), driven batch by batch
  * so the properties the sf-data oracle may not exercise are pinned
  * deterministically: first-wins acceptance, rejected docs' bands NOT
  * entering the standing table, and Overwrite retry idempotence.
  */
class StreamNeardupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def batchOf(ids: (Long, String)*): (DataFrame, DataFrame) = {
    val docs = ids.toDF("doc_id", "text")
    val bands = graft.ops.Dedup.bandSignatures(
      docs.select(col("doc_id"),
        graft.functions.Hash32.shingleHashes(col("text")).as("hs")))
    (docs, bands)
  }

  private def verdicts(outRoot: java.io.File): Map[Long, (Long, Boolean)] =
    spark.read.parquet(StreamNeardup.subdirs(outRoot): _*)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap

  test("rejected doc's bands never enter the standing table") {
    val root = Files.createTempDirectory("snd-spec-").toFile
    val bandsRoot = new java.io.File(root, "bands")
    val outRoot = new java.io.File(root, "verdicts")
    // identical text => identical shingle sets => all 4 bands collide
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    val (d0, b0) = batchOf(1L -> t)
    val (d1, b1) = batchOf(2L -> t)
    val (d2, b2) = batchOf(3L -> t)
    StreamNeardup.step(spark, d0, b0, 0L, bandsRoot, outRoot)
    StreamNeardup.step(spark, d1, b1, 1L, bandsRoot, outRoot)
    StreamNeardup.step(spark, d2, b2, 2L, bandsRoot, outRoot)
    val v = verdicts(outRoot)
    assert(v(1L) === ((0L, true)))   // first wins
    assert(v(2L) === ((1L, false)))  // rejected against doc 1
    // doc 3 sees ONE partner (doc 1) — were doc 2's bands wrongly
    // added to the standing table, this would be 2
    assert(v(3L) === ((1L, false)))
  }

  test("distinct docs all accepted; retried batch id is idempotent") {
    val root = Files.createTempDirectory("snd-spec-").toFile
    val bandsRoot = new java.io.File(root, "bands")
    val outRoot = new java.io.File(root, "verdicts")
    val (d0, b0) = batchOf(
      1L -> "one two three four five six seven eight",
      2L -> "nine ten eleven twelve thirteen fourteen fifteen sixteen")
    val (d1, b1) = batchOf(
      3L -> "one two three four five six seven eight",
      4L -> "wholly different text with its own shingle set here")
    StreamNeardup.step(spark, d0, b0, 0L, bandsRoot, outRoot)
    StreamNeardup.step(spark, d1, b1, 1L, bandsRoot, outRoot)
    val first = verdicts(outRoot)
    assert(first(1L)._2 && first(2L)._2)  // batch 0 all accepted
    assert(first(3L) === ((1L, false)))   // dup of doc 1
    assert(first(4L)._2)                  // novel doc accepted
    // a retry of batch 1 rewrites the same subdirs — nothing changes
    StreamNeardup.step(spark, d1, b1, 1L, bandsRoot, outRoot)
    assert(verdicts(outRoot) === first)
    assert(StreamNeardup.subdirs(bandsRoot).size === 2)
  }
}
