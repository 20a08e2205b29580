package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry
import graft.functions.Portable

/** q147 split-leakage audit: the class partition must cover exactly
  * the LSH candidate pair set, and the leak flag / split labels must
  * replay q70's hash-bucket assignment.
  */
class SplitLeakageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q147: classes partition the candidate pair set and label leaks") {
    val out = Registry.byName("q147_split_leakage").fn(spark, sf).collect()
    assert(out.nonEmpty)
    val splits = Set("train", "val", "test")
    out.foreach { r =>
      val (lo, hi, leaks) = (r.getString(0), r.getString(1), r.getBoolean(4))
      assert(splits(lo) && splits(hi) && lo <= hi)
      assert(leaks === (lo != hi))
    }
    // total pairs across classes == the uncapped candidate set
    val docs = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 4)
      .select(col("doc_id"),
        graft.functions.Hash32.shingleHashes(col("text")).as("hs"))
    val nCand = graft.ops.Dedup
      .candidates(graft.ops.Dedup.bandSignatures(docs)).count()
    assert(out.map(_.getLong(2)).sum === nCand)
    // spot-check one class's membership checksum against a driver-side
    // recomputation of the split labels
    def splitOf(id: Long): String = {
      val b = Portable.h32s(id.toString) % 100L
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val pairs = graft.ops.Dedup
      .candidates(graft.ops.Dedup.bandSignatures(docs))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.groupBy { case (a, b) =>
      val (sa, sb) = (splitOf(a), splitOf(b))
      (Seq(sa, sb).min, Seq(sa, sb).max)
    }.view.mapValues(ps => (ps.length.toLong, ps.map { case (a, b) => a * 1000000L + b }.sum)).toMap
    out.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(expected(key) === ((r.getLong(2), r.getLong(3))),
        s"class $key count/checksum mismatch")
    }
  }
}
