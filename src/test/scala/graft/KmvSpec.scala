package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Kmv

/** The KMV aggregator's algebraic contract (what makes it safe as a
  * distributed partial aggregate) and its statistical one, both checked
  * without Spark — plus a Spark round-trip through udaf partial
  * aggregation pinned to a single-pass fold.
  */
class KmvSpec extends AnyFunSuite {
  private def agg(k: Int) = new Kmv.KmvAggregator(k)

  private def fold(a: Kmv.KmvAggregator, xs: Seq[Long]): Kmv.Buf =
    xs.foldLeft(a.zero)(a.reduce)

  test("exact below k: buffer is the distinct set, est is exact") {
    val a = agg(64)
    val xs = Seq.fill(500)(scala.util.Random.nextInt(40).toLong & 0xffffffffL)
    val out = a.finish(fold(a, xs))
    assert(out.n_min === xs.distinct.size)
    assert(out.est === xs.distinct.size.toLong)
  }

  test("merge == single fold for any split (map-side partials are safe)") {
    val rnd = new scala.util.Random(7)
    val a = agg(32)
    val xs = Seq.fill(2000)(rnd.nextLong().abs % (1L << 32))
    val whole = fold(a, xs)
    for (cut <- Seq(0, 1, 613, 1999, 2000)) {
      val (l, r) = xs.splitAt(cut)
      val merged = a.merge(fold(a, l), fold(a, r))
      assert(merged.mins.toSeq === whole.mins.toSeq, s"split at $cut")
    }
    // merge is also commutative
    val (l, r) = xs.splitAt(900)
    assert(a.merge(fold(a, l), fold(a, r)).mins.toSeq ===
      a.merge(fold(a, r), fold(a, l)).mins.toSeq)
  }

  test("estimator accuracy: within 4 std errors on uniform hashes") {
    // KMV relative std error ~= 1/sqrt(k-2); md5-derived h32 of
    // sequential ints is as uniform as the estimator assumes.
    val k = 256
    val a = agg(k)
    val trueD = 20000
    val hs = (1 to trueD).map(i => graft.functions.Portable.h32s(s"v$i"))
    assert(hs.distinct.size === trueD) // no h32 collisions in this range
    val out = a.finish(fold(a, hs ++ hs.take(5000))) // duplicates ignored
    val relErr = math.abs(out.est.toDouble - trueD) / trueD
    assert(relErr < 4.0 / math.sqrt(k - 2.0), s"est=${out.est} relErr=$relErr")
  }

  test("udaf path: distributed partial aggregation matches the fold") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val xs = Seq.fill(5000)(rnd.nextLong().abs % (1L << 32))
    val a = agg(128)
    val out = a.finish(fold(a, xs))
    val got = xs.toDF("h").repartition(7)
      .agg(Kmv.sketch(128)(org.apache.spark.sql.functions.col("h")).as("s"))
      .select("s.n_min", "s.kth", "s.est")
      .collect().head
    assert((got.getInt(0), got.getLong(1), got.getLong(2)) ===
      ((out.n_min, out.kth, out.est)))
  }

  test("BottomK: distributed grouped sampling == naive sorted take(k)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val rows = Seq.fill(3000)((rnd.nextInt(6), rnd.nextLong().abs % (1L << 62)))
    val naive = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(5)
    }
    val got = rows.toDF("g", "pk").repartition(11)
      .groupBy("g")
      .agg(graft.functions.BottomK.agg(5)(
        org.apache.spark.sql.functions.col("pk")).as("bk"))
      .collect()
      .map(r => r.getInt(0) -> r.getStruct(1).getSeq[Long](0).toSeq)
      .toMap
    assert(got === naive)
  }
}
