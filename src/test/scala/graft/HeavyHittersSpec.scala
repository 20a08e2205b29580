package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HeavyHitters

/** The Misra–Gries summary's two contracts: the deterministic error
  * bound (no item with frequency > N/(m+1) can be missing, for ANY
  * fold/merge tree — what makes the q90 candidate pass sound), and the
  * exactness of the confirmed output regardless of how the input is
  * partitioned (the merge-order-dependence of the raw summary must not
  * leak into the final result).
  */
class HeavyHittersSpec extends AnyFunSuite {

  private def fold(a: HeavyHitters.MgAggregator, xs: Seq[String]) =
    xs.foldLeft(a.zero)(a.reduce)

  /** Zipf-ish corpus: token i appears ~ n/i times, shuffled. */
  private def zipf(n: Int, vocab: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val xs = (1 to vocab).flatMap(i => Seq.fill(math.max(n / i, 1))(s"w$i"))
    rnd.shuffle(xs)
  }

  test("error bound: counts undercount by at most N/(m+1), never over") {
    val m = 31
    val a = new HeavyHitters.MgAggregator(m)
    val xs = zipf(2000, 300, seed = 11)
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = xs.size.toLong / (m + 1)
    val out = a.finish(fold(a, xs))
    val mg = out.words.zip(out.counts).toMap
    assert(out.words.length <= m)
    mg.foreach { case (w, c) =>
      assert(c <= exact(w), s"$w overcounted: $c > ${exact(w)}")
      assert(c >= exact(w) - bound, s"$w undercounted past the bound")
    }
    // completeness: every item above the bound is present
    exact.filter(_._2 > bound).keys.foreach(w =>
      assert(mg.contains(w), s"heavy item $w missing from summary"))
  }

  test("merge keeps the bound for any split and any merge tree") {
    val m = 15
    val a = new HeavyHitters.MgAggregator(m)
    val xs = zipf(1500, 200, seed = 23)
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = xs.size.toLong / (m + 1)
    for (parts <- Seq(2, 3, 7, 13)) {
      val chunks = xs.grouped(math.max(xs.size / parts, 1)).toSeq
      val bufs = chunks.map(fold(a, _))
      // left fold merge and a balanced-tree merge must both respect it
      val linear = bufs.reduce(a.merge)
      val tree = bufs.reduceRight(a.merge)
      for (b <- Seq(linear, tree)) {
        val mg = b.words.zip(b.counts).toMap
        assert(b.words.length <= m)
        exact.filter(_._2 > bound).keys.foreach(w =>
          assert(mg.contains(w), s"parts=$parts: heavy item $w missing"))
        mg.foreach { case (w, c) => assert(c <= exact(w)) }
      }
    }
  }

  test("confirmed output is exact and partition-invariant through Spark") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val xs = zipf(3000, 250, seed = 41)
    val thr = math.ceil(0.01 * xs.size).toLong
    val expected = xs.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toSeq.sorted
    val mg = HeavyHitters.agg(127)
    for (parts <- Seq(1, 5, 32)) {
      val ds = xs.toDF("w").repartition(parts)
      val cands = ds.agg(mg(col("w")).as("hh"))
        .head().getStruct(0).getAs[scala.collection.Seq[String]]("words").toSeq
      val confirmed = ds.filter(col("w").isin(cands: _*))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= thr)
        .as[(String, Long)].collect().sorted.toSeq
      assert(confirmed === expected, s"parts=$parts")
    }
  }
}
