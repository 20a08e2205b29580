package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.LogDigest

/** The mergeable log-histogram quantile sketch: integer-exact binning
  * invariants, aggregation-order-insensitive results, bounded state,
  * and the headline guarantee — reconstructed quantiles within 1/S
  * relative error of the exact ones.
  */
class LogDigestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binOf/lowerBound invariants across the whole range") {
    for (s <- Seq(4, 16, 64); x <- (1L to 2000L) ++ Seq(1L << 20, (1L << 40) + 12345L)) {
      val bin = LogDigest.binOf(x, s)
      val lb = LogDigest.lowerBound(bin, s)
      assert(lb <= x, s"s=$s x=$x: lower bound $lb above member")
      assert(LogDigest.binOf(lb, s) === bin, s"s=$s x=$x: lb not in own bin")
      // bin ids are monotone in x
      assert(LogDigest.binOf(x + 1, s) >= bin)
      // relative width guarantee: next bin starts within x * (1 + 1/s) + 1
      val nextLb = LogDigest.lowerBound(bin + 1, s)
      assert(nextLb <= lb + lb / s + 1, s"s=$s bin=$bin too wide")
    }
  }

  test("values below S per octave bin exactly") {
    val s = 16
    for (x <- 1L to 15L)
      assert(LogDigest.lowerBound(LogDigest.binOf(x, s), s) === x)
  }

  test("sketch is partition-order insensitive and bounded in size") {
    val xs = (1 to 5000).map(_ => (scala.util.Random.nextInt(1 << 20) + 1).toLong)
    val a = xs.toDF("x").repartition(13)
      .agg(LogDigest.sketch(16)(col("x")).as("sk")).select("sk.bins", "sk.counts")
      .collect().head
    val b = xs.reverse.toDF("x").repartition(3)
      .agg(LogDigest.sketch(16)(col("x")).as("sk")).select("sk.bins", "sk.counts")
      .collect().head
    def arr(r: org.apache.spark.sql.Row, i: Int) =
      r.getAs[scala.collection.Seq[Long]](i).toSeq
    assert(arr(a, 0) === arr(b, 0) && arr(a, 1) === arr(b, 1),
      "sketch depends on aggregation order")
    // bounded state: S sub-bins x 20 octaves for x < 2^20
    assert(arr(a, 0).length <= 16 * 21)
    assert(arr(a, 1).sum === 5000L)
  }

  test("reconstructed quantiles are within 1/S relative error of exact") {
    val rnd = new scala.util.Random(19)
    // lognormal-ish heavy tail, the regime the log bins are built for
    val xs = (1 to 4000).map(_ => math.exp(rnd.nextGaussian() * 2 + 6).toLong.max(1L))
    val s = 16
    val out = xs.toDF("x").agg(LogDigest.sketch(s)(col("x")).as("sk"))
      .select("sk.bins", "sk.counts").collect().head
    val bins = out.getAs[scala.collection.Seq[Long]](0).toSeq
    val counts = out.getAs[scala.collection.Seq[Long]](1).toSeq
    val n = xs.length
    val sortedXs = xs.sorted
    for (p <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val rank = math.ceil(p * n).toLong
      // sketch pick: first bin whose cumulative count reaches the rank
      var cum = 0L; var lb = -1L
      bins.zip(counts).foreach { case (b, c) =>
        if (lb < 0) { cum += c; if (cum >= rank) lb = LogDigest.lowerBound(b, s) }
      }
      val exact = sortedXs(rank.toInt - 1)
      assert(lb <= exact, s"p=$p: lb $lb above exact $exact")
      val relErr = (exact - lb).toDouble / exact
      assert(relErr <= 1.0 / s + 1e-9,
        s"p=$p: relative error $relErr exceeds 1/$s (lb=$lb exact=$exact)")
    }
  }

  test("non-positive input is rejected loudly at the binning layer") {
    intercept[IllegalArgumentException](LogDigest.binOf(0L, 16))
    intercept[IllegalArgumentException](LogDigest.binOf(-5L, 16))
  }
}
