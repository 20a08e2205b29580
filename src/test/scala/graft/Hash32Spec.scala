package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.functions.{Hash32, Portable}

/** Parity of the codegen'd hash expressions with the Column-level
  * definitions they replace (and with the driver-side h32s twin).
  */
class Hash32Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("h32 scala twin matches the Catalyst md5 formula") {
    val texts = Seq("", "a", "hello world", "Ünïcødé ïs fine", "123 456")
    val viaSql = texts.toDF("s")
      .select(conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"))
      .collect().map(_.getLong(0))
    assert(viaSql.toSeq === texts.map(Hash32.h32))
    assert(viaSql.toSeq === texts.map(Portable.h32s))
  }

  test("ShingleHash32 expression ≡ HOF construction") {
    val texts = Seq("a b c d e f", "one two three", "", "x y z w",
      "a  b c d e")  // double space -> empty token, like split(' ')
    val df = texts.toDF("text")
    val viaExpr = df.select(Hash32.shingleHashes(col("text")))
      .collect().map(_.getSeq[Long](0))
    val ws = split(col("text"), " ")
    val viaHof = df.select(
      when(size(ws) >= 4, transform(sequence(lit(1), size(ws) - 3), i =>
        conv(substring(md5(concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
          element_at(ws, i + 2), element_at(ws, i + 3))), 1, 8), 16, 10).cast("long")))
        .otherwise(array().cast("array<long>")))
      .collect().map(_.getSeq[Long](0))
    assert(viaExpr.toSeq === viaHof.toSeq)
  }

  test("DistinctTokenHash32 ≡ array_distinct+transform; property over random text") {
    val textGen = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "", "dd")).map(_.mkString(" "))
    val samples = Gen.listOfN(40, textGen).sample.get
    val df = samples.toDF("text")
    val viaExpr = df.select(Hash32.tokenHashes(col("text"))).collect().map(_.getSeq[Long](0))
    val viaHof = df.select(
      transform(array_distinct(split(col("text"), " ")),
        w => conv(substring(md5(w), 1, 8), 16, 10).cast("long")))
      .collect().map(_.getSeq[Long](0))
    assert(viaExpr.toSeq === viaHof.toSeq)
  }

  test("BigramStats32 ≡ explode+double-aggregation; property over random text") {
    val textGen = Gen.choose(2, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "")).map(_.mkString(" ")))
    val samples = Gen.listOfN(60, textGen).sample.get
    val got = samples.toDF("text")
      .select(Hash32.bigramStatsCol(col("text")).as("st"))
      .select("st.n_bigrams", "st.n_distinct", "st.top_cnt", "st.dup_occ")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = samples.map { t =>
      val ws = t.split(" ", -1)
      val grams = ws.sliding(2).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      (grams.size.toLong, counts.size.toLong,
        if (counts.isEmpty) 0L else counts.values.max,
        counts.values.filter(_ > 1L).sum)
    }
    assert(got.toSeq === want)
  }

  test("pure-scala shingles match python-style slide") {
    val prop = Prop.forAll(Gen.listOf(Gen.alphaStr.map(_.take(4)))) { words =>
      val text = words.mkString(" ")
      val toks = text.split(" ", -1)
      val expected =
        if (toks.length < 4) Seq.empty
        else (0 until toks.length - 3).map(i => Hash32.h32(toks.slice(i, i + 4).mkString(" ")))
      Hash32.shingles(text).toSeq == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.toString)
  }
  test("BlockSig60 equals the HOF transform+aggregate formulation") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text"))
      .union(Seq("", "a", "ab cd", "x" * 200).toDF("text"))
    val hof = docs.select(expr("""
        aggregate(
          transform(sequence(0, 59), i ->
            shiftleft(
              CAST(conv(substring(md5(substring(text,
                CAST(1 + i * greatest(length(text) div 60, 1) AS INT),
                CAST(greatest(length(text) div 60, 1) AS INT))), 1, 8),
                16, 10) AS BIGINT) % 2,
              i)),
          CAST(0 AS BIGINT), (a, x) -> a + x)""").as("sig"))
    val native = docs.select(
      graft.functions.Hash32.blockSigCol(col("text")).as("sig"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
      "native block signature must equal the HOF formulation bit-for-bit")
  }
  test("HashedMargin equals the aggregate-over-tokens fold") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text"))
      .union(Seq("", "one", "a b  c").toDF("text"))
    val weight = (t: org.apache.spark.sql.Column) =>
      pmod(Portable.h32(concat(lit("w:"),
        pmod(Portable.h32(t), lit(4096L)).cast("string"))),
        lit(2001L)) - lit(1000L)
    val hof = docs.select(aggregate(split(col("text"), " "), lit(0L),
      (acc, t) => acc + weight(t)).as("m"))
    val native = docs.select(Hash32.hashedMarginCol(col("text")).as("m"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
      "native margin must equal the interpreted fold bit-for-bit")
  }
}
