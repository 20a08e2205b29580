package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, Hash32, VecOps}

/** The pure-SQL surface: every graft native expression is registered
  * as a SQL function (via GraftFunctions.register on a live session /
  * graft.GraftExtensions at session build), and resolves to the SAME
  * expression the Column API builds.
  */
class SqlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = { // registration-once, then plain SQL
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }

  test("shingle_h32 / distinct_token_h32 / simhash32 from SQL ≡ Column API") {
    import spark.implicits._
    val df = Seq("a b c d e f", "x y", "one two three four").toDF("text")
    df.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT shingle_h32(text) AS sh, distinct_token_h32(text) AS th,
         simhash32(text) AS sim FROM sqlfn_docs""").collect()
    val viaCol = df.select(Hash32.shingleHashes(col("text")).as("sh"),
      Hash32.tokenHashes(col("text")).as("th"),
      Hash32.simhashCol(col("text")).as("sim")).collect()
    assert(viaSql.map(_.toString).toSeq === viaCol.map(_.toString).toSeq)
  }

  test("bigram_stats32 struct fields are addressable from SQL") {
    val r = spark.sql(
      """SELECT st.n_bigrams, st.n_distinct, st.top_cnt, st.dup_occ
         FROM (SELECT bigram_stats32('a b a b a') AS st)""").collect().head
    // bigrams: "a b","b a","a b","b a" -> 4 occurrences, 2 distinct
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 2L, 2L, 4L)))
  }

  test("dot_product / squared_norm from SQL") {
    val r = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
         squared_norm(array(3.0D, 4.0D)) AS n2""").collect().head
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 25.0)
  }

  test("rct_class and mesh_for from SQL") {
    val r = spark.sql(
      """SELECT rct_class('a double-blind randomised controlled trial') AS c,
         size(mesh_for('alpha beta gamma delta', 0)) AS m""").collect().head
    assert(r.getString(0) === "RCT")
    val expected = "alpha beta gamma delta".split(" ").count(Hash32.h32(_) % 3 == 0)
    assert(r.getInt(1) === expected)
  }

  test("rh_probed_band_keys is SQL-callable and agrees with the Column API") {
    val arr = (1 to 64).map(i => (if (i % 3 == 0) -1 else 1) * i / 64.0)
    val sqlArr = arr.mkString("array(", ", ", ")")
    val viaSql = spark.sql(s"SELECT rh_probed_band_keys($sqlArr, 9, 2)")
      .collect().head.getSeq[Int](0)
    import spark.implicits._
    val viaCol = Seq(arr).toDF("v")
      .select(graft.functions.RhOps.probedBandKeysCol(col("v"), 9, 2))
      .collect().head.getSeq[Int](0)
    assert(viaSql === viaCol)
    assert(viaSql.length === 4 * 3)
  }

  test("mesh_for rejects a non-literal field index") {
    val err = intercept[Exception] {
      spark.sql("SELECT mesh_for('a b', CAST(rand() * 3 AS INT))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }

  test("GraftExtensions injects the full function list") {
    val ext = new SparkSessionExtensions
    (new GraftExtensions)(ext) // must inject without throwing
    // and the shared registry carries every expected name
    val names = GraftFunctions.all.map(_._1.funcName).toSet
    assert(names === Set("shingle_h32", "bigram_h32", "distinct_token_h32",
      "simhash32", "bigram_stats32", "mesh_for", "dot_product",
      "squared_norm", "rh_band_keys", "rh_probed_band_keys", "rct_class"))
  }
}
