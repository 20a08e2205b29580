package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Ris
import graft.query.Pico
import graft.query.Pico.{PicoQuery, PicoTerm}

/** Result sinks: RIS export (S11, ris.py:112-128 dumps shape) and JSON
  * row shaping (S12, cnxapp retmode handling) — round-tripped through
  * their own parsers.
  */
class SinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val results = Pico.search(spark, "/root/testdata/sf0.001",
    PicoQuery(Seq(PicoTerm("population", "C10")))).limit(5).collect()

  test("RIS export of picosearch results round-trips through the parser") {
    val records: Seq[Ris.Record] = results.toSeq.map { r =>
      Seq(
        "TY" -> Seq("JOUR"),
        "ID" -> Seq(r.getAs[Long]("id").toString),
        "TI" -> Seq("doc " + r.getAs[Long]("id")),
        "M3" -> Seq(r.getAs[String]("article_type")))
    }
    assert(records.nonEmpty)
    val text = Ris.dumps(records)
    assert(Ris.loads(text) === records)
  }

  test("JSON sink: toJSON rows parse back with identical fields") {
    val df = Pico.search(spark, "/root/testdata/sf0.001",
      PicoQuery(Seq(PicoTerm("population", "C10")))).limit(5)
    val jsons = df.toJSON.collect()
    assert(jsons.nonEmpty)
    val back = spark.read.json(spark.createDataset(jsons.toSeq)(
      org.apache.spark.sql.Encoders.STRING))
    val orig = df.select(col("id"), col("article_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val rt = back.select(col("id"), col("article_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rt === orig)
  }
}
