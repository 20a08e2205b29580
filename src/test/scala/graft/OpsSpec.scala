package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.IngestShim
import graft.ops.Skew

class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ingest shim: apply order, md5 sidecar validation, quarantine") {
    val dir = Files.createTempDirectory("shim-")
    def put(name: String, content: String, goodMd5: Option[Boolean]): Unit = {
      val p = dir.resolve(name)
      Files.writeString(p, content)
      goodMd5.foreach { good =>
        val digest = IngestShim.md5Hex(content.getBytes("UTF-8"))
        Files.writeString(dir.resolve(name + ".md5"),
          if (good) digest else "deadbeef" * 4)
      }
    }
    put("u2.json", "b", Some(true))
    put("u1.json", "a", Some(true))
    put("u3.json", "c", Some(false))  // corrupt -> quarantined
    put("u4.json", "d", None)         // no sidecar -> allowed
    Files.writeString(dir.resolve("notes.txt"), "ignored")

    val listed = IngestShim.listValidated(dir.toString, ".json")
    assert(listed.map(_.name) === Seq("u1.json", "u2.json", "u3.json", "u4.json"))
    assert(listed.map(_.md5Ok) === Seq(Some(true), Some(true), Some(false), None))
    assert(IngestShim.applyList(dir.toString, ".json").map(_.name) ===
      Seq("u1.json", "u2.json", "u4.json"))
  }

  test("salted aggregation equals plain aggregation on skewed keys") {
    // one hot key with 5000 rows, many cold keys
    val rows = (0 until 5000).map(i => ("hot", i.toLong)) ++
      (0 until 500).map(i => (s"cold_${i % 50}", i.toLong))
    val df = rows.toDF("k", "id")
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, col("k"), col("id"), 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("salted join equals plain join and spreads the hot key") {
    val big = ((0 until 4000).map(i => ("hot", i.toLong)) ++
      (0 until 400).map(i => (s"k$i", i.toLong))).toDF("k", "id")
    val small = (Seq("hot") ++ (0 until 400).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim_$i") }.toDF("k", "attr")
    val plain = big.join(small, "k").select("k", "id", "attr")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k", col("id"), 8)
      .select("k", "id", "attr")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    // the hot key's big-side rows actually land in multiple salt buckets
    val buckets = big.filter(col("k") === "hot")
      .select(Skew.salt(8, col("id"))).distinct().count()
    assert(buckets > 4)
  }
}
