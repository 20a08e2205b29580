package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry
import graft.stream.TableStore

/** q150 version diff: the change-data-feed invariant — replaying the
  * diff onto the FROM version must reproduce the TO version exactly.
  */
class VersionDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q150: diff applied to v3 reproduces the final version") {
    val root = java.nio.file.Files.createTempDirectory("graft-vds-").toString
    val store = new TableStore(spark, root, "user_id")
    val ev = Tables.events(spark, sf)
      .withColumn("batch", pmod(col("event_id"), lit(5)))
    for (b <- 0 until 5) {
      val up = ev.filter(col("batch") === b && col("event_type") =!= "error")
        .select(col("user_id"), col("event_type").as("last_type"),
          col("value").as("last_value"),
          struct(col("ts"), col("event_id")).as("seq"))
      val del = ev.filter(col("batch") === b && col("event_type") === "error")
        .select(col("user_id"))
      store.merge("state", up, del, s"batch_$b")
    }
    def state(df: org.apache.spark.sql.DataFrame): Map[Long, (String, Double)] =
      df.select("user_id", "last_type", "last_value").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    val v3 = state(store.snapshotAt("state", 3).get)
    val fin = state(store.snapshot("state").get)

    val diff = Registry.byName("q150_version_diff").fn(spark, sf).collect()
    assert(diff.nonEmpty)
    val replayed = diff.foldLeft(v3) { (m, r) =>
      r.getString(0) match {
        case "delete" => m - r.getLong(1)
        case "insert" | "update" =>
          m + (r.getLong(1) -> ((r.getString(4), r.getDouble(5))))
      }
    }
    assert(replayed === fin, "replaying the diff onto v3 did not land on final")
    // every reported change is a real change
    diff.foreach { r =>
      val id = r.getLong(1)
      r.getString(0) match {
        case "insert" => assert(!v3.contains(id) && fin.contains(id))
        case "delete" => assert(v3.contains(id) && !fin.contains(id))
        case "update" => assert(v3(id) !== fin(id))
      }
    }
    queries.Scratch.rmTree(root)
  }
}
