package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.functions.HeavyHitters

/** Streaming companion to q90: the Misra–Gries summary maintained
  * INCREMENTALLY by a streaming aggregation — the state store carries
  * the O(m) buffer between micro-batches, so "what's trending in the
  * ingest feed" never shuffles the vocabulary and never grows state
  * with it. The MG completeness bound is what makes this sound: after
  * any number of micro-batches, every token above N/(m+1) of the
  * stream so far must be present in the summary.
  */
class StreamHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("MG summary over micro-batches keeps every heavy token") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(13)
    // zipf-ish stream in two bursts with different hot sets
    val burst1 = rnd.shuffle((1 to 150).flatMap(i =>
      Seq.fill(math.max(600 / i, 1))(s"a$i")))
    val burst2 = rnd.shuffle((1 to 150).flatMap(i =>
      Seq.fill(math.max(400 / i, 1))(s"b$i")))
    val all = burst1 ++ burst2
    val m = 31
    val bound = all.size.toLong / (m + 1)
    val heavy = all.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > bound).keySet

    val input = MemoryStream[String]
    val mg = HeavyHitters.agg(m)
    val query = input.toDF().toDF("w")
      .groupBy()
      .agg(mg(col("w")).as("hh"))
      .writeStream.format("memory").queryName("hhstream")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData(burst1)
      query.processAllAvailable()
      input.addData(burst2)
      query.processAllAvailable()
    } finally query.stop()

    val hh = spark.table("hhstream").head().getStruct(0)
    val cands = hh.getAs[scala.collection.Seq[String]]("words").toSet
    assert(cands.size <= m)
    heavy.foreach(w => assert(cands.contains(w), s"heavy token $w missing"))
    assert(heavy.nonEmpty, "fixture must actually contain heavy tokens")
  }
}
