package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Stage-level breakdown of a query run — which stages dominate the
  * wall, and whether their cost is scan, shuffle write, or shuffle
  * read. Feeds the SCALING.md "expensive-tail" notes: a whole-query
  * wall says a query is slow, the stage profile says WHERE, which is
  * what separates "at its linear floor" from "hiding a fat exchange".
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.StageProfile q100_cms_sketch ...
  * Prints, per query, every completed stage's duration, task-time sum,
  * input read, shuffle write/read volumes and record counts, sorted by
  * task time.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // Scale-adaptive scan splits: the corpora are single parquet FILES
      // (64 KB..175 MB), so the default split floor (openCost 4 MB) runs
      // whole-table scans as ONE task at these sizes. minPartitionNum=32
      // makes Spark size splits to totalBytes/32 per scan (floored at
      // 64 KB) — ~32 tasks for ANY table size, the local-mode stand-in
      // for a many-file layout, without the fixed-small-split task-count
      // blowup on larger tables. Row-group sizing in make_sf1.py makes
      // the small sf1 tables actually splittable. Measured (TimeQ A/B):
      // committed-scale walls are unchanged within noise, sf1 scan tails
      // drop 3-4x (q72 3.8->1.0 s, q164 3.9->1.1 s, q23 3.5->1.0 s).
      // On a real many-file cluster the defaults are correct.
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(id: Int, name: String, wallMs: Long, taskMs: Long,
      inputMB: Double, shWriteMB: Double, shReadMB: Double,
      shWriteRec: Long, shReadRec: Long, outRec: Long)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(i.stageId,
            i.name.takeWhile(_ != '\n').take(70),
            i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
            m.executorRunTime,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.recordsWritten,
            m.shuffleReadMetrics.recordsRead,
            m.outputMetrics.recordsWritten)
        }
      }
    })

    for (n <- args) {
      val q = graft.queries.Registry.byName(n)
      // warm-up (classloading/codegen out of the profile)
      q.fn(spark, sfDir).selectExpr("sum(xxhash64(struct(*)))").collect()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).selectExpr("sum(xxhash64(struct(*)))").collect()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously (no public flush API —
      // a short sleep suffices for a single local-mode job)
      Thread.sleep(500)
      val snap = stages.synchronized(stages.sortBy(-_.taskMs).toVector)
      val totalTask = snap.map(_.taskMs).sum.toDouble
      println(f"== $n  wall=$wall%.2fs  stages=${snap.length}  taskTime=${totalTask / 1000}%.1fs")
      snap.take(12).foreach { s =>
        println(f"  stage ${s.id}%4d ${s.taskMs / 1000.0}%7.2fs task (${100 * s.taskMs / math.max(1.0, totalTask)}%4.1f%%) " +
          f"wall ${s.wallMs / 1000.0}%6.2fs  in ${s.inputMB}%8.1fMB  shW ${s.shWriteMB}%8.1fMB/${s.shWriteRec}%d  " +
          f"shR ${s.shReadMB}%8.1fMB/${s.shReadRec}%d  ${s.name}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
