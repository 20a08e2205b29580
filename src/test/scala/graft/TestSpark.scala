package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for the suite (one JVM, forked by sbt). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[32]")  // core count leaks into AQE decisions
      // (split packing divides bytes by defaultParallelism; AQE
      // coalescing is parallelism-first) — the suite matches the
      // tools' local[32] so PlanHygieneSpec's exact sf1 census sees
      // the same runtime sizes the PLANS.md generator saw
      .appName("graft-tests")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse-").toString)
      .config("spark.sql.shuffle.partitions", "4")
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
