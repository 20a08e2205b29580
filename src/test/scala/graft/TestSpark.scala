package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for the suite (one JVM, forked by sbt). */
object TestSpark {
  lazy val spark: SparkSession =
    // core count 32: it leaks into AQE decisions (split packing
    // divides bytes by defaultParallelism; AQE coalescing is
    // parallelism-first) — the suite matches the tools' local[32] so
    // PlanHygieneSpec's exact sf1 census sees the same runtime sizes
    // the PLANS.md generator saw
    tools.GraftSession.local(
      cores = "32",
      shufflePartitions = "4",
      appName = "graft-tests",
      extra = Map("spark.sql.warehouse.dir" ->
        java.nio.file.Files.createTempDirectory("graft-warehouse-").toString))
}
