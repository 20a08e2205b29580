object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (n <- args) {
      val q = graft.queries.Registry.byName(n)
      val df = q.fn(spark, sfDir)
      df.selectExpr("sum(xxhash64(struct(*)))").collect()  // warm
      val t0 = System.nanoTime()
      df.selectExpr("sum(xxhash64(struct(*)))").collect()
      println(s"TIME $n: ${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
