// Deliberately in the default package so the sbt invocation stays
// `runMain PlanQ ...` (like ExplainQ/Plans, the dev-loop plan tools).
object PlanQ {
  def main(args: Array[String]): Unit = {
    // optional leading sfDir argument (a path contains '/'); query
    // names follow
    val (dirs, names) = args.partition(_.contains("/"))
    val sfDir = dirs.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"===== $n")
      graft.queries.Registry.byName(n).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
