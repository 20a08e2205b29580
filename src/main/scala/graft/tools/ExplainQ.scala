import org.apache.spark.sql.SparkSession
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      val df = graft.queries.Registry.byName(n).fn(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.optimizedPlan.toString
      val nMd5 = "md5\\(".r.findAllIn(plan).length
      val nSplit = "split\\(".r.findAllIn(plan).length
      println(s"== $n: md5 occurrences in optimized plan: $nMd5, split: $nSplit")
    }
    spark.stop()
  }
}
