object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.tools.GraftSession.local(cores = "32", appName = "graft-timeq")
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
