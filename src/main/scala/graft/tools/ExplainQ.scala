object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.tools.GraftSession.local(cores = "4", appName = "graft-explainq")
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
