package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Scale evidence for the co-located join strategy (SURVEY §4): two
  * tables bucketed on the same key join WITHOUT a shuffle exchange —
  * the plan every 100 TB fact⋈fact join in this engine relies on
  * (pubmed ⋈ pubmed_annotations bucketed by pmid).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("same-key bucketed join plans without a shuffle exchange") {
    val docs = (0L until 1000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val ann = (0L until 1000L).map(i => (i, i % 7)).toDF("doc_id", "grp")
    docs.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("bspec_docs")
    ann.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("bspec_ann")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bspec_docs")
        .join(spark.table("bspec_ann"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 1000)

      // control: the same join over unbucketed parquet DOES shuffle
      val d2 = docs.join(ann, "doc_id")
      val plan2 = d2.queryExecution.executedPlan.toString
      assert(plan2.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
