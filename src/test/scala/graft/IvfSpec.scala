package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.search.Ivf

/** ANN recall is a property of the index on CLUSTERED data — the
  * synthetic embeddings table is isotropic noise, where every sublinear
  * index degenerates to its scan fraction. So recall is asserted on a
  * corpus with planted near-duplicates of the query.
  */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("recall@10 >= 0.9 on planted near-duplicate cluster") {
    val rnd = new scala.util.Random(7)
    val dim = 64
    val query = Array.fill(dim)(rnd.nextGaussian().toFloat)
    // 10 planted near-dups: query + small noise (cos > ~0.99)
    val planted = (1 to 10).map { i =>
      (i.toLong, query.map(x => x + 0.02f * rnd.nextGaussian().toFloat).toSeq)
    }
    // 489 background vectors: independent noise
    val background = (11 to 499).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
    }
    val e = ((0L, query.toSeq) +: (planted ++ background))
      .toDF("vec_id", "embedding")

    val ivfTop = Ivf.search(spark, e, queryId = 0L, centroidMod = 25, nprobe = 4, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet

    // exact brute-force top-10
    import graft.functions.Portable._
    val vecs = e.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val qv = vecs.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val exactTop = vecs.filter(col("vec_id") > 0).crossJoin(qv)
      .select(col("vec_id"),
        (dot(col("v"), col("qv")) / sqrt(norm2(col("v")) * norm2(col("qv")))).as("cs"))
      .orderBy(col("cs").desc, col("vec_id"))
      .limit(10).select("vec_id").collect().map(_.getLong(0)).toSet

    val recall = (ivfTop & exactTop).size / 10.0
    assert(recall >= 0.9, s"recall $recall; ivf=$ivfTop exact=$exactTop")
  }

  test("assignments cover every vector exactly once") {
    val rnd = new scala.util.Random(3)
    val e = (0 until 120).map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val a = Ivf.assignments(e, centroidMod = 10)
    assert(a.count() === 120)
    assert(a.select("vec_id").distinct().count() === 120)
    // centroids assign to themselves (cos=1 with cid tiebreak)
    val self = a.filter(col("vec_id") % 10 === 1)
      .filter(col("vec_id") === col("cell")).count()
    assert(self === 12)
  }
}
