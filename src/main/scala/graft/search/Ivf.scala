package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable.{dot, norm2, toDouble}

/** IVF (inverted-file) approximate nearest neighbor search — the
  * scale path beside the exact brute-force baseline (q26), standing in
  * for the reference's Annoy index (PICO_search.py:28-86).
  *
  * Training-free deterministic flavor: coarse centroids are a fixed
  * sample of the corpus (`vec_id % centroidMod == 1`); every vector is
  * assigned to its nearest centroid map-side via a BROADCAST join
  * (ncentroids ~ sqrt(N) rows — never a shuffle of the big side); a
  * query probes its `nprobe` nearest cells and reranks only those
  * cells' vectors exactly.
  *
  * Scale shape: the expensive side (N vectors) flows through one
  * broadcast-join + one window on vec_id for the argmax — at cluster
  * scale the assignment is computed once, persisted bucketed by cell,
  * and probing reads only the probed cells (partition pruning on
  * cell).
  *
  * Plan/oracle determinism: similarities are rounded to 6 decimals and
  * tie-broken by centroid id before the argmax, so assignment is
  * reproducible across engines.
  */
object Ivf {

  /** cos(v, c) rounded for stable cross-engine comparison. */
  private def cos6(v: Column, c: Column): Column =
    round(dot(v, c) / sqrt(norm2(v) * norm2(c)), 6)

  /** (vec_id, cell) assignment: nearest sampled centroid. */
  def assignments(e: DataFrame, centroidMod: Int): DataFrame = {
    val vecs = e.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val cents = vecs.filter(col("vec_id") % centroidMod === 1)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cs").desc, col("cid"))
    vecs.join(broadcast(cents))
      .select(col("vec_id"), col("cid"), cos6(col("v"), col("cv")).as("cs"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
  }

  /** Top-k by exact cosine among the vectors in the query's `nprobe`
    * nearest cells (query = `queryId`, excluded from results).
    */
  def search(spark: SparkSession, e: DataFrame, queryId: Long,
      centroidMod: Int, nprobe: Int, k: Int): DataFrame = {
    val vecs = e.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val cents = vecs.filter(col("vec_id") % centroidMod === 1)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val qv = vecs.filter(col("vec_id") === queryId).select(col("v").as("qv"))

    val probes = cents.crossJoin(broadcast(qv))
      .select(col("cid"), cos6(col("qv"), col("cv")).as("cs"))
      .orderBy(col("cs").desc, col("cid"))
      .limit(nprobe)
      .select(col("cid").as("cell"))

    assignments(e, centroidMod)
      .join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= queryId)
      .join(vecs, "vec_id")
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), cos6(col("v"), col("qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}
