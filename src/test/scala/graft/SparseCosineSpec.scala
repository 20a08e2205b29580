package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** q145 sparse-cosine similarity join: structural invariants plus an
  * independent Scala recomputation of the top pair's dot/norms from
  * the same shingle hashes (the oracle pins cross-engine equality;
  * this pins the math against a second implementation).
  */
class SparseCosineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val out =
    Registry.byName("q145_sparse_cosine").fn(spark, sf).collect()

  test("q145: output is well-formed and Cauchy-Schwarz-consistent") {
    assert(out.nonEmpty && out.length <= 20)
    val cos2s = out.map(_.getDouble(5))
    assert(cos2s.sameElements(cos2s.sorted(Ordering[Double].reverse)))
    out.foreach { r =>
      val (a, b, dot, n2a, n2b, cos2) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))
      assert(a < b, "pairs must be canonical a_id < b_id")
      assert(dot > 0L && n2a > 0L && n2b > 0L)
      assert(dot * dot <= n2a * n2b, "Cauchy-Schwarz violated")
      assert(cos2 > 0.0 && cos2 <= 1.0)
      assert(cos2 === dot.toDouble * dot.toDouble / (n2a.toDouble * n2b.toDouble))
    }
  }

  test("q145: top pair's dot and norms match a driver-side recomputation") {
    val top = out.head
    val (aId, bId) = (top.getLong(0), top.getLong(1))
    val texts = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(aId, bId))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // same features (4-gram shingle h32s), independent tf/df algebra
    def tf(id: Long): Map[Long, Long] =
      graft.functions.Hash32.shingles(texts(id))
        .groupBy(identity).map { case (h, occ) => h -> occ.length.toLong }
    val (ta, tb) = (tf(aId), tf(bId))
    // df <= 20 pruning can only drop features shared by > 20 docs; at
    // sf0.001 (50 docs) recompute the df filter exactly from the corpus
    val dfMap = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(graft.functions.Hash32.shingleHashes(col("text"))).as("h"))
      .groupBy("doc_id", "h").count()
      .groupBy("h").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def kept(t: Map[Long, Long]): Map[Long, Long] =
      t.filter { case (h, _) => dfMap(h) <= 20L }
    val (ka, kb) = (kept(ta), kept(tb))
    val dot = ka.keysIterator.filter(kb.contains)
      .map(h => ka(h) * kb(h)).sum
    def n2(t: Map[Long, Long]): Long = t.valuesIterator.map(v => v * v).sum
    assert(top.getLong(2) === dot)
    assert(top.getLong(3) === n2(ka))
    assert(top.getLong(4) === n2(kb))
  }
}
