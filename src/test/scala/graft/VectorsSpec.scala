package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Algebraic properties of the embedding-graph entries (q168–q170)
  * beyond their DuckDB oracles: projection linearity against a
  * driver-side recomputation, mutual-kNN structural invariants, and
  * triangle counts checked against a brute-force driver-side count on
  * the same edge set.
  */
class VectorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = Registry.byName(name).fn(spark, dir)

  test("q168: every vector gets 16 dims, and one vector recomputes exactly") {
    val rows = run("q168_random_projection").collect()
    val n = Tables.embeddings(spark, dir).count()
    assert(rows.length == n * 16, "k=16 projections per vector")

    val first = Tables.embeddings(spark, dir)
      .orderBy("vec_id").select("vec_id", "embedding").head
    val vid = first.getLong(0)
    val q = first.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong)
    val expected = (0 until 16).map { j =>
      q.zipWithIndex.map { case (v, i) =>
        v * (if (graft.functions.Portable.h32s(s"rp:$i:$j") % 2 == 0) 1L else -1L)
      }.sum
    }
    val got = rows.filter(_.getLong(0) == vid).sortBy(_.getInt(1)).map(_.getLong(2))
    assert(got.toSeq == expected, "plan-bound sign matrix must match h32s derivation")
  }

  test("q169: edges are canonical, reciprocal, and degree-capped at K") {
    val edges = run("q169_knn_graph").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(edges.nonEmpty, "clustered fixture embeddings should yield mutual edges")
    assert(edges.forall { case (s, d, _) => s < d }, "src < dst canonical form")
    assert(edges.forall { case (_, _, c) => c >= -1.000001 && c <= 1.000001 })
    val deg = edges.flatMap { case (s, d, _) => Seq(s, d) }
      .groupBy(identity).map(_._2.size)
    assert(deg.max <= 3, "mutual-kNN degree is bounded by K=3 by construction")
  }

  test("q181: recall bounds hold and the probe set is covered") {
    val rows = run("q181_ann_recall").collect()
    val nq = Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 50 === 0).count()
    assert(rows.length == nq, "one audit row per probe query")
    rows.foreach { r =>
      val (nTrue, nFound, nHit, rec) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nHit <= math.min(nTrue, nFound), "hits bound by both sets")
      assert(rec <= 1000000L && rec >= 0L)
      assert(rec == nHit * 1000000L / nTrue, "integer recall law")
    }
  }

  test("q182: card partitions the corpus by source") {
    val out = Registry.byName("q182_dataset_card").fn(spark, dir)
    val docs = Tables.documents(spark, dir)
    assert(out.agg(sum("n_docs")).head.getLong(0) == docs.count())
    assert(out.count() == docs.select("source").distinct().count())
    assert(out.filter(col("n_en") > col("n_docs")).isEmpty)
    assert(out.filter(col("n_exact_dup") === 1L).isEmpty,
      "a dup group contributes at least 2 docs")
  }

  test("q185: fused ranks obey the RRF law and respect both arms") {
    val rows = Registry.byName("q185_rrf_fusion").fn(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val dense = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val expect = lex.map(k => 1000000L / (60 + k)).getOrElse(0L) +
        dense.map(k => 1000000L / (60 + k)).getOrElse(0L)
      assert(r.getLong(3) == expect, "rrf_e6 must equal the integer RRF sum")
      assert(lex.nonEmpty || dense.nonEmpty)
    }
    assert(rows.map(_.getLong(3)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q186: cell populations partition the assigned vectors") {
    val out = Registry.byName("q186_ivf_cell_audit").fn(spark, dir)
    val rows = out.collect()
    val nCells = rows.head.getLong(2)
    assert(rows.length == nCells, "n_cells must equal the audit row count")
    assert(rows.map(_.getLong(1)).sum == rows.head.getLong(3),
      "cell populations must sum to n_total")
    rows.foreach { r =>
      assert(r.getBoolean(4) == (r.getLong(1) * nCells >= r.getLong(3) * 2))
    }
  }

  test("q183: maxsim recomputes driver-side for the top hit") {
    val rows = run("q183_late_interaction").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)),
      "top-10 must be score-descending")
    assert(!rows.exists(_.getLong(0) == 0L), "query vector excluded")
    val emb = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val q = emb(0L).grouped(8).toSeq
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dp = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum; val nb = b.map(x => x * x).sum
      BigDecimal(dp / math.sqrt(na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val top = rows.head
    val dsubs = emb(top.getLong(0)).grouped(8).toSeq
    val expected = q.map(qi => dsubs.map(dj => cos(qi, dj)).max).sum
    assert(math.abs(top.getDouble(1) - expected) < 1e-9,
      "Σ max cos must match the independent recomputation")
  }

  test("q170: counts match a brute-force triangle count over the q169 edges") {
    val edges = run("q169_knn_graph").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      if edges((nodes(i), nodes(j)))
      k <- (j + 1) until nodes.length
      if edges((nodes(j), nodes(k))) && edges((nodes(i), nodes(k)))
    } {
      brute(nodes(i)) += 1; brute(nodes(j)) += 1; brute(nodes(k)) += 1
    }
    val got = run("q170_triangle_count").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute.toMap, "degree-oriented count must equal brute force")
    assert(got.values.sum % 3 == 0, "each triangle credits exactly 3 corners")
  }

  test("q190: LPA matches a driver-side synchronous replay on the same graph") {
    val edges = run("q169_knn_graph").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(labels).view.mapValues(_.size).toMap
        n -> counts.toSeq.map { case (l, c) => (-c, l) }.min._2
      }
    }
    val got = run("q190_label_propagation").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == labels, "3 synchronous mode-of-neighbors rounds, min tie-break")
    assert(got.values.toSet.subsetOf(got.keySet), "labels are node ids")
  }

  test("q191: top2 cell agrees with nearest_centroid; silhouette bounded") {
    val rows = run("q191_silhouette").collect()
    val emb = Tables.embeddings(spark, dir)
    val assigned = graft.search.Ivf
      .assignments(emb, graft.search.Ivf.adaptiveMod(emb.count()))
      .groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == assigned,
      "CentroidTop2's rank-1 cell must equal NearestCentroid's assignment")
    rows.foreach { r =>
      val s = r.getDouble(2)
      assert(s >= -1.0 - 1e-6 && s <= 1.0 + 1e-6, "silhouette in [-1, 1]")
    }
    assert(rows.map(_.getLong(1)).sum ==
      Tables.embeddings(spark, dir).count(), "every vector is audited")
  }
  test("q224: whitening params equal naive per-dimension moments") {
    val rows = run("q224_whitening_params").collect()
      .map(r => r.getAs[Int]("dim") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("mean_q6"),
          r.getAs[Double]("var_q6"))).toMap
    assert(rows.size === 64)
    val vecs = Tables.embeddings(spark, dir)
      .select(org.apache.spark.sql.functions.transform(col("embedding"),
        x => floor(x.cast("double") * lit(1e6)).cast("long")).as("q"))
      .collect().map(_.getSeq[Long](0).toArray)
    for (dim <- 0 until 64) {
      val xs = vecs.map(_(dim).toDouble)
      val mean = xs.sum / xs.length
      val varr = xs.map(x => x * x).sum / xs.length - mean * mean
      val (n, m6, v6) = rows(dim)
      assert(n === vecs.length.toLong)
      assert(math.abs(m6 - mean) < 1e-3, s"dim $dim mean")
      assert(math.abs(v6 - varr) < math.abs(varr) * 1e-6 + 1e-2, s"dim $dim var")
    }
  }

  test("q229: synchronous peel equals the naive driver-side k-core rounds") {
    val rows = run("q229_kcore_peel").collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_alive"),
        r.getAs[Long]("n_edges"), r.getAs[Long]("id_sum"))).sortBy(_._1)
    assert(rows.length === 3)
    var edges = run("q169_knn_graph")
      .select("src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap(e => Seq(e, (e._2, e._1))).toSet
    for (r <- 1 to 3) {
      val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size }
      val alive = deg.filter(_._2 >= 3).keySet
      edges = edges.filter(e => alive(e._1) && alive(e._2))
      val ids = edges.map(_._1)
      val (_, na, ne, sm) = rows(r - 1)
      assert(na === ids.size.toLong, s"round $r alive")
      assert(ne === edges.size.toLong / 2, s"round $r edges")
      assert(sm === ids.toSeq.sum, s"round $r checksum")
    }
    // peeling is monotone: each round can only shrink the core
    rows.sliding(2).foreach {
      case Array((_, a1, e1, _), (_, a2, e2, _)) =>
        assert(a2 <= a1 && e2 <= e1)
      case _ =>
    }
  }
  test("q245: frontier rounds equal a naive driver-side BFS") {
    val rows = run("q245_bfs_levels").collect()
      .map(r => (r.getAs[Long]("hop"), r.getAs[Long]("n_new"),
        r.getAs[Long]("n_reached"), r.getAs[Long]("frontier_checksum")))
      .sortBy(_._1)
    assert(rows.length === 5)
    val edges = run("q169_knn_graph").select("src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap(e => Seq(e, (e._2, e._1)))
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val source = edges.map(e => math.min(e._1, e._2)).min
    var frontier = Set(source)
    var visited = Set(source)
    assert(rows.head === ((0L, 1L, 1L, source)))
    for (h <- 1 to 4) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- visited
      visited ++= next
      frontier = next
      val (_, nNew, nReached, chk) = rows(h)
      assert(nNew === next.size.toLong, s"hop $h new")
      assert(nReached === visited.size.toLong, s"hop $h reached")
      assert(chk === next.toSeq.sum, s"hop $h checksum")
    }
    // cumulative reach is monotone and frontier sizes are consistent
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._3 === a._3 + b._2)
      case _ =>
    }
  }

  test("q252: staleness audit conserves vectors and derives its flags") {
    val rows = run("q252_index_staleness").collect()
    assert(rows.nonEmpty)
    val (ta, tb) = (rows.map(_.getAs[Long]("n_a")).sum,
      rows.map(_.getAs[Long]("n_b")).sum)
    assert(ta + tb === Tables.embeddings(spark, dir).count(),
      "every vector lands in exactly one cell")
    rows.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val (sa, sb) =
        (r.getAs[Long]("share_a_e6"), r.getAs[Long]("share_b_e6"))
      assert(sa === na * 1000000L / ta, "share_a is the floored millionth")
      assert(sb === nb * 1000000L / tb, "share_b is the floored millionth")
      assert(r.getAs[Long]("shift_e6") === math.abs(sa - sb))
      assert(r.getAs[Boolean]("is_new") === (na == 0L))
      assert(r.getAs[Boolean]("drifted") === (math.abs(sa - sb) > 100000L))
    }
    // shares sum to ~1e6 (floor rounding loses < one millionth per cell)
    val sumA = rows.map(_.getAs[Long]("share_a_e6")).sum
    assert(sumA <= 1000000L && sumA > 1000000L - rows.length)
  }

  test("q262: full-dim rows are the identity; recalls stay in bounds") {
    val rows = run("q262_matryoshka_audit").collect()
    assert(rows.nonEmpty)
    val probes = rows.map(_.getAs[Long]("qid")).distinct
    assert(rows.length === probes.length * 3, "16/32/64 per probe")
    rows.foreach { r =>
      val hit = r.getAs[Long]("n_hit")
      assert(hit >= 0L && hit <= 10L)
      assert(r.getAs[Long]("recall_e6") === hit * 1000000L / 10L)
      if (r.getAs[Long]("dim") == 64L)
        assert(hit === 10L, s"probe ${r.getAs[Long]("qid")}: " +
          "full-dim recall must be the identity")
    }
  }
}
