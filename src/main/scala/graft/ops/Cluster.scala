package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a candidate-pair edge list — the cluster-
  * resolution step of a dedup pipeline: LSH candidate generation
  * ([[Dedup.candidates]]) yields PAIRS, but survivor election needs
  * GROUPS (a≈b and b≈c must collapse to one canonical doc even when
  * (a,c) never shared a bucket).
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id; each round every node takes the min of its
  * own label and its neighbors' labels; fixpoint = every node holds the
  * min id of its component. Rounds needed = graph diameter, and each
  * round is ONE shuffle keyed on node id (uniform doc ids, no skew by
  * construction — an oversized near-dup cluster is bounded upstream by
  * [[Dedup.candidates]]' bucket cap).
  *
  * Scale rationale: dedup graphs are the *favourable* case for label
  * propagation — components are near-cliques from LSH buckets, so the
  * diameter is small (≤ 2–4 hops even for transitive chains across
  * buckets) and the fixpoint arrives in a handful of rounds. For
  * graphs whose diameter is NOT bounded by construction, the
  * large-star/small-star algorithm (Kiveris et al., "Connected
  * Components in MapReduce and Beyond") is implemented as
  * [[connectedComponentsStar]]: rounds grow with log(diameter), not
  * diameter, at the cost of a rewritten edge set per round.
  *
  * Driver involvement per round is a single scalar (the changed-label
  * count used as the convergence test) — the label table itself never
  * leaves the executors; each round's result is persisted and the
  * previous round is unpersisted, so lineage stays one round deep.
  */
object Cluster {

  /** Components of the undirected graph given by `edges` (columns
    * `a_id`, `b_id`). Returns one row per node that appears in any
    * edge: (id, cluster) with cluster = min node id of the component.
    *
    * @param maxIter hard round bound (diameter guard); propagation
    *                always converges in ≤ diameter rounds, this only
    *                caps adversarial path-graphs.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val half = edges.select(col("a_id").as("src"), col("b_id").as("dst"))
    val und = half.union(half.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()

    var round = 0
    var converged = false
    while (round < maxIter && !converged) {
      // min label among each node's neighbours (partial agg collapses
      // map-side before the exchange)
      val nbrMin = und
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nbr_min"))
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.as("n")
        .join(labels.select(col("id"), col("label").as("old")), "id")
        .filter(col("label") =!= col("old"))
        .count()
      labels.unpersist()
      labels = next
      converged = changed == 0L
      round += 1
    }
    und.unpersist()
    labels.withColumnRenamed("label", "cluster")
  }

  /** Labels plus the number of (large-star, small-star) rounds the
    * fixpoint took — the round count is the algorithm's whole selling
    * point, so callers can audit it (ClusterSpec pins it ≤ O(log n)
    * on an adversarial path graph).
    */
  final case class StarResult(labels: DataFrame, rounds: Int)

  /** Connected components via alternating large-star/small-star
    * rewrites (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SOCC'14) — the diameter-robust alternative to
    * [[connectedComponents]]:
    *
    *  - large-star(u): every neighbor v > u is re-pointed at
    *    m = min(Γ(u) ∪ u) — long tails collapse toward local minima;
    *  - small-star(u): u and its ≤-neighbors all re-point at their
    *    min — local minima chain toward the component min.
    *
    * Each half-round is ONE aggregation plus ONE co-partitioned join
    * on the node key (the same uniform-key shuffle shape as a
    * propagation round; AQE reuses the groupBy exchange for the
    * join), and the edge set CONTRACTS geometrically: convergence in
    * O(log n) alternations regardless of diameter, vs diameter rounds
    * for propagation. Fixpoint = the edge set is stable across a full
    * alternation, detected with two distributed anti-join counts (no
    * driver-side edge data); at fixpoint every component is a star
    * centered on its min id, so labels fall out of one final
    * aggregation. Edge skew: a hot star center is exactly the case
    * AQE's skew-join split handles, and the map-side partial min
    * collapses hot keys before every exchange.
    */
  def connectedComponentsStar(
      edges: DataFrame, maxIter: Int = 50): StarResult = {
    val nodes = edges
      .select(col("a_id").as("id"))
      .union(edges.select(col("b_id").as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count()

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(e.select(col("b_id").as("src"), col("a_id").as("dst")))
      val mins = sym.groupBy("src")
        .agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      sym.filter(col("dst") > col("src"))
        .join(mins, "src")
        .select(col("dst").as("a_id"), col("m").as("b_id"))
        .filter(col("a_id") =!= col("b_id"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // direct every edge at its larger endpoint; dst < src holds
      val dir = e.select(
        greatest(col("a_id"), col("b_id")).as("src"),
        least(col("a_id"), col("b_id")).as("dst"))
      val mins = dir.groupBy("src").agg(min(col("dst")).as("m"))
      dir.join(mins, "src")
        .select(col("dst").as("a_id"), col("m").as("b_id"))
        .union(mins.select(col("src").as("a_id"), col("m").as("b_id")))
        .filter(col("a_id") =!= col("b_id"))
        .distinct()
    }

    // localCheckpoint (eager) per round: each alternation references
    // the previous edge set ~a dozen times, so persist() alone — which
    // truncates EXECUTION but not the logical plan — leaves the plan
    // growing exponentially with rounds. Checkpointing cuts lineage to
    // the materialized result (on a cluster, a reliable checkpoint dir
    // every few rounds is the fault-tolerant variant of the same move).
    var cur = edges.select(col("a_id"), col("b_id"))
      .filter(col("a_id") =!= col("b_id"))
      .distinct()
      .transform(graft.ops.Reuse.pin)

    var round = 0
    var converged = cur.isEmpty
    while (round < maxIter && !converged) {
      val next = smallStar(largeStar(cur)).transform(graft.ops.Reuse.pin)
      val gained = next.join(cur, Seq("a_id", "b_id"), "left_anti").count()
      val lost = cur.join(next, Seq("a_id", "b_id"), "left_anti").count()
      cur = next
      converged = gained == 0L && lost == 0L
      round += 1
    }
    // the label extraction below is only valid at the star fixpoint —
    // on a non-converged residual edge set min(nbr) is a LOCAL
    // minimum, so exhausting maxIter must fail loudly, never return
    // plausible-but-split components
    require(converged,
      s"large-star/small-star did not reach its fixpoint within $maxIter " +
        "alternations — raise maxIter (rounds grow with log(n))")

    // fixpoint stars: every non-center node points at its component
    // min; centers (and single-node components) coalesce to themselves
    val sym = cur.select(col("a_id").as("id"), col("b_id").as("nbr"))
      .union(cur.select(col("b_id").as("id"), col("a_id").as("nbr")))
    val lab = sym.groupBy("id").agg(min(col("nbr")).as("mn"))
    val labels = nodes.join(lab, Seq("id"), "left")
      .select(col("id"),
        least(col("id"), coalesce(col("mn"), col("id"))).as("cluster"))
      .transform(graft.ops.Reuse.pin)
    nodes.unpersist()
    StarResult(labels, round)
  }
}
