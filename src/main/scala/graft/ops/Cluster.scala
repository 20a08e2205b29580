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
  * buckets) and the fixpoint arrives in a handful of rounds. The
  * O(log²n)-round large-star/small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond") is the documented
  * escalation path if a corpus ever produced long path-shaped
  * components; it trades more complex rounds for a guaranteed round
  * bound, which this workload does not need.
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
}
