package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Cluster

class ClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Cluster.connectedComponents(edges.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two separate components resolve to their min ids") {
    val got = components(Seq((5L, 3L), (3L, 9L), (20L, 30L)))
    assert(got === Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L))
  }

  test("transitive chain collapses even when endpoints never share an edge") {
    // a path: min label must travel the full diameter
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
    assert(got.values.toSet === Set(1L))
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("min id propagates against edge direction too") {
    // edges oriented high->low and low->high mixed
    val got = components(Seq((10L, 7L), (7L, 12L), (12L, 2L)))
    assert(got.values.toSet === Set(2L))
  }

  test("random graph matches a driver-side union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    // reference union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(n => n -> find(n)).toMap
    assert(components(edges) === want)
  }

  test("empty edge list yields empty labeling") {
    assert(components(Seq.empty) === Map.empty)
  }
}
