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

  // ---- large-star/small-star (diameter-robust escalation) ----------

  private def starComponents(edges: Seq[(Long, Long)], maxIter: Int = 50)
      : (Map[Long, Long], Int) = {
    val r = Cluster.connectedComponentsStar(edges.toDF("a_id", "b_id"), maxIter)
    (r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap, r.rounds)
  }

  test("star algorithm matches propagation on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }.distinct
    val (star, _) = starComponents(edges)
    assert(star === components(edges))
  }

  test("adversarial 256-node path: rounds stay O(log n), labels exact") {
    // a pure path is the propagation worst case (diameter = n - 1);
    // large-star/small-star must finish in ~log2(n) alternations
    val n = 256
    val edges = (1L until n.toLong).map(i => (i, i + 1L))
    val (star, rounds) = starComponents(edges)
    assert(star.size === n)
    assert(star.values.toSet === Set(1L), s"path split into ${star.values.toSet}")
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 2
    assert(rounds <= bound, s"took $rounds alternations, bound $bound")
  }

  test("star algorithm handles worst-case label placement (min at chain end)") {
    // descending path: the component min sits at the far end of every
    // hop, plus a second component interleaved in the id space
    val edges = (0 until 100).map(i => (200L - 2 * i, 198L - 2 * i)) ++
      Seq((5L, 9L), (9L, 7L))
    val (star, rounds) = starComponents(edges)
    assert(star(200L) === 0L && star(100L) === 0L && star(2L) === 0L)
    assert(star(9L) === 5L && star(7L) === 5L)
    assert(rounds <= 18, s"took $rounds alternations")
  }

  test("star algorithm: self loops and empty input are inert") {
    assert(starComponents(Seq((4L, 4L)))._1 === Map(4L -> 4L))
    assert(starComponents(Seq.empty)._1 === Map.empty)
  }
}
