package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.stream.Sessionize

/** Randomized differential tests: the distributed formulations of the
  * round-4 cores vs naive in-memory references on random inputs
  * (seeded — failures reproduce).
  */
class DifferentialPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Sessionize.batch == naive sessionizer on random event streams") {
    val rnd = new scala.util.Random(41)
    val gapUs = 5L * 60 * 1000000
    val events = (1 to 400).map { _ =>
      val user = rnd.nextInt(8).toLong
      val t = new Timestamp(1700000000000L + rnd.nextInt(7200) * 1000L)
      Sessionize.Event(user, t, (rnd.nextInt(16) / 4.0)) // exact doubles
    }

    val got = Sessionize.batch(events.toDF(), gapUs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4), r.getDouble(5)))
      .toSet

    // naive: per user, sort by ts, split where gap > gapUs. Ties in ts
    // don't affect session membership (gap 0), and value-sum order
    // within a session is fixed by sorting like the window does.
    val expected = events.groupBy(_.user_id).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e.ts.getTime, e.value))
      val sessions = sorted.foldLeft(List.empty[List[Sessionize.Event]]) {
        case (acc, e) =>
          acc match {
            case cur :: rest
                if (e.ts.getTime - cur.head.ts.getTime) * 1000L <= gapUs =>
              (e :: cur) :: rest // cur.head is the session's LAST event
            case _ => List(e) :: acc
          }
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (s, i) =>
        (u, (i + 1).toLong, s.head.ts, s.last.ts, s.size.toLong,
          s.map(e => BigDecimal(e.value)).sum.toDouble)
      }
    }.toSet

    assert(got === expected)
  }

  test("Dedup.bucketPairs == naive pair enumeration, with and without cap") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 500).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(3), s"sig${rnd.nextInt(12)}")
    }.distinct // (doc_id, band, sig): one row per doc per band at most
    val df = rows.toDF("doc_id", "band", "sig")

    def naive(cap: Option[Int]): Set[(Long, Long)] = {
      val buckets = rows.groupBy(r => (r._2, r._3)).values
        .filter(b => cap.forall(b.size <= _))
      buckets.flatMap { b =>
        val ids = b.map(_._1)
        for (a <- ids; c <- ids if a < c) yield (a, c)
      }.toSet
    }

    for (cap <- Seq(None, Some(5), Some(1))) {
      val got = Dedup.bucketPairs(df, "doc_id", Seq("band", "sig"), cap)
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === naive(cap), s"cap=$cap")
    }

    // n_bands counting path (candidates): multiplicity must equal the
    // number of shared buckets
    val gotBands = Dedup.candidates(df)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expBands = rows.groupBy(r => (r._2, r._3)).values.toSeq
      .flatMap { b =>
        val ids = b.map(_._1)
        for (a <- ids; c <- ids if a < c) yield (a, c)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(gotBands === expBands)
  }
}
