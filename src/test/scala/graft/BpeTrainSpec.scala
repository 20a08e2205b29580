package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** q148 BPE merge training: a TRUE list-based greedy BPE trainer
  * (independent implementation — token lists, not the engine's
  * boundary-marked string replace) must produce the identical merge
  * table on the same vocabulary, proving the replace-pass encoding is
  * semantics-preserving on this corpus, not just self-consistent with
  * the oracle.
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Greedy left-to-right non-overlapping merge of `pair` in `word`. */
  private def applyMerge(word: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      if (i + 1 < word.length && word(i) == pair._1 && word(i + 1) == pair._2) {
        out += word(i) + word(i + 1); i += 2
      } else { out += word(i); i += 1 }
    }
    out.result()
  }

  private def train(vocab: Map[Vector[String], Long], rounds: Int): Seq[(Long, String, Long)] = {
    var v = vocab
    (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      v.foreach { case (w, f) =>
        w.zip(w.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      // pick: max count, ties to the lexicographically smallest "x y"
      val (pair, c) = counts.toSeq
        .map { case (p, n) => (s"${p._1} ${p._2}", n) }
        .minBy { case (p, n) => (-n, p) }
      val halves = pair.split(" ", 2)
      v = v.toSeq.map { case (w, f) => applyMerge(w, (halves(0), halves(1))) -> f }
        .groupBy(_._1).map { case (w, fs) => w -> fs.map(_._2).sum }
      (r.toLong, pair, c)
    }
  }

  test("q148: merge table matches an independent greedy BPE trainer") {
    val out = Registry.byName("q148_bpe_train").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out.map(_._1) === (1L to 5L))
    // weighted counts are non-increasing: a merge can only create pairs
    // bounded by the merged symbol's own count
    val cs = out.map(_._3)
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq")).collect()
      .map(r => r.getString(0).map(_.toString).toVector -> r.getLong(1))
      .toMap
    assert(train(vocab, 5) === out)
  }
}
