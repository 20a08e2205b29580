package graft.annotate

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Portable.h32s

/** The batch ML-enrichment seam (reference: RobotReviewer REST calls,
  * pubmed.py:320-345, batched 100 articles per round-trip at
  * pubmed.py:561-635).
  *
  * `annotate` runs per PARTITION, so an HTTP implementation makes one
  * batched request per partition (the reference's batching, reshaped to
  * executors); the stub implementation is deterministic (md5-derived)
  * so correctness tests and the DuckDB oracle can pin the full
  * pipeline: anti-join of already-annotated ids (P8) → partition-batch
  * annotate → sample-size sanity guard (P10: >1,000,000 → null,
  * pubmed.py:611-613).
  */
object Annotator {

  final case class Annotation(
      doc_id: Long, num_randomized: Option[Long], prob_low_rob: Double,
      punchline_text: String, effect: String)

  trait Batch extends Serializable {
    def annotate(batch: Iterator[(Long, String)]): Iterator[Annotation]
  }

  /** Deterministic stand-in for the ML service. */
  object Stub extends Batch {
    private val effects =
      Array("significant-positive", "significant-negative", "no-diff")

    def annotate(batch: Iterator[(Long, String)]): Iterator[Annotation] = {
      // per-partition "connection" — a real impl opens its HTTP client
      // here and POSTs the whole batch
      val digest = java.security.MessageDigest.getInstance("MD5")
      batch.map { case (id, text) =>
        digest.reset()
        val h = digest.digest(text.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        val rawN = h32s(h + "_n") % 2000000
        val num = if (rawN > 1000000) None else Some(rawN) // P10 guard
        val prob = (h32s(h + "_p") % 100) / 100.0
        val punchline = text.split(" ", -1).take(4).mkString(" ")
        val effect = effects((h32s(h + "_e") % 3).toInt)
        Annotation(id, num, prob, punchline, effect)
      }
    }
  }

  /** todo = candidates ANTI-JOIN done (pubmed.py:581-602), then
    * partition-batched annotation.
    */
  def annotateNew(candidates: DataFrame, doneIds: DataFrame,
      impl: Batch = Stub): Dataset[Annotation] = {
    val spark = candidates.sparkSession
    import spark.implicits._
    candidates
      .join(doneIds, candidates("doc_id") === doneIds("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(impl.annotate _)
  }
}
