package graft.annotate

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Portable.h32s

/** Text → dense-embedding enrichment seam (reference: PICO_BERT.py's
  * batched SciBERT encoder, PICO_BERT.py:32-151): the stage that
  * PRODUCES the embeddings column the similarity operators (q25/q26/
  * q47) consume.
  *
  * `encode` runs per PARTITION — a real implementation loads the model
  * once per partition (the per-partition handle seam, same shape as
  * Annotator/Multimodal) and encodes the whole batch in one forward
  * pass. The stub is deterministic (md5-derived, value range [-1, 1],
  * float32 like the reference's torch output) so the DuckDB oracle can
  * pin the full text→vector pipeline bit-for-bit.
  *
  * Scale: embedding generation is embarrassingly parallel and
  * shuffle-free; batch size per forward pass is governed by partition
  * size (`spark.sql.files.maxPartitionBytes`), and the output column
  * feeds the bucketed/banded similarity paths without materializing on
  * the driver.
  */
object Embedder {

  val dim = 8

  final case class DocEmbedding(doc_id: Long, embedding: Array[Float])

  trait Batch extends Serializable {
    def encode(batch: Iterator[(Long, String)]): Iterator[DocEmbedding]
  }

  /** Deterministic stand-in for the model: e_i = ((h32(md5(text)+"_i")
    * % 2001) - 1000) / 1000 as float32.
    */
  object Stub extends Batch {
    def encode(batch: Iterator[(Long, String)]): Iterator[DocEmbedding] = {
      // per-partition "model handle" — a real impl loads weights here
      val digest = java.security.MessageDigest.getInstance("MD5")
      batch.map { case (id, text) =>
        digest.reset()
        val h = digest.digest(text.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        DocEmbedding(id, Array.tabulate(dim)(i =>
          (((h32s(s"${h}_$i") % 2001) - 1000).toDouble / 1000.0).toFloat))
      }
    }
  }

  /** docs(doc_id, text) → (doc_id, embedding float[dim]). */
  def embed(docs: DataFrame, impl: Batch = Stub): Dataset[DocEmbedding] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(impl.encode _)
  }
}
