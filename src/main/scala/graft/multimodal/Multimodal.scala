package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Portable.h32s

/** Multimodal column handling: media payloads ride through the engine
  * as opaque `binary` columns with typed metadata, and per-item
  * decode/feature-extraction runs as partition-batched typed
  * transforms (the Scala analog of `mapInPandas`: one "model" handle
  * per partition, streamed batches, typed output schema).
  *
  * The decode step itself is a clearly-marked deterministic STUB —
  * image/audio codecs are not available in this container — but the
  * Spark-side plumbing (binary schema, partition batching, feature
  * schema, oracle-checkable determinism) is real and tested.
  */
object Multimodal {

  /** Typed per-item features (what a real vision model would emit). */
  final case class MediaFeatures(
      doc_id: Long, width: Int, height: Int,
      f0: Double, f1: Double, f2: Double, f3: Double)

  /** Attach the opaque media payload: documents' text bytes stand in
    * for image bytes (binary column, exactly as a real pipeline would
    * carry decoded-from-storage blobs).
    */
  def binarize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))

  /** STUB "decode": deterministic pseudo-metadata derived from the
    * payload's md5 — stands in for a real header parse. Formulas are
    * integer-exact so the DuckDB oracle reproduces them bit-for-bit.
    */
  def stubDecode(md5Hex: String): (Int, Int, Double, Double, Double, Double) = {
    val w = 64 + (java.lang.Long.parseLong(md5Hex.substring(0, 4), 16) % 1024).toInt
    val h = 64 + (java.lang.Long.parseLong(md5Hex.substring(4, 8), 16) % 1024).toInt
    def f(j: Int): Double = (h32s(md5Hex + "_" + j) % 1000) / 1000.0
    (w, h, f(0), f(1), f(2), f(3))
  }

  /** Typed per-item media header (what a real demux/probe would emit:
    * image dims + "video" duration and frame rate). The md5 hex rides
    * along so downstream DECLARATIVE stages (resize math, frame
    * sampling, per-frame fingerprints) can derive deterministic
    * values without re-touching the payload.
    */
  final case class MediaMeta(
      doc_id: Long, md5_hex: String, width: Int, height: Int,
      dur_ms: Int, fps: Int)

  /** Partition-batched header probe — the same seam as
    * [[extractFeatures]] (codec handle per partition, streamed rows),
    * but emitting the metadata a resize/frame-sample stage consumes.
    * Stub formulas are integer-exact off the payload md5.
    */
  def extractMeta(bin: DataFrame): Dataset[MediaMeta] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          digest.reset()
          val hex = digest.digest(bytes).map(b => f"$b%02x").mkString
          val (w, h, _, _, _, _) = stubDecode(hex)
          val durMs = 1000 + (java.lang.Long.parseLong(hex.substring(8, 12), 16) % 60000).toInt
          val fps = 10 + (java.lang.Long.parseLong(hex.substring(12, 14), 16) % 20).toInt
          MediaMeta(id, hex, w, h, durMs, fps)
        }
      }
  }

  /** Partition-batched feature extraction over (doc_id, content):
    * the per-partition block is where a real implementation loads its
    * codec/model ONCE and streams the partition through it.
    */
  def extractFeatures(bin: DataFrame): Dataset[MediaFeatures] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "model" handle (here: a reused digest instance)
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          digest.reset()
          val md5Hex = digest.digest(bytes).map(b => f"$b%02x").mkString
          val (w, h, f0, f1, f2, f3) = stubDecode(md5Hex)
          MediaFeatures(id, w, h, f0, f1, f2, f3)
        }
      }
  }
}
