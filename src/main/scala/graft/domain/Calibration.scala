package graft.domain

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RCT classifier threshold calibration (P6/P7; reference:
  * pubmed.py:348-389 + data/rct_model_calibration.json).
  *
  * The artifact maps model → {precise, balanced, sensitive} score
  * cutoffs. classify() picks the model by the ptyp TRUST GATE — MEDLINE
  * status with non-Automated indexing keeps the ptyp features
  * (svm_cnn_ptyp), anything else falls back to svm_cnn — then each
  * cutoff produces one boolean flag via `score >= threshold`
  * (>= : boundary scores classify TRUE).
  */
object Calibration {

  final case class Thresholds(precise: Double, balanced: Double, sensitive: Double)
  final case class Config(withPtyp: Thresholds, noPtyp: Thresholds)

  private val tSchema = StructType(Seq(
    StructField("precise", DoubleType), StructField("balanced", DoubleType),
    StructField("sensitive", DoubleType)))
  private val schema = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("thresholds", StructType(Seq(
      StructField("svm_cnn", tSchema),
      StructField("svm_cnn_ptyp", tSchema))))))

  /** Load a calibration artifact (the reference's JSON schema). */
  def load(spark: SparkSession, path: String): Config = {
    val row = spark.read.option("multiLine", "true").schema(schema).json(path)
      .select("thresholds.svm_cnn_ptyp.*", "thresholds.svm_cnn.*")
      .head()
    Config(
      withPtyp = Thresholds(row.getDouble(0), row.getDouble(1), row.getDouble(2)),
      noPtyp = Thresholds(row.getDouble(3), row.getDouble(4), row.getDouble(5)))
  }

  /** The ptyp trust gate (pubmed.py:360-369). */
  def modelChoice(status: Column, indexingMethod: Column): Column =
    when(status === "MEDLINE" && indexingMethod =!= "Automated", "svm_cnn_ptyp")
      .otherwise("svm_cnn")

  /** The three is_rct_* flags for a score under the gated model. */
  def flags(cfg: Config, status: Column, indexingMethod: Column,
      score: Column): Seq[Column] = {
    val ptyp = status === "MEDLINE" && indexingMethod =!= "Automated"
    def flag(pick: Thresholds => Double, name: String): Column =
      when(ptyp, score >= lit(pick(cfg.withPtyp)))
        .otherwise(score >= lit(pick(cfg.noPtyp))).as(name)
    Seq(flag(_.precise, "is_rct_precise"), flag(_.balanced, "is_rct_balanced"),
      flag(_.sensitive, "is_rct_sensitive"))
  }
}
