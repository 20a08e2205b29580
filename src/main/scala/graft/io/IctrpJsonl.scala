package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.domain.Rules

/** ICTRP gz JSON-lines reader + parse_ictrp projection (S4; reference:
  * ictrp.py:294-341 parse_file → upload_to_postgres, 190-254
  * parse_ictrp).
  *
  * Distinct from the CSV path (S5, [[IctrpCsv]]): fields arrive NAMED
  * (study_id, scientific_title, health_conditions[].description, ...),
  * date_registered parses STRICTLY as %Y-%m-%d (no per-registry format
  * table), and the upload gate keeps ONLY entries classifying as 'RCT'
  * plus skips already-stored regids (ictrp.py:313-327) — the CSV path
  * stores the is_rct label instead of filtering on it.
  *
  * Scale: the gz JSONL decompresses per-file; the projection is one
  * map-side select; the already-done skip is an anti-join (broadcast
  * when the done set is nightly-sized).
  */
object IctrpJsonl {

  private val descArr = ArrayType(StructType(Seq(
    StructField("description", StringType))))

  /** Declared schema for the parse.py output stream. */
  val schema: StructType = StructType(Seq(
    StructField("study_id", StringType),
    StructField("scientific_title", StringType),
    StructField("health_conditions", descArr),
    StructField("interventions", descArr),
    StructField("outcomes", descArr),
    StructField("study_design", StringType),
    StructField("recruitment_status", StringType),
    StructField("target_size", StringType),
    StructField("date_registered", StringType),
    StructField("countries", ArrayType(StringType))))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** descriptions, stripped; missing list → [], missing key → "". */
  private def descs(c: org.apache.spark.sql.Column) =
    coalesce(transform(c, r => trim(coalesce(r.getField("description"), lit("")))),
      array().cast("array<string>"))

  /** parse_ictrp (ictrp.py:190-254) as one map-side projection. */
  def parse(df: DataFrame): DataFrame = {
    val tsNum = trim(col("target_size")).cast("long")
    val targetSize = when(
      tsNum.isNotNull && length(tsNum.cast("string")) <= 10,
      tsNum.cast("string")).otherwise("unknown")
    val dateReg = try_to_date(col("date_registered"), "yyyy-MM-dd")
    df.select(
      col("study_id").as("regid"),
      coalesce(trim(col("scientific_title")), lit("unknown")).as("ti"),
      descs(col("health_conditions")).as("population"),
      descs(col("interventions")).as("interventions"),
      descs(col("outcomes")).as("outcomes"),
      Rules.isRct(col("study_design")).as("is_rct"),
      Rules.isRecruiting(col("recruitment_status")).as("is_recruiting"),
      targetSize.as("target_size"),
      dateReg.as("date_registered"),
      year(dateReg).cast("long").as("year"),
      coalesce(col("countries"), array().cast("array<string>")).as("countries"),
      IctrpCsv.cleanupUdf(descs(col("health_conditions"))).as("population_cuis"),
      IctrpCsv.cleanupUdf(descs(col("interventions"))).as("interventions_cuis"),
      IctrpCsv.cleanupUdf(descs(col("outcomes"))).as("outcomes_cuis"))
  }

  /** The upload gate (ictrp.py:313-327): RCT-classified entries only,
    * minus already-stored regids.
    */
  def uploadable(parsed: DataFrame, doneRegids: DataFrame): DataFrame =
    parsed.filter(col("is_rct") === "RCT")
      .join(doneRegids.select(col(doneRegids.columns.head).as("regid")),
        Seq("regid"), "left_anti")
}
