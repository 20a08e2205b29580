package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.annotate.Minimap
import graft.domain.Rules

/** ICTRP CSV reader + record parser (S5; reference: ictrp_csv.py:58-92
  * positional header mapping, 225-282 parse_ictrp).
  *
  * The export is a headerless 60-column CSV; named columns are mapped
  * by position. All of parse_ictrp's semantics are preserved:
  *  - the 'NULL' sentinel becomes the string "unknown" through
  *    parsenull — so a NULL title parses to ti="unknown" and NULL
  *    interventions to ["unknown"] (reference quirks);
  *  - countries does NOT go through parsenull: a literal 'NULL' yields
  *    ["NULL"] (ictrp_csv.py:268-271);
  *  - target_size normalizes via integer round-trip ("0012" -> "12"),
  *    >10 digits or non-numeric -> "unknown";
  *  - date_registered via the per-registry format table (incl. its
  *    unreachable-key quirks), year derived from it;
  *  - *_mesh columns run the minimap concept mapper over the cleaned
  *    non-empty spans (get_unique_terms).
  * One deviation: `countries` preserves first-occurrence order of the
  * distinct values, where the reference's `list(set(...))` order is
  * Python-hash nondeterministic.
  */
object IctrpCsv {

  /** Positional names (ictrp_csv.py:58-71); unnamed positions keep
    * their index as name.
    */
  val columnNames: Seq[String] = {
    val base = (0 until 60).map(_.toString).toArray
    base(0) = "study_id"
    base(4) = "scientific_title"
    base(5) = "url"
    base(19) = "study_design"
    base(21) = "date_registered_raw"
    base(23) = "target_size"
    base(24) = "recruitment_status"
    base(28) = "countries_raw"
    base(29) = "health_conditions"
    base(30) = "interventions_raw"
    base(33) = "primary_outcome"
    base(34) = "secondary_outcomes"
    base.toSeq
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "false").csv(path).toDF(columnNames: _*)

  /** parsenull (ictrp_csv.py:225-229). */
  private def parsenull(c: Column, default: String = "unknown"): Column =
    when(c === "NULL", default).otherwise(c)

  private def splitTrim(c: Column): Column =
    transform(split(c, ";"), s => trim(s))

  private[io] val cleanupUdf = udf { spans: Seq[String] =>
    Minimap.uniqueTerms(
      spans.filter(s => s != null && s.nonEmpty)
        .map(s => s.replaceAll("[^a-zA-Z\\d]", " ").replaceAll("\\s\\s+", " ")))
      .map(_._1)
  }

  /** parse_ictrp as one map-side projection. */
  def parse(df: DataFrame): DataFrame = {
    val outcomes = concat(
      when(col("primary_outcome") =!= "NULL", splitTrim(col("primary_outcome")))
        .otherwise(array().cast("array<string>")),
      when(col("secondary_outcomes") =!= "NULL", splitTrim(col("secondary_outcomes")))
        .otherwise(array().cast("array<string>")))
    val tsTrim = trim(col("target_size"))
    val tsNum = tsTrim.cast("long")
    val targetSize = when(
      tsNum.isNotNull && length(tsNum.cast("string")) <= 10,
      tsNum.cast("string")).otherwise("unknown")
    val dateReg = Rules.dateRegistered(col("study_id"), col("date_registered_raw"))
    df.select(
      col("study_id").as("regid"),
      trim(parsenull(col("scientific_title"))).as("ti"),
      splitTrim(parsenull(col("health_conditions"))).as("population"),
      splitTrim(parsenull(col("interventions_raw"))).as("interventions"),
      outcomes.as("outcomes"),
      Rules.isRct(col("study_design")).as("is_rct"),
      lower(parsenull(col("recruitment_status"))).as("is_recruiting"),
      targetSize.as("target_size"),
      dateReg.as("date_registered"),
      year(dateReg).cast("long").as("year"),
      array_distinct(split(col("countries_raw"), ";")).as("countries"),
      cleanupUdf(splitTrim(parsenull(col("health_conditions")))).as("population_cuis"),
      cleanupUdf(splitTrim(parsenull(col("interventions_raw")))).as("interventions_cuis"),
      cleanupUdf(outcomes).as("outcomes_cuis"),
      col("url"))
  }
}
