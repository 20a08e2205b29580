package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.{IctrpCsv, IctrpJsonl}

/** ICTRP CSV end-to-end CORRECTNESS entry: positional 60-column read →
  * full parse_ictrp projection (F7/F8/F9/F15/P10 + minimap mesh), with
  * a literal expected-VALUES oracle pinning every quirk.
  */
object Ictrp {

  private def csvRow(fields: Map[Int, String]): String =
    (0 until 60).map(i => fields.getOrElse(i, "NULL")).mkString(",")

  private val fixtureCsv: String = Seq(
    csvRow(Map(
      0 -> "NCT01234567", 4 -> "Aspirin in MI trial", 5 -> "http://trials.example/a",
      19 -> "Randomized Controlled Trial", 21 -> "05/06/2019", 23 -> "500",
      24 -> "Recruiting", 28 -> "France;Germany;France",
      29 -> "Type 2 Diabetes; Hypertension", 30 -> "aspirin",
      33 -> "Mortality", 34 -> "QoL; Cost")),
    csvRow(Map(
      0 -> "ChiCTR1800012345", 19 -> "observational study", 21 -> "2018-01-31",
      23 -> "0012", 29 -> "diabetes", 34 -> "Pain score")),
    csvRow(Map(
      0 -> "XYZ999", 4 -> "Mystery trial", 5 -> "http://x",
      21 -> "31-12-2020", 23 -> "99999999999999", 24 -> "Not Recruiting",
      28 -> "Japan", 29 -> "common cold", 30 -> "heparin", 33 -> "Recovery"))
  ).mkString("\n")

  /** Hand-derived expectations (quirks annotated):
    *  - NULL title/interventions → "unknown" (parsenull);
    *  - NULL countries → the literal string "NULL" (no parsenull on
    *    that field); NULL url stays "NULL" (raw get);
    *  - ChiCTR date null (registry guesses "C"); target "0012" → "12";
    *  - 14-digit target → "unknown"; unknown registry date → null;
    *  - mesh cuis from the frozen minimap dictionaries.
    */
  private val expectedSql =
    """SELECT * FROM (VALUES
      ('ChiCTR1800012345', 'unknown', 'diabetes', 'unknown', 'Pain score',
       'non-RCT', 'unknown', '12', CAST(NULL AS DATE), CAST(NULL AS BIGINT),
       'NULL', 'C0011849', '', '', 'NULL'),
      ('NCT01234567', 'Aspirin in MI trial', 'Type 2 Diabetes|Hypertension',
       'aspirin', 'Mortality|QoL|Cost', 'RCT', 'recruiting', '500',
       DATE '2019-06-05', CAST(2019 AS BIGINT), 'France;Germany',
       'C0011860|C0020538', 'C0004057', '', 'http://trials.example/a'),
      ('XYZ999', 'Mystery trial', 'common cold', 'heparin', 'Recovery',
       'unknown', 'not recruiting', 'unknown', CAST(NULL AS DATE),
       CAST(NULL AS BIGINT), 'Japan', 'C0009443', 'C0019134', '', 'http://x')
      ) t(regid, ti, pop_s, int_s, out_s, is_rct, is_recruiting, target_size,
          date_registered, year, countries_s, pop_cuis_s, int_cuis_s,
          out_cuis_s, url)
      ORDER BY regid"""

  private val q50IctrpCsv = Q(
    "q50_ictrp_csv",
    (s, d) => {
      val dir = Files.createTempDirectory("graft-ictrp-")
      Files.writeString(dir.resolve("export.csv"), fixtureCsv)
      IctrpCsv.parse(IctrpCsv.read(s, dir.toString))
        .select(col("regid"), col("ti"),
          array_join(col("population"), "|").as("pop_s"),
          array_join(col("interventions"), "|").as("int_s"),
          array_join(col("outcomes"), "|").as("out_s"),
          col("is_rct"), col("is_recruiting"), col("target_size"),
          col("date_registered"), col("year"),
          array_join(col("countries"), ";").as("countries_s"),
          array_join(col("population_cuis"), "|").as("pop_cuis_s"),
          array_join(col("interventions_cuis"), "|").as("int_cuis_s"),
          array_join(col("outcomes_cuis"), "|").as("out_cuis_s"),
          col("url"))
        .orderBy("regid")
    },
    Some(expectedSql))

  // ---- q65: ICTRP gz JSON-lines → parse_ictrp → upload gate (S4) ------------

  /** Four-entry JSONL fixture (ictrp.py:294-341):
    *  - NCT01234567: full record, RCT, strict-date parse, "0500" → 500;
    *  - ChiCTR1800012345: 'observational study' → non-RCT, gated OUT;
    *  - ISRCTN12345678: missing title → "unknown", empty description
    *    struct → "", dd/mm/yyyy date fails the STRICT %Y-%m-%d parse →
    *    null date/year, 14-digit target → "unknown", 'Complete' →
    *    'unknown' recruiting;
    *  - NCT00000001: RCT but already stored → skipped by the done gate.
    */
  private val fixtureJsonl: String = Seq(
    """{"study_id":"NCT01234567","scientific_title":" Aspirin in MI trial ","health_conditions":[{"description":"Type 2 Diabetes"},{"description":" Hypertension "}],"interventions":[{"description":"aspirin"}],"outcomes":[{"description":"Mortality"},{"description":"QoL"}],"study_design":"Randomized Controlled Trial","recruitment_status":"Recruiting","target_size":"0500","date_registered":"2019-06-05","countries":["France","Germany"]}""",
    """{"study_id":"ChiCTR1800012345","scientific_title":"Obs study","study_design":"observational study","recruitment_status":"Recruiting","target_size":"10"}""",
    """{"study_id":"ISRCTN12345678","health_conditions":[{}],"study_design":"cluster randomization","recruitment_status":"Complete","target_size":"99999999999999","date_registered":"05/06/2019"}""",
    """{"study_id":"NCT00000001","scientific_title":"Done already","study_design":"rct","recruitment_status":"Recruiting"}"""
  ).mkString("\n")

  private val q65IctrpJsonl = Q(
    "q65_ictrp_jsonl",
    (s, d) => {
      import s.implicits._
      val dir = Files.createTempDirectory("graft-ictrpjl-")
      val gz = new java.util.zip.GZIPOutputStream(
        Files.newOutputStream(dir.resolve("ictrp-2026-08-01.json.gz")))
      try gz.write(fixtureJsonl.getBytes("UTF-8")) finally gz.close()
      val parsed = IctrpJsonl.parse(IctrpJsonl.read(s, dir.toString))
      IctrpJsonl.uploadable(parsed, Seq("NCT00000001").toDF("regid"))
        .select(col("regid"), col("ti"),
          array_join(col("population"), "|").as("pop_s"),
          size(col("population")).as("pop_n"),
          array_join(col("interventions"), "|").as("int_s"),
          size(col("interventions")).as("int_n"),
          array_join(col("outcomes"), "|").as("out_s"),
          col("is_rct"), col("is_recruiting"), col("target_size"),
          col("date_registered"), col("year"),
          array_join(col("countries"), ";").as("countries_s"),
          array_join(col("population_cuis"), "|").as("pop_cuis_s"),
          array_join(col("interventions_cuis"), "|").as("int_cuis_s"),
          array_join(col("outcomes_cuis"), "|").as("out_cuis_s"))
        .orderBy("regid")
    },
    Some("""SELECT * FROM (VALUES
      ('ISRCTN12345678', 'unknown', '', CAST(1 AS INT), '', CAST(0 AS INT), '',
       'RCT', 'unknown', 'unknown', CAST(NULL AS DATE), CAST(NULL AS BIGINT),
       '', '', '', ''),
      ('NCT01234567', 'Aspirin in MI trial', 'Type 2 Diabetes|Hypertension', 2,
       'aspirin', 1, 'Mortality|QoL', 'RCT', 'recruiting', '500',
       DATE '2019-06-05', CAST(2019 AS BIGINT), 'France;Germany',
       'C0011860|C0020538', 'C0004057', '')
      ) t(regid, ti, pop_s, pop_n, int_s, int_n, out_s, is_rct, is_recruiting,
          target_size, date_registered, year, countries_s, pop_cuis_s,
          int_cuis_s, out_cuis_s)
      ORDER BY regid"""))

  val queries: Seq[Q] = Seq(q50IctrpCsv, q65IctrpJsonl)
}
