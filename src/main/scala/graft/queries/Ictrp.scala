package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.IctrpCsv

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

  val queries: Seq[Q] = Seq(q50IctrpCsv)
}
