package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Fuzzy RECORD LINKAGE — the registry-entry ↔ article matching
  * problem the reference's domain lives with (trial registrations and
  * publications carry near-identical but not byte-identical titles;
  * cf. the registry-links m:n join, SURVEY J4): match a dirty "registry
  * title" against the canonical corpus by edit distance WITHOUT the
  * O(|R|·|C|) all-pairs scan.
  *
  * Same portability contract as [[Pipeline]]: blocking keys and edit
  * distances are engine-exact (Levenshtein is the classic DP both
  * engines implement identically), so the DuckDB oracle replays every
  * pair.
  */
object Linkage {

  /** q104: BLOCKED Levenshtein linkage. The dirty side is derived
    * deterministically (docs with doc_id % 13 = 0; title = first six
    * tokens with the last character dropped — an edit-distance-1
    * corruption that leaves the leading token intact), the canonical
    * side is every document's title. The join blocks on (lang, first
    * token): candidate pairs only form inside a block, so the
    * quadratic Levenshtein DP runs on block-local pairs instead of the
    * cross product — the standard record-linkage blocking design. At
    * 100 TB the block key generalizes to (lang, sorted-rare-token
    * prefix) exactly like q69's df-ordered prefix, and the dirty side
    * (registry feeds are millions of rows, the corpus billions) rides
    * a broadcast, so the corpus never shuffles. Matches are pairs with
    * distance ≤ 4; the planted corruption guarantees every dirty row
    * finds its source at distance 1, and any additional block-local
    * near-titles surface with their true distance.
    */
  private val q104FuzzyLinkage = Q(
    "q104_fuzzy_linkage",
    (s, d) => {
      val titled = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("title"))
        .withColumn("block", element_at(split(col("title"), " "), 1))
      val dirty = titled.filter(col("doc_id") % 13 === 0)
        .select(col("doc_id").as("reg_id"), col("lang"), col("block"),
          expr("substring(title, 1, length(title) - 1)").as("q"))
      titled
        .select(col("doc_id").as("cand_id"), col("lang"), col("block"),
          col("title"))
        .join(broadcast(dirty), Seq("lang", "block"))
        .select(col("reg_id"), col("cand_id"),
          levenshtein(col("q"), col("title")).cast("long").as("dist"))
        .filter(col("dist") <= 4)
        .orderBy("reg_id", "cand_id")
    },
    Some("""WITH t AS (SELECT doc_id, lang,
              array_to_string(string_split(text, ' ')[1:6], ' ') AS title,
              string_split(text, ' ')[1] AS block
            FROM documents),
      dirty AS (SELECT doc_id AS reg_id, lang, block,
                  substr(title, 1, length(title) - 1) AS q
                FROM t WHERE doc_id % 13 = 0),
      cand AS (SELECT doc_id AS cand_id, lang, block, title FROM t)
      SELECT d.reg_id, c.cand_id,
        CAST(levenshtein(d.q, c.title) AS BIGINT) AS dist
      FROM dirty d JOIN cand c ON d.lang = c.lang AND d.block = c.block
      WHERE levenshtein(d.q, c.title) <= 4
      ORDER BY reg_id, cand_id"""),
    bench = true)

  val queries: Seq[Q] = Seq(q104FuzzyLinkage)
}
