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

  /** q127: ENTITY RESOLUTION — the step after pairwise linkage that
    * q104 stops short of: links are pairwise and non-transitive
    * (A matches B, B matches C, A never shares a block with C), but an
    * identity decision needs GROUPS. Edges come from TWO match rules —
    * the classic multi-rule linkage design: an exact rule (identical
    * (lang, title), a keyed equi-join) and the q104 fuzzy rule
    * (blocked Levenshtein, non-self) — and the union feeds the same
    * min-label connected-components operator the dedup pipeline uses
    * (q67, [[graft.ops.Cluster]]); every linked record reports its
    * entity id (min doc_id of the component) and entity size. One uniform-key shuffle per propagation round,
    * rounds = component diameter (tiny: linkage graphs are
    * near-cliques per entity). The oracle computes the identical
    * fixpoint via a recursive CTE over the same edge definition.
    */
  private val q127EntityResolution = Q(
    "q127_entity_resolution",
    (s, d) => {
      val titled = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("title"))
        .withColumn("block", element_at(split(col("title"), " "), 1))
      val dirty = titled.filter(col("doc_id") % 13 === 0)
        .select(col("doc_id").as("reg_id"), col("lang"), col("block"),
          expr("substring(title, 1, length(title) - 1)").as("q"))
      val fuzzyEdges = titled
        .select(col("doc_id").as("cand_id"), col("lang"), col("block"),
          col("title"))
        .join(broadcast(dirty), Seq("lang", "block"))
        .filter(levenshtein(col("q"), col("title")) <= 4 &&
          col("reg_id") =!= col("cand_id"))
        .select(col("reg_id").as("a_id"), col("cand_id").as("b_id"))
      val exactEdges = titled.select(col("doc_id").as("a_id"),
          col("lang"), col("title"))
        .join(titled.select(col("doc_id").as("b_id"), col("lang"),
          col("title")), Seq("lang", "title"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
      val comp = graft.ops.Cluster.connectedComponents(
        fuzzyEdges.unionByName(exactEdges).distinct())
      val sizes = comp.groupBy(col("cluster"))
        .agg(count(lit(1)).as("entity_size"))
      comp.join(sizes, "cluster")
        .select(col("id").as("doc_id"), col("cluster").as("entity_id"),
          col("entity_size"))
        .orderBy("doc_id")
    },
    Some("""WITH RECURSIVE t AS (SELECT doc_id, lang,
              array_to_string(string_split(text, ' ')[1:6], ' ') AS title,
              string_split(text, ' ')[1] AS block
            FROM documents),
      dirty AS (SELECT doc_id AS reg_id, lang, block,
                  substr(title, 1, length(title) - 1) AS q
                FROM t WHERE doc_id % 13 = 0),
      edges AS (SELECT DISTINCT a_id, b_id FROM (
                  SELECT d.reg_id AS a_id, c.doc_id AS b_id
                  FROM dirty d JOIN t c ON d.lang = c.lang AND d.block = c.block
                  WHERE levenshtein(d.q, c.title) <= 4 AND d.reg_id <> c.doc_id
                  UNION ALL
                  SELECT x.doc_id, y.doc_id
                  FROM t x JOIN t y ON x.lang = y.lang AND x.title = y.title
                  WHERE x.doc_id < y.doc_id)),
      sym AS (SELECT a_id AS src, b_id AS dst FROM edges
              UNION ALL SELECT b_id, a_id FROM edges),
      reach AS (SELECT src AS id, src AS lab FROM sym
                UNION
                SELECT s2.src, r.lab FROM sym s2 JOIN reach r ON s2.dst = r.id),
      comp AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY 1),
      sizes AS (SELECT cluster, count(*) AS entity_size FROM comp GROUP BY 1)
      SELECT c.id AS doc_id, c.cluster AS entity_id, z.entity_size
      FROM comp c JOIN sizes z ON c.cluster = z.cluster
      ORDER BY doc_id"""))

  val queries: Seq[Q] = Seq(q104FuzzyLinkage, q127EntityResolution)
}
