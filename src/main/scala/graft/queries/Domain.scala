package graft.queries

/** Domain operators from the reference (is_rct rules, registry-id regex,
  * multi-format dates, page ranges, citations, concept expansion) run
  * over inline fixture VALUES so the DuckDB oracle sees identical input.
  * Populated incrementally — see graft.annotate / graft.concepts.
  */
object Domain {
  val queries: Seq[Q] = Seq()
}
