package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: makes every graft native expression
  * callable from pure SQL, so a `spark.sql(...)`-only user gets the
  * codegen'd operators without touching the Column API:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * spark.sql("SELECT doc_id, simhash32(text) FROM documents")
  * }}}
  *
  * For a session that already exists (notebooks, tests), use
  * [[graft.functions.GraftFunctions.register]] instead.
  *
  * This is deliberately the WHOLE extension surface: graft needs no
  * custom logical plans, optimizer rules, or physical strategies —
  * every operator is expressed through the declarative DataFrame API
  * (so Catalyst keeps optimizing it), and only per-row hot loops are
  * native expressions (the brief's preference order (a)/(b)).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.all.foreach(ext.injectFunction)
}
