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
  * [[graft.functions.GraftFunctions.register]] /
  * [[graft.plans.NativeAsOf.ensureRegistered]] instead.
  *
  * The extension surface is deliberately small: almost every operator
  * is expressed through the declarative DataFrame API (so Catalyst
  * keeps optimizing it), per-row hot loops are native expressions
  * (the brief's preference order (a)/(b)), and the THREE whole-operator
  * physical nodes — the backward as-of join, whose exchange shape no
  * composition can reproduce (see [[graft.plans.AsOfJoin]]), the
  * broadcast range join, whose search replaces BroadcastNestedLoop's
  * enumeration (see [[graft.plans.RangeJoin]]), and per-group top-k,
  * whose bounded heaps replace the window form's full per-group sort
  * (see [[graft.plans.TopKPerGroup]]) — are the planner strategies
  * (preference (c)).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
