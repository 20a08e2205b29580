package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, Distribution, IdentityBroadcastMode,
  UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Keyless points-in-intervals RANGE JOIN as a NATIVE Catalyst
  * operator — the second operator family the brief names ("as-of join,
  * range join") taken to rung (c) of the custom-operator ladder, beside
  * [[AsOfJoin]]: logical node + planner strategy + a physical operator
  * that asks the engine to BROADCAST the interval side and then answers
  * each point by search instead of enumeration.
  *
  * Same semantics as the composed [[graft.ops.RangeJoin
  * .pointsInIntervals]] (bin-blocked equi-join): every (point,
  * interval) pair with `start <= ts < end`, inner. NativeRangeSpec pins
  * the two implementations against each other on randomized inputs,
  * and q123 pins this one against q80's DuckDB inequality-join oracle.
  *
  * Why this exec beats what Spark plans natively: the naive
  * `ON ts >= s AND ts < e` becomes BroadcastNestedLoopJoin — every
  * point probes EVERY interval, O(|P|·|I|) comparisons. Here the
  * broadcast intervals are sorted by start once per partition, each
  * point binary-searches the last interval with `start <= ts`
  * (O(log |I|)) and walks left only while the PREFIX-MAX of interval
  * ends still reaches the point (O(matches) for non-pathological
  * overlap, e.g. the bounded-width incident windows of q80/q123) —
  * O(|P|·log |I| + output) total. vs the composed bin-blocked form:
  * no interval duplication into bins, no shuffle of the point side at
  * all (it stays in its scan stage), and no bin-width parameter to
  * tune; the trade is a broadcast-sized interval side, exactly the
  * regime the incident-window family lives in.
  *
  * Restriction (documented, checked): ts/start/end must be LongType —
  * the integer-microsecond convention every temporal operator in this
  * engine already uses. Null timestamps/bounds never match (inner-join
  * null semantics).
  */
case class RangeJoin(
    points: LogicalPlan,
    intervals: LogicalPlan,
    pointTs: Attribute,
    start: Attribute,
    end: Attribute) extends BinaryNode {

  require(pointTs.dataType == LongType && start.dataType == LongType &&
    end.dataType == LongType,
    s"native range join needs Long (µs) bounds, got " +
      s"${pointTs.dataType}/${start.dataType}/${end.dataType}")

  override def left: LogicalPlan = points
  override def right: LogicalPlan = intervals
  override def output: Seq[Attribute] = points.output ++ intervals.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoin =
    copy(points = newLeft, intervals = newRight)
}

/** Plans [[RangeJoin]] to [[BroadcastRangeJoinExec]]; injected beside
  * [[AsOfJoinStrategy]] via `experimental.extraStrategies` and
  * `spark.sql.extensions` → [[graft.GraftExtensions]].
  */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: RangeJoin =>
      BroadcastRangeJoinExec(j.pointTs, j.start, j.end,
        planLater(j.points), planLater(j.intervals)) :: Nil
    case _ => Nil
  }
}

/** Physical broadcast range join (see [[RangeJoin]] for the search
  * design). Distribution contract: points unspecified (whatever layout
  * they already have — typically still their scan stage), intervals
  * broadcast whole (IdentityBroadcastMode, the BroadcastNestedLoopJoin
  * build mode).
  */
case class BroadcastRangeJoinExec(
    pointTs: Attribute,
    start: Attribute,
    end: Attribute,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val tsE = pointTs
    val startE = start
    val endE = end
    val outAttrs = output
    val broadcastRelation = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions { pIter =>
      // sorted-interval index built ONCE PER EXECUTOR per broadcast
      // value (BroadcastHashJoin's relation-sharing discipline) — a
      // per-partition rebuild would redo the copy+sort |tasks| times
      val idx = BroadcastRangeJoinExec.indexFor(
        broadcastRelation.value, startE, endE, rOut)
      val n = idx.starts.length

      val tsProj = UnsafeProjection.create(Seq(tsE: org.apache.spark.sql.catalyst.expressions.Expression), lOut)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      pIter.flatMap { l =>
        val tsRow = tsProj(l)
        if (tsRow.isNullAt(0) || n == 0) Iterator.empty
        else {
          val ts = tsRow.getLong(0)
          // binary search: hi = index AFTER the last start <= ts
          var lo = 0; var hi = n
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (idx.starts(mid) <= ts) lo = mid + 1 else hi = mid
          }
          val upper = lo
          new Iterator[InternalRow] {
            private var j = upper - 1
            private var ready: InternalRow = _
            private def seek(): Unit = {
              while (ready == null && j >= 0 && idx.prefixMaxEnd(j) > ts) {
                if (idx.ends(j) > ts) ready = idx.rows(j)
                j -= 1
              }
            }
            override def hasNext: Boolean = { seek(); ready != null }
            override def next(): InternalRow = {
              seek()
              val r = ready; ready = null
              outProj(joined(l, r))
            }
          }
        }
      }
    }
  }
}

object BroadcastRangeJoinExec {

  /** Immutable per-executor index over a broadcast interval array:
    * intervals sorted by start with a prefix-max of ends.
    */
  final class SortedIntervals(
      val starts: Array[Long],
      val ends: Array[Long],
      val rows: Array[InternalRow],
      val prefixMaxEnd: Array[Long])

  // WeakHashMap keyed on the broadcast's value array: entries die with
  // the broadcast block (GC), so the cache cannot outlive the data it
  // indexes; synchronized because executor task threads share it. The
  // inner map keys on the (start, end) expression ids — ReuseExchange
  // can hand the SAME array to two execs binding DIFFERENT interval
  // columns, and an index built for the wrong pair would silently
  // return wrong rows.
  //
  // The monitor guards LOOKUP and PUBLISH only — the copy+sort build
  // runs outside it (compute-then-putIfAbsent): holding the lock
  // through a full index build would serialize the first task of
  // every partition, and any concurrent UNRELATED range join, behind
  // one build. Two threads racing the same (array, cols) key can both
  // build; the first publish wins and the duplicate is garbage — a
  // bounded, rare cost, vs a convoy on every query.
  private val cache = new java.util.WeakHashMap[
    Array[InternalRow], scala.collection.mutable.Map[(Long, Long), SortedIntervals]]

  private[plans] def indexFor(
      rRows: Array[InternalRow],
      startE: Attribute,
      endE: Attribute,
      rOut: Seq[Attribute]): SortedIntervals = {
    val colKey = (startE.exprId.id, endE.exprId.id)
    val hit = cache.synchronized {
      val byCols = cache.get(rRows)
      if (byCols == null) None else byCols.get(colKey)
    }
    hit.getOrElse {
      val startProj = UnsafeProjection.create(
        Seq(startE: org.apache.spark.sql.catalyst.expressions.Expression), rOut)
      val endProj = UnsafeProjection.create(
        Seq(endE: org.apache.spark.sql.catalyst.expressions.Expression), rOut)
      val triples = rRows.flatMap { r =>
        val s = startProj(r)
        val e = endProj(r)
        if (s.isNullAt(0) || e.isNullAt(0)) None
        else Some((s.getLong(0), e.getLong(0), r.copy()))
      }.sortBy(t => t._1)
      val n = triples.length
      val starts = new Array[Long](n)
      val ends = new Array[Long](n)
      val rows = new Array[InternalRow](n)
      val prefixMaxEnd = new Array[Long](n)
      var i = 0
      var runMax = Long.MinValue
      while (i < n) {
        starts(i) = triples(i)._1; ends(i) = triples(i)._2
        rows(i) = triples(i)._3
        runMax = math.max(runMax, ends(i)); prefixMaxEnd(i) = runMax
        i += 1
      }
      val built = new SortedIntervals(starts, ends, rows, prefixMaxEnd)
      cache.synchronized {
        val byCols = {
          val existing = cache.get(rRows)
          if (existing != null) existing
          else {
            val fresh =
              scala.collection.mutable.Map.empty[(Long, Long), SortedIntervals]
            cache.put(rRows, fresh)
            fresh
          }
        }
        byCols.getOrElseUpdate(colKey, built)
      }
    }
  }
}
