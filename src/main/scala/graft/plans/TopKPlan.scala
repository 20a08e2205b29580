package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-group TOP-K as a NATIVE Catalyst operator — the third native
  * operator family beside [[AsOfJoin]] and [[RangeJoin]], covering the
  * one ranked-retrieval shape Spark itself has no dedicated operator
  * for. The standard formulation (`row_number() OVER (PARTITION BY g
  * ORDER BY ...) <= k`, q10/q58's shape) plans as Window: ONE exchange
  * on g followed by a FULL SORT of every row in every group — at 100 TB
  * the sort of N rows costs N·log N and spills, all to discard
  * everything past rank k. This operator keeps a bounded HEAP of k rows
  * per group per task instead: a pre-shuffle partial pass caps what
  * rides the exchange at groups·k rows PER PARTITION (the map-side-
  * combine argument, same as partial aggregation), and the post-shuffle
  * final pass re-selects and emits each group's k rows in order with a
  * rank column appended. O(N·log k) comparisons, O(groups·k) task
  * memory, no full sort anywhere, and the input needs no ordering at
  * all (`requiredChildOrdering` is empty — the heap does the work the
  * sort would have).
  *
  * Determinism contract (same as the window form): the caller's
  * SortOrder must be a TOTAL order (include a tiebreaker column) or
  * rank assignment among ties is arbitrary. Null ordering follows the
  * SortOrder's default (ASC = nulls first), matching Spark's window
  * semantics; oracles with nulls in the sort key must spell NULLS
  * FIRST/LAST explicitly on the DuckDB side (its ASC default is nulls
  * LAST). NativeTopKSpec pins this operator against the Window
  * formulation on the real tables and on randomized inputs.
  */
case class TopKPerGroup(
    groupCols: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {

  require(k >= 1, s"top-k needs k >= 1, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank is born here, not derived from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans [[TopKPerGroup]] as final-over-partial (the aggregate
  * pattern); `EnsureRequirements` inserts the single hash exchange
  * between the two from the final node's distribution requirement.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerGroup =>
      FinalTopKExec(t.groupCols, t.order, t.k, t.rankAttr,
        PartialTopKExec(t.groupCols, t.order, t.k, planLater(t.child))) :: Nil
    case _ => Nil
  }
}

/** The shared bounded-heap pass: consume a partition, retain at most
  * the k first-in-sort-order rows per group key.
  */
private[plans] object TopKPass {

  def retain(
      iter: Iterator[InternalRow],
      groupExprs: Seq[Expression],
      childOut: Seq[Attribute],
      order: Seq[SortOrder],
      k: Int): java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]] = {
    val keyProj = UnsafeProjection.create(groupExprs, childOut)
    val ord = RowOrdering.create(order, childOut)
    // head of each queue = the WORST retained row (last in sort order)
    val worstFirst: java.util.Comparator[InternalRow] = ord.reverse
    val m = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var q = m.get(key)
      if (q == null) {
        q = new java.util.PriorityQueue[InternalRow](k, worstFirst)
        m.put(key.copy(), q)
      }
      if (q.size < k) q.add(row.copy())
      else if (ord.compare(row, q.peek()) < 0) { q.poll(); q.add(row.copy()) }
    }
    m
  }
}

/** Map-side pass: no distribution requirement, emits the retained rows
  * unordered (order is re-established after the exchange).
  */
case class PartialTopKExec(
    groupCols: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val groupExprs: Seq[Expression] = groupCols
    val childOut = child.output
    val (ord, kk) = (order, k)
    child.execute().mapPartitions { iter =>
      val m = TopKPass.retain(iter, groupExprs, childOut, ord, kk)
      import scala.jdk.CollectionConverters._
      m.values.iterator.asScala.flatMap(_.iterator.asScala)
    }
  }
}

/** Reduce-side pass: clustered on the group key, re-selects each
  * group's top k and emits them in sort order with the 1-based rank
  * appended.
  */
case class FinalTopKExec(
    groupCols: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val groupExprs: Seq[Expression] = groupCols
    val childOut = child.output
    val (ordSeq, kk) = (order, k)
    val outAttrs = output
    child.execute().mapPartitions { iter =>
      val m = TopKPass.retain(iter, groupExprs, childOut, ordSeq, kk)
      val ord = RowOrdering.create(ordSeq, childOut)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      import scala.jdk.CollectionConverters._
      m.values.iterator.asScala.flatMap { q =>
        val arr = q.toArray(new Array[InternalRow](q.size))
        java.util.Arrays.sort(arr, ord)
        arr.iterator.zipWithIndex.map { case (r, i) =>
          rankRow.update(0, (i + 1).toLong)
          outProj(joined(r, rankRow))
        }
      }
    }
  }
}
