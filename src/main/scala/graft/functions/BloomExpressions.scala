package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Map-side Bloom-filter membership probe against a plan-bound filter
  * (Spark's own `org.apache.spark.util.sketch.BloomFilter`, built with
  * `DataFrameStatFunctions.bloomFilter`).
  *
  * The scale story (q86): a broadcast hash join spends ~O(100) bytes
  * per build-side key; bloom bits spend ~10 BITS per key at 1% fpp —
  * the factor that keeps a giant-but-bounded probe set (a benchmark
  * suite's full shingle inventory, a denylist) plan-shippable after it
  * outgrows a hash build side. A bloom never false-negatives, so
  * using it as a PREFILTER before an exact confirm join preserves
  * exact results while discarding ~all non-matching rows inside the
  * scan stage.
  */
object Bloom {
  def mightContain(bf: BloomFilter, h: Long): Boolean = bf.mightContainLong(h)

  /** Column API: `bloom_might_contain(h)` for a long column. */
  def mightContainCol(c: Column, bf: BloomFilter): Column =
    GraftShim.column(BloomMightContain(GraftShim.expression(c), bf))
}

/** `bloom_might_contain(h)` against a plan-bound BloomFilter. */
case class BloomMightContain(child: Expression, bf: BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bf.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bf, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
