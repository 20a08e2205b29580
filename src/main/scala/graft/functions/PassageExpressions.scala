package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expressions for passage-level boilerplate removal
  * (q85): chunking a document into aligned fixed-width token passages
  * and rebuilding it from the passages that survive a hot-set filter.
  *
  * Same motivation as [[Hash32]]: the HOF formulation
  * (`transform(sequence(...), i => concat_ws(slice(...)))` +
  * `filter(chunks, not array_contains(...))`) is interpreted AND
  * re-evaluated once per consumer (`CollapseProject` inlines aliases;
  * lambda bodies get no CSE), so a three-field output re-chunked every
  * row three times. An opaque codegen expression evaluates once per
  * row inside the WholeStageCodegen span.
  */
object Passage {

  /** Aligned chunk width in tokens. Granularity is a parameter of the
    * operator; 4 matches the q85 oracle.
    */
  val ChunkLen = 4

  /** Aligned passages: tokens (Spark `split(text, " ")` semantics,
    * trailing empties kept) grouped ChunkLen at a time, each group
    * re-joined with single spaces; the tail keeps its partial chunk.
    */
  def chunks(text: String): Array[String] = {
    val ws = text.split(" ", -1)
    val n = (ws.length + ChunkLen - 1) / ChunkLen
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder()
      var j = i * ChunkLen
      val end = math.min(j + ChunkLen, ws.length)
      while (j < end) {
        if (j > i * ChunkLen) sb.append(' ')
        sb.append(ws(j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  def chunksArrayData(text: UTF8String): GenericArrayData =
    new GenericArrayData(
      chunks(text.toString).map(UTF8String.fromString(_): Any))

  /** One rebuild pass: (n_chunks, n_kept, surviving chunks re-joined
    * with single spaces, original order).
    */
  def rebuild(text: UTF8String, hot: PassageHotSet): GenericInternalRow = {
    val cs = chunks(text.toString)
    val sb = new java.lang.StringBuilder()
    var kept = 0
    var i = 0
    while (i < cs.length) {
      if (!hot.set.contains(cs(i))) {
        if (kept > 0) sb.append(' ')
        sb.append(cs(i))
        kept += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      cs.length.toLong, kept.toLong, UTF8String.fromString(sb.toString)))
  }

  /** Column API: array<string> of aligned passages. */
  def chunksCol(c: Column): Column =
    GraftShim.column(ChunkArray(GraftShim.expression(c)))

  /** Column API: struct<n_chunks,n_kept,kept_text> rebuild against a
    * driver-built hot set.
    */
  def rebuildCol(c: Column, hotChunks: Array[String]): Column =
    GraftShim.column(
      PassageRebuild(GraftShim.expression(c), new PassageHotSet(hotChunks)))
}

/** Driver-built boilerplate set, shipped to executors inside the
  * serialized plan (the [[IvfCodebook]] seam — a hot set past tens of
  * MB would ride a `SparkContext.broadcast` handle instead, same
  * expression shape). The probe set is materialized lazily per
  * deserialized instance.
  */
final class PassageHotSet(val hotChunks: Array[String]) extends Serializable {
  @transient lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(hotChunks.length * 2, 16))
    hotChunks.foreach(s.add)
    s
  }
}

/** `passage_chunks(text)`: aligned fixed-width token passages. */
case class ChunkArray(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "passage_chunks"

  override protected def nullSafeEval(input: Any): Any =
    Passage.chunksArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Passage.chunksArrayData($c)")

  override protected def withNewChildInternal(newChild: Expression): ChunkArray =
    copy(child = newChild)
}

/** `passage_rebuild(text)` against a plan-bound hot set:
  * struct<n_chunks:long, n_kept:long, kept_text:string>.
  */
case class PassageRebuild(child: Expression, hot: PassageHotSet)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_chunks", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("kept_text", StringType, nullable = false)))
  override def prettyName: String = "passage_rebuild"

  override protected def nullSafeEval(input: Any): Any =
    Passage.rebuild(input.asInstanceOf[UTF8String], hot)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hotRef = ctx.addReferenceObj("passageHotSet", hot,
      classOf[PassageHotSet].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Passage.rebuild($c, $hotRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PassageRebuild =
    copy(child = newChild)
}
