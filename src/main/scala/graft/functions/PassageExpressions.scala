package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Codegen entry point: rebuild against a torrent-broadcast hot set
    * (one executor-local fetch, not one copy per serialized task).
    */
  def rebuildB(text: UTF8String, hot: Broadcast[PassageHotSet]): GenericInternalRow =
    rebuild(text, hot.value)

  /** Column API: struct<n_chunks,n_kept,kept_text> rebuild against a
    * broadcast hot set (see [[broadcastHotSet]]).
    */
  def rebuildCol(c: Column, hot: Broadcast[PassageHotSet]): Column =
    GraftShim.column(PassageRebuild(GraftShim.expression(c), hot))

  /** Build the boilerplate set as a torrent-broadcast handle with an
    * EXPLICIT size cap. Unlike the q69 feature ordering, the rebuild's
    * OUTPUT depends on every member of this set — a silent truncation
    * would silently keep boilerplate — so overflow FAILS LOUDLY: raise
    * the df threshold (the hot set is at most corpus_chunks/T, and
    * boilerplate by definition repeats, so a higher T keeps it tiny) or
    * move to the q86 shape (bloom prefilter + exact anti-join) past
    * broadcast scale. The fetch is a distributed TakeOrdered, never an
    * unbounded collect.
    *
    * @param chunkRows frame with one string column `chunk`, already
    *                  thresholded (df ≥ T)
    */
  def broadcastHotSet(chunkRows: DataFrame, cap: Int = PassageHotSet.MaxChunks)
      : Broadcast[PassageHotSet] = {
    import org.apache.spark.sql.functions.col
    val rows = chunkRows.orderBy(col("chunk")).limit(cap + 1).collect()
    require(rows.length <= cap,
      s"hot-chunk set exceeds the $cap-entry broadcast cap: raise the " +
        "df threshold or use the bloom-prefiltered anti-join (q86 shape)")
    // lifecycle: the caller owns the handle — in a long-lived session,
    // destroy() it once the consuming action has run (ContextCleaner
    // reclaims on GC otherwise)
    chunkRows.sparkSession.sparkContext
      .broadcast(new PassageHotSet(rows.map(_.getString(0))))
  }
}

/** Driver-built boilerplate set, shipped as a `SparkContext.broadcast`
  * handle (one torrent fetch per executor; tasks serialize only the
  * handle id). Size is bounded by construction:
  * [[Passage.broadcastHotSet]] refuses sets past
  * [[PassageHotSet.MaxChunks]]. The probe set is materialized lazily
  * per deserialized instance.
  */
final class PassageHotSet(val hotChunks: Array[String]) extends Serializable {
  @transient lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(hotChunks.length * 2, 16))
    hotChunks.foreach(s.add)
    s
  }
}

object PassageHotSet {
  /** Hard cap on broadcast hot-set cardinality: 2^20 chunks of ~4
    * tokens ≈ tens of MB — the edge of comfortable broadcast scale.
    */
  val MaxChunks: Int = 1 << 20
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

/** `passage_rebuild(text)` against a broadcast hot set:
  * struct<n_chunks:long, n_kept:long, kept_text:string>.
  */
case class PassageRebuild(child: Expression, hot: Broadcast[PassageHotSet])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_chunks", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("kept_text", StringType, nullable = false)))
  override def prettyName: String = "passage_rebuild"

  override protected def nullSafeEval(input: Any): Any =
    Passage.rebuildB(input.asInstanceOf[UTF8String], hot)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hotRef = ctx.addReferenceObj("passageHotSetBc", hot,
      classOf[Broadcast[PassageHotSet]].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Passage.rebuildB($c, $hotRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PassageRebuild =
    copy(child = newChild)
}
