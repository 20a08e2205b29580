package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Map-side rarest-first prefix extraction for the ascending-df
  * prefix-filtered Jaccard join (q69) — the MapReduce set-similarity
  * pattern of broadcasting the global token ordering (Vernica/Carey/Li,
  * SIGMOD 2010) instead of joining every feature row against the
  * document-frequency table and ranking through a window.
  *
  * The ordering rides the plan as a [[FeatureDfMap]]: only features
  * with df ≥ 2 are listed (a df-1 feature can never share a bucket, so
  * its exact rank is irrelevant); absent features default to df 1.
  * The comparison key packs (df, feature) into one long — df in the
  * high 32 bits — so the per-doc ordering is a single primitive-long
  * sort. Any GLOBAL total order keeps the prefix filter sound; listing
  * the frequent features exactly is what shrinks candidate buckets,
  * because they are the features that bloat them. At scale the
  * df-threshold is the size knob: features with df ≥ T number at most
  * occurrences/T, so the broadcast stays tens of MB on corpora whose
  * full feature dictionary does not.
  */
object Prefix {

  /** Prefix of the (df, w)-ascending feature order, length
    * `n - ceil(0.88·n) + 1` — the integer form `(n·8799+9999)/10000`
    * shared with q22's map-side order (the 8799 guards the float
    * boundary; see Pipeline.scala).
    */
  def prefix(toks: ArrayData, dfm: FeatureDfMap): GenericArrayData = {
    val n = toks.numElements()
    val keys = new Array[Long](n)
    var i = 0
    while (i < n) {
      val w = toks.getLong(i)
      // df < 2^31, w = h32 < 2^32: (df << 32) | w sorts by (df, w)
      keys(i) = (dfm.df(w) << 32) | w
      i += 1
    }
    java.util.Arrays.sort(keys)
    val prefLen = (n - (n * 8799L + 9999L) / 10000L + 1L).toInt
    val out = new Array[Long](math.max(math.min(prefLen, n), 0))
    i = 0
    while (i < out.length) { out(i) = keys(i) & 0xffffffffL; i += 1 }
    new GenericArrayData(out)
  }

  /** Column API: rarest-first prefix of an h32 feature array. */
  def prefixCol(c: Column, dfm: FeatureDfMap): Column =
    GraftShim.column(PrefixFeatures(GraftShim.expression(c), dfm))
}

/** Driver-built (feature → document frequency) table for the global
  * feature ordering, shipped inside the serialized plan (the
  * [[IvfCodebook]]/[[PassageHotSet]] seam). Lookup set materialized
  * lazily per deserialized instance; absent features read df = 1.
  */
final class FeatureDfMap(val feats: Array[Long], val dfs: Array[Long])
    extends Serializable {
  require(feats.length == dfs.length)
  @transient private lazy val map: java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](
      math.max(feats.length * 2, 16))
    var i = 0
    while (i < feats.length) { m.put(feats(i), dfs(i)); i += 1 }
    m
  }
  def df(w: Long): Long = {
    val v = map.get(w)
    if (v == null) 1L else v.longValue()
  }
}

/** `prefix_features(toks)` against a plan-bound global feature order:
  * the first `n - ceil(0.88 n) + 1` features in (df, feature)
  * ascending order.
  */
case class PrefixFeatures(child: Expression, dfm: FeatureDfMap)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "prefix_features"

  override protected def nullSafeEval(input: Any): Any =
    Prefix.prefix(input.asInstanceOf[ArrayData], dfm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("featureDfMap", dfm,
      classOf[FeatureDfMap].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.Prefix.prefix($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PrefixFeatures =
    copy(child = newChild)
}
