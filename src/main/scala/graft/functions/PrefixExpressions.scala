package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Codegen entry point: prefix against a torrent-broadcast ordering
    * (one executor-local fetch, not one copy per serialized task).
    */
  def prefixB(toks: ArrayData, dfm: Broadcast[FeatureDfMap]): GenericArrayData =
    prefix(toks, dfm.value)

  /** Column API: rarest-first prefix of an h32 feature array against a
    * broadcast feature ordering (see [[broadcastDfMap]]).
    */
  def prefixCol(c: Column, dfm: Broadcast[FeatureDfMap]): Column =
    GraftShim.column(PrefixFeatures(GraftShim.expression(c), dfm))

  /** Build the global (feature → df) ordering as a torrent-broadcast
    * handle with an EXPLICIT size cap: the top-`cap` features by df are
    * kept (fetched with a distributed TakeOrdered, never an unbounded
    * collect); everything past the cap reads df = 1. Truncation is
    * SOUND — the prefix filter only needs both documents to sort their
    * features by the same total order, and (df, w) with any subset of
    * dfs listed is still one — it only widens candidate buckets for the
    * features it demotes, and those are by construction the LEAST
    * frequent of the listed ones. Returns the handle plus a truncation
    * audit flag (at 100 TB this is the signal to raise the df
    * threshold, exactly like [[graft.ops.Dedup.oversized]] for bucket
    * caps).
    *
    * @param dfRows frame with columns (w: long, df: long), already
    *               thresholded (df ≥ T)
    */
  def broadcastDfMap(dfRows: DataFrame, cap: Int = FeatureDfMap.MaxEntries)
      : (Broadcast[FeatureDfMap], Boolean) = {
    import org.apache.spark.sql.functions.col
    val rows = dfRows.orderBy(col("df").desc, col("w")).limit(cap + 1).collect()
    val truncated = rows.length > cap
    if (truncated)
      // the audit is NEVER silent (the Dedup.oversized rule): callers
      // that drop the flag still get the operational signal
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "feature-df ordering truncated at {} entries — prefix filter " +
          "stays exact but candidate buckets widen; raise the df threshold",
        cap)
    val kept = if (truncated) rows.take(cap) else rows
    val dfm = new FeatureDfMap(
      kept.map(_.getLong(0)), kept.map(_.getLong(1)))
    // lifecycle: the caller owns the handle — in a long-lived session,
    // destroy() it once the consuming action has run (ContextCleaner
    // reclaims on GC otherwise)
    (dfRows.sparkSession.sparkContext.broadcast(dfm), truncated)
  }
}

/** Driver-built (feature → document frequency) table for the global
  * feature ordering, shipped as a `SparkContext.broadcast` handle (one
  * torrent fetch per executor; the expression serializes only the
  * handle id, never the table). Size is bounded by construction:
  * [[Prefix.broadcastDfMap]] keeps at most [[FeatureDfMap.MaxEntries]]
  * entries, highest-df first. Absent features read df = 1.
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

object FeatureDfMap {
  /** Hard entry cap for the broadcast ordering: 2^20 (feature, df)
    * pairs ≈ 16 MB of packed longs — comfortably torrent-shippable.
    */
  val MaxEntries: Int = 1 << 20
}

/** `prefix_features(toks)` against a broadcast global feature order:
  * the first `n - ceil(0.88 n) + 1` features in (df, feature)
  * ascending order.
  */
case class PrefixFeatures(child: Expression, dfm: Broadcast[FeatureDfMap])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "prefix_features"

  override protected def nullSafeEval(input: Any): Any =
    Prefix.prefixB(input.asInstanceOf[ArrayData], dfm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("featureDfMapBc", dfm,
      classOf[Broadcast[FeatureDfMap]].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.Prefix.prefixB($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PrefixFeatures =
    copy(child = newChild)
}
