package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with codegen) for the hot per-document
  * signature computations of the dedup pipeline.
  *
  * Motivation: the same computations written with higher-order
  * functions (`transform`/`filter` lambdas) are (a) interpreted — HOF
  * lambdas never enter whole-stage codegen — and (b) repeatedly
  * re-evaluated, because `CollapseProject`/`PushDownPredicates` inline
  * projection aliases into every consumer. A single opaque expression
  * evaluates exactly once per row inside the WholeStageCodegen span.
  *
  * Hash parity: both expressions emit `h32` values — the big-endian
  * integer of the first 8 hex chars of md5 — exactly matching
  * [[Portable.h32]] / the DuckDB oracle formula
  * `CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)`.
  */
object Hash32 {
  /** h32 of a string: first 4 md5 bytes, big-endian, as a long. */
  def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Whitespace n-gram h32 hashes (split semantics identical to Spark
    * `split(text, " ")`, i.e. trailing empties kept) — the one
    * definition behind [[shingles]] (n=4) and [[bigrams]] (n=2).
    */
  private def ngrams(text: String, n: Int): Array[Long] = {
    val ws = text.split(" ", -1)
    if (ws.length < n) Array.emptyLongArray
    else {
      val out = new Array[Long](ws.length - n + 1)
      var i = 0
      while (i < out.length) {
        val sb = new java.lang.StringBuilder(ws(i))
        var j = 1
        while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
        out(i) = h32(sb.toString)
        i += 1
      }
      out
    }
  }

  /** Whitespace 4-gram shingle h32 hashes. */
  def shingles(text: String): Array[Long] = ngrams(text, 4)

  /** h32 of each distinct whitespace token, first-occurrence order
    * (matches `transform(array_distinct(split(text, ' ')), h32)`).
    */
  def distinctTokens(text: String): Array[Long] = {
    val ws = text.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < ws.length) { seen.add(ws(i)); i += 1 }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = h32(it.next()); i += 1 }
    out
  }

  /** 32-bit SimHash over the distinct-token h32s: bit j is set iff at
    * least half the token hashes have bit j set (2·ones ≥ n — ties and
    * the empty doc set the bit, matching the HOF formulation this
    * replaces: `2·size(filter(hs, bit_j)) >= size(hs)`). One pass per
    * row instead of 32 interpreted lambda evaluations re-referencing
    * the bound array.
    */
  def simhash(text: String): Long = {
    val hs = distinctTokens(text)
    val n = hs.length
    var out = 0L
    var j = 0
    while (j < 32) {
      var ones = 0
      var i = 0
      while (i < n) { if (((hs(i) >> j) & 1L) == 1L) ones += 1; i += 1 }
      if (2 * ones >= n) out |= (1L << j)
      j += 1
    }
    out
  }

  def simhashUTF8(text: UTF8String): Long = simhash(text.toString)

  /** Per-doc bigram repetition statistics in ONE pass: (occurrence
    * count, distinct count, max per-bigram count, occurrences belonging
    * to repeated bigrams). The HOF formulation (explode + two
    * aggregations) shuffles every bigram string twice; this never
    * leaves the row.
    */
  def bigramStats(text: UTF8String): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val ws = text.toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < ws.length - 1) {
      counts.merge(ws(i) + " " + ws(i + 1), 1, Integer.sum _)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (c > top) top = c
      if (c > 1L) dup += c
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](math.max(ws.length - 1, 0).toLong, counts.size.toLong, top, dup))
  }

  // entry points for generated code (UTF8String in, ArrayData out)
  def shinglesArrayData(text: UTF8String): GenericArrayData =
    new GenericArrayData(shingles(text.toString))
  def distinctTokensArrayData(text: UTF8String): GenericArrayData =
    new GenericArrayData(distinctTokens(text.toString))

  /** Synthetic concept annotations for field k (graft.query.Pico's
    * data model): every token w with h32(w)%3==k contributes a
    * struct(cui='C'+h32(w)%100, cui_str=w), in token order.
    */
  def meshFor(text: UTF8String, k: Int): GenericArrayData = {
    val ws = text.toString.split(" ", -1)
    val buf = scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    while (i < ws.length) {
      val h = h32(ws(i))
      if (h % 3 == k) {
        buf += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString("C" + (h % 100)),
            UTF8String.fromString(ws(i))))
      }
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  /** Whitespace bigram h32 hashes. */
  def bigrams(text: String): Array[Long] = ngrams(text, 2)

  def bigramsArrayData(s: UTF8String): GenericArrayData =
    new GenericArrayData(bigrams(s.toString))


  /** q214's 60-block locality-sensitive payload signature: bit i is
    * the h32 parity of the i-th equal character slice (Spark
    * `substring` semantics via UTF8String.substringSQL — an
    * out-of-range slice is the empty string, hashed like everything
    * else). One fused pass; the HOF formulation (transform + aggregate
    * over sequence(0,59)) evaluated 60 interpreted lambda steps per
    * row and dominated q214's sf0.1 time.
    */
  def blockSig60(text: UTF8String): Long = {
    val n = text.numChars()
    val L = math.max(n / 60, 1)
    var sig = 0L
    var i = 0
    while (i < 60) {
      val block = text.substringSQL(1 + i * L, L)
      sig += (h32(block.toString) % 2) << i
      i += 1
    }
    sig
  }


  /** The q106 hashed-feature margin: per token, bucket = h32(token)
    * % 4096, weight = h32("w:" + bucket) % 2001 − 1000 milli-units,
    * summed over the whitespace tokens (split semantics identical to
    * Spark `split(text, " ")`). One fused pass replacing the
    * interpreted aggregate-over-tokens fold shared by q106 and the
    * evaluation family built on it (q207/q211/q216/q220/q240).
    */
  def hashedMargin(text: UTF8String): Long = {
    val ws = text.toString.split(" ", -1)
    var sum = 0L
    var i = 0
    while (i < ws.length) {
      val bucket = h32(ws(i)) % 4096L
      sum += h32("w:" + bucket) % 2001L - 1000L
      i += 1
    }
    sum
  }

  /** Column API: per-doc 4-gram shingle h32 array. */
  def shingleHashes(c: Column): Column =
    GraftShim.column(ShingleHash32(GraftShim.expression(c)))

  /** Column API: per-doc bigram h32 array. */
  def bigramHashes(c: Column): Column =
    GraftShim.column(BigramHash32(GraftShim.expression(c)))

  /** Column API: per-doc distinct-token h32 array. */
  def tokenHashes(c: Column): Column =
    GraftShim.column(DistinctTokenHash32(GraftShim.expression(c)))

  /** Column API: field-k concept mesh (array<struct<cui,cui_str>>). */
  def meshForCol(c: Column, k: Int): Column =
    GraftShim.column(MeshFor(GraftShim.expression(c), k))

  /** Column API: 60-block payload signature (q214). */
  def blockSigCol(c: Column): Column =
    GraftShim.column(BlockSig60(GraftShim.expression(c)))

  /** Column API: hashed-feature milli-margin (q106 family). */
  def hashedMarginCol(c: Column): Column =
    GraftShim.column(HashedMargin(GraftShim.expression(c)))

  /** Column API: 32-bit SimHash of a text column. */
  def simhashCol(c: Column): Column =
    GraftShim.column(SimHash32(GraftShim.expression(c)))

  /** Column API: per-doc bigram repetition stats
    * (struct<n_bigrams,n_distinct,top_cnt,dup_occ>, all long).
    */
  def bigramStatsCol(c: Column): Column =
    GraftShim.column(BigramStats32(GraftShim.expression(c)))
}

/** `simhash32(text)`: 32-bit majority SimHash of distinct-token h32s.
  *
  * NULL contract: null-in/null-out (standard `nullSafeEval`). The HOF
  * formulation this replaced evaluated `size(null_tokens)` → null
  * condition → `otherwise(0)` on every bit, yielding 0L for NULL text.
  * Callers that must preserve that legacy value on a nullable text
  * column should wrap with `coalesce(simhashCol(c), lit(0L))`; the
  * q24 entry feeds `documents.text`, which is non-null by generation.
  */
case class SimHash32(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any =
    Hash32.simhashUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash32.simhashUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** `block_sig60(text)`: 60-bit block-parity payload signature. */
case class BlockSig60(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "block_sig60"

  override protected def nullSafeEval(input: Any): Any =
    Hash32.blockSig60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash32.blockSig60($c)")

  override protected def withNewChildInternal(newChild: Expression): BlockSig60 =
    copy(child = newChild)
}

/** `hashed_margin(text)`: summed hashed-feature milli-weights. */
case class HashedMargin(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_margin"

  override protected def nullSafeEval(input: Any): Any =
    Hash32.hashedMargin(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash32.hashedMargin($c)")

  override protected def withNewChildInternal(newChild: Expression): HashedMargin =
    copy(child = newChild)
}

abstract class Hash32ArrayExpression extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  protected def staticCall: String

  override protected def nullSafeEval(input: Any): Any =
    evalImpl(input.asInstanceOf[UTF8String])
  protected def evalImpl(s: UTF8String): GenericArrayData

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$staticCall($c)")
}

/** `shingle_h32(text)`: array of h32 hashes of whitespace 4-grams. */
case class ShingleHash32(child: Expression) extends Hash32ArrayExpression {
  override protected def staticCall: String =
    "graft.functions.Hash32.shinglesArrayData"
  override protected def evalImpl(s: UTF8String): GenericArrayData =
    Hash32.shinglesArrayData(s)
  override protected def withNewChildInternal(newChild: Expression): ShingleHash32 =
    copy(child = newChild)
  override def prettyName: String = "shingle_h32"
}

/** `bigram_h32(text)`: array of h32 hashes of whitespace bigrams. */
case class BigramHash32(child: Expression) extends Hash32ArrayExpression {
  override protected def staticCall: String =
    "graft.functions.Hash32.bigramsArrayData"
  override protected def evalImpl(s: UTF8String): GenericArrayData =
    Hash32.bigramsArrayData(s)
  override protected def withNewChildInternal(newChild: Expression): BigramHash32 =
    copy(child = newChild)
  override def prettyName: String = "bigram_h32"
}

/** `mesh_for(text, k)`: the synthetic concept-annotation array for
  * PICO field k — codegen'd single pass (the HOF filter+transform pair
  * would tokenize and re-hash per consumer).
  */
case class MeshFor(child: Expression, k: Int) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cui", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cui_str", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "mesh_for"

  override protected def nullSafeEval(input: Any): Any =
    Hash32.meshFor(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash32.meshFor($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MeshFor =
    copy(child = newChild)
}

/** `bigram_stats32(text)`: one-pass per-doc bigram repetition counters
  * (see [[Hash32.bigramStats]]). Null-in/null-out.
  */
case class BigramStats32(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_bigrams", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_cnt", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("dup_occ", LongType, nullable = false)))
  override def prettyName: String = "bigram_stats32"

  override protected def nullSafeEval(input: Any): Any =
    Hash32.bigramStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash32.bigramStats($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramStats32 =
    copy(child = newChild)
}

/** `distinct_token_h32(text)`: array of h32 hashes of distinct tokens. */
case class DistinctTokenHash32(child: Expression) extends Hash32ArrayExpression {
  override protected def staticCall: String =
    "graft.functions.Hash32.distinctTokensArrayData"
  override protected def evalImpl(s: UTF8String): GenericArrayData =
    Hash32.distinctTokensArrayData(s)
  override protected def withNewChildInternal(newChild: Expression): DistinctTokenHash32 =
    copy(child = newChild)
  override def prettyName: String = "distinct_token_h32"
}
