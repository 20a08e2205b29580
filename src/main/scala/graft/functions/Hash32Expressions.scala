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
  /** Per-thread MD5 digest + 16-byte output scratch.
    * `MessageDigest.getInstance` per call was the measured hot spot of
    * the whole shingle family (a synchronized JCA provider lookup +
    * allocation per HASH — millions per scan task): round 16 moved it
    * to one instance per thread; `digest(...)` resets the instance, so
    * reuse is safe.
    */
  private final class Md5Ctx {
    val md: java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Byte](16)
  }
  private val md5Local = new ThreadLocal[Md5Ctx] {
    override def initialValue(): Md5Ctx = new Md5Ctx
  }

  /** h32 over a byte range: first 4 md5 bytes, big-endian, as a long. */
  private def h32Range(b: Array[Byte], off: Int, len: Int): Long = {
    val ctx = md5Local.get()
    ctx.md.update(b, off, len)
    ctx.md.digest(ctx.out, 0, 16)
    val d = ctx.out
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** h32 of a string: first 4 md5 bytes, big-endian, as a long. */
  def h32(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    h32Range(b, 0, b.length)
  }

  /** h32 of a UTF8String (already UTF-8 — no transcode, no String). */
  def h32U(s: UTF8String): Long = {
    val b = s.getBytes
    h32Range(b, 0, b.length)
  }

  /** Start offset of every whitespace token of `b` (split on the 0x20
    * byte — in UTF-8 no continuation byte equals 0x20, so this is
    * byte-exact with `String.split(" ", -1)` including empty tokens),
    * plus a `len + 1` sentinel: token k spans
    * `[starts(k), starts(k + 1) - 1)`.
    */
  private def tokenStarts(b: Array[Byte]): Array[Int] = {
    var nTok = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < b.length) { if (b(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(nTok) = b.length + 1
    starts
  }

  /** Whitespace n-gram h32 hashes (split semantics identical to Spark
    * `split(text, " ")`, i.e. trailing empties kept) — the one
    * definition behind [[shingles]] (n=4) and [[bigrams]] (n=2).
    *
    * Tokens split on a single space are ADJACENT byte spans separated
    * by exactly one 0x20, so the n-gram string `w(i) ' ' … w(i+n-1)`
    * is byte-identical to the original text range
    * `[starts(i), starts(i + n) - 1)` — each hash reads the input
    * bytes in place (no per-shingle StringBuilder/String/encode; the
    * round-16 change that took the shingle family off the allocator).
    */
  private def ngramsBytes(b: Array[Byte], n: Int): Array[Long] = {
    val starts = tokenStarts(b)
    val nTok = starts.length - 1
    if (nTok < n) Array.emptyLongArray
    else {
      val out = new Array[Long](nTok - n + 1)
      var i = 0
      while (i < out.length) {
        val s0 = starts(i)
        out(i) = h32Range(b, s0, starts(i + n) - 1 - s0)
        i += 1
      }
      out
    }
  }

  private def ngrams(text: String, n: Int): Array[Long] =
    ngramsBytes(text.getBytes(java.nio.charset.StandardCharsets.UTF_8), n)

  /** Whitespace 4-gram shingle h32 hashes. */
  def shingles(text: String): Array[Long] = ngrams(text, 4)

  /** h32 of each distinct whitespace token, first-occurrence order
    * (matches `transform(array_distinct(split(text, ' ')), h32)`).
    */
  def distinctTokens(text: String): Array[Long] =
    distinctTokensBytes(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def distinctTokensBytes(b: Array[Byte]): Array[Long] = {
    val starts = tokenStarts(b)
    val nTok = starts.length - 1
    val seen = new java.util.HashSet[UTF8String]()
    // first-occurrence spans, packed (start, end) — dedup compares
    // token BYTES via UTF8String views over the shared array (no copy)
    val spans = new Array[Long](nTok)
    var kept = 0
    var k = 0
    while (k < nTok) {
      val s0 = starts(k)
      val e = starts(k + 1) - 1
      if (seen.add(UTF8String.fromBytes(b, s0, e - s0))) {
        spans(kept) = (s0.toLong << 32) | (e - s0).toLong
        kept += 1
      }
      k += 1
    }
    val out = new Array[Long](kept)
    var i = 0
    while (i < kept) {
      val sp = spans(i)
      out(i) = h32Range(b, (sp >>> 32).toInt, (sp & 0xffffffffL).toInt)
      i += 1
    }
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

  def simhashUTF8(text: UTF8String): Long = {
    val hs = distinctTokensBytes(text.getBytes)
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

  /** Per-doc bigram repetition statistics in ONE pass: (occurrence
    * count, distinct count, max per-bigram count, occurrences belonging
    * to repeated bigrams). The HOF formulation (explode + two
    * aggregations) shuffles every bigram string twice; this never
    * leaves the row.
    */
  def bigramStats(text: UTF8String): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    // bigram keys are byte SPANS of the input compared by content
    // (UTF8String views, no copy, no String) — the reconstruction
    // argument of [[ngramsBytes]] applies to n = 2
    val b = text.getBytes
    val starts = tokenStarts(b)
    val nTok = starts.length - 1
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    while (i < nTok - 1) {
      val s0 = starts(i)
      counts.merge(UTF8String.fromBytes(b, s0, starts(i + 2) - 1 - s0),
        Integer.valueOf(1), (a, c) => Integer.valueOf(a + c))
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
      Array[Any](math.max(nTok - 1, 0).toLong, counts.size.toLong, top, dup))
  }

  // entry points for generated code (UTF8String in, ArrayData out) —
  // hashing runs over the UTF8String's bytes directly (no toString)
  def shinglesArrayData(text: UTF8String): GenericArrayData =
    new GenericArrayData(ngramsBytes(text.getBytes, 4))
  def distinctTokensArrayData(text: UTF8String): GenericArrayData =
    new GenericArrayData(distinctTokensBytes(text.getBytes))

  /** Synthetic concept annotations for field k (graft.query.Pico's
    * data model): every token w with h32(w)%3==k contributes a
    * struct(cui='C'+h32(w)%100, cui_str=w), in token order.
    */
  def meshFor(text: UTF8String, k: Int): GenericArrayData = {
    val b = text.getBytes
    val starts = tokenStarts(b)
    val nTok = starts.length - 1
    val buf = scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    while (i < nTok) {
      val s0 = starts(i)
      val len = starts(i + 1) - 1 - s0
      val h = h32Range(b, s0, len)
      if (h % 3 == k) {
        buf += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString("C" + (h % 100)),
            UTF8String.fromBytes(b, s0, len)))
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
      sig += (h32U(block) % 2) << i
      i += 1
    }
    sig
  }

  /** h32("w:" + bucket) % 2001 − 1000 for every bucket — the q106
    * weight vector has only 4096 entries, so it is a table computed
    * once per JVM, not an md5 per TOKEN per row (which doubled the
    * margin pass's hash count).
    */
  private lazy val hashedWeights: Array[Long] =
    Array.tabulate(4096)(bk => h32("w:" + bk) % 2001L - 1000L)

  /** The q106 hashed-feature margin: per token, bucket = h32(token)
    * % 4096, weight = h32("w:" + bucket) % 2001 − 1000 milli-units,
    * summed over the whitespace tokens (split semantics identical to
    * Spark `split(text, " ")`). One fused pass replacing the
    * interpreted aggregate-over-tokens fold shared by q106 and the
    * evaluation family built on it (q207/q211/q216/q220/q240).
    */
  def hashedMargin(text: UTF8String): Long = {
    val b = text.getBytes
    val starts = tokenStarts(b)
    val nTok = starts.length - 1
    var sum = 0L
    var i = 0
    while (i < nTok) {
      val s0 = starts(i)
      val bucket = h32Range(b, s0, starts(i + 1) - 1 - s0) % 4096L
      sum += hashedWeights(bucket.toInt)
      i += 1
    }
    sum
  }

  /** MinHash-LSH band signatures of a shingle-hash array in ONE pass:
    * 8 fixed permutations `min((a_i·h + b_i) mod 2147483647)` folded
    * simultaneously, emitted as the 4 (band, "mh0,mh1") rows
    * [[graft.ops.Dedup.bandSignatures]] explodes. The HOF form — 8
    * `array_min(transform(hs, …))` — ran 8 interpreted lambda passes
    * and materialized 8 intermediate arrays per document (HOF lambdas
    * never enter whole-stage codegen); this loops the input once.
    * Empty input replays the HOF edge exactly: array_min(empty) is
    * NULL and concat_ws skips NULLs, so sig = "".
    */
  def minhashBandSigs(hs: org.apache.spark.sql.catalyst.util.ArrayData,
      params: Array[Long]): GenericArrayData = {
    val n = hs.numElements()
    val out = new Array[Any](4)
    val mins = new Array[Long](8)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {   // array_min skips nulls
        any = true
        val h = hs.getLong(i)
        var p = 0
        while (p < 8) {
          val v = (params(2 * p) * h + params(2 * p + 1)) % 2147483647L
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    var bd = 0
    while (bd < 4) {
      out(bd) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bd,
          if (any) UTF8String.fromString(
            java.lang.Long.toString(mins(2 * bd)) + "," +
              java.lang.Long.toString(mins(2 * bd + 1)))
          else UTF8String.EMPTY_UTF8))
      bd += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: the 4 MinHash band-signature rows (one fused pass). */
  def minhashBandSigsCol(c: Column): Column =
    GraftShim.column(MinhashBandSigs(GraftShim.expression(c)))

  /** Column API: h32 of a string column — the [[Portable.h32]] value
    * computed in ONE codegen'd call (md5 first-4-bytes big-endian)
    * instead of the md5 → 32-char hex string → substring → conv(16)
    * chain, which allocated three intermediate strings and a base-16
    * parse per row. Same value by construction.
    */
  def h32Col(c: Column): Column =
    GraftShim.column(H32(GraftShim.expression(c)))

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

/** `minhash_band_sigs(hs)`: array<struct<band int, sig string>> — the
  * 4 MinHash-LSH band signatures of a shingle-hash array, one fused
  * pass over the 8 fixed permutations of [[graft.ops.Dedup.mhParams]]
  * (flattened once at plan time; the parameter table is a constant).
  */
case class MinhashBandSigs(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("band",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("sig", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "minhash_band_sigs"

  override protected def nullSafeEval(input: Any): Any =
    Hash32.minhashBandSigs(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      MinhashBandSigs.flatParams)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Hash32.minhashBandSigs($c, " +
        "graft.functions.MinhashBandSigs$.MODULE$.flatParams())")

  override protected def withNewChildInternal(newChild: Expression): MinhashBandSigs =
    copy(child = newChild)
}

object MinhashBandSigs {
  /** (a0, b0, a1, b1, …) of the 8 fixed MinHash permutations. */
  val flatParams: Array[Long] =
    graft.ops.Dedup.mhParams.flatMap { case (_, a, b) => Seq(a, b) }.toArray
}

/** `h32(s)`: first 4 md5 bytes of the UTF-8 string, big-endian, as a
  * long — [[Portable.h32]]'s value without the hex-string detour.
  * NULL contract: null-in/null-out, like the md5 chain it replaces.
  */
case class H32(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "h32"

  override protected def nullSafeEval(input: Any): Any =
    Hash32.h32U(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash32.h32U($c)")

  override protected def withNewChildInternal(newChild: Expression): H32 =
    copy(child = newChild)
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
