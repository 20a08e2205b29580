package graft.domain

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd `is_rct` classifier (ictrp.py:169-186).
  *
  * The Column formulation (`exists(typedLit(phrases), p =>
  * cleaned.contains(p))` over a cleaned alias) re-evaluated the
  * lower+2×regexp_replace cleanup once per phrase probe — Catalyst
  * inlines projection aliases into every consumer and HOF lambdas are
  * interpreted with no CSE, so ~85 cleanups/row across the two lists.
  * Here the text is cleaned exactly once per row and probed against
  * the precompiled phrase arrays in a tight JVM loop, inside the
  * WholeStageCodegen span.
  *
  * Parity: lowercase via `UTF8String.toLowerCase` (the same call
  * Spark's `lower` makes), cleanup via java.util.regex with the same
  * patterns `regexp_replace` compiles, `String.contains` probes in
  * list order (non-RCT first) — bit-identical to the Column version
  * on every input.
  */
object RctOps {
  private val nonAlnum = Pattern.compile("[^a-zA-Z\\d]")
  private val multiWs = Pattern.compile("\\s\\s+")
  private val non: Array[String] = Rules.nonRctPhrases.toArray
  private val yes: Array[String] = Rules.rctPhrases.toArray
  private val UNKNOWN = UTF8String.fromString("unknown")
  private val NONRCT = UTF8String.fromString("non-RCT")
  private val RCT = UTF8String.fromString("RCT")

  def classify(sd: UTF8String): UTF8String = {
    if (sd == null) return UNKNOWN
    val cleaned = multiWs.matcher(
      nonAlnum.matcher(sd.toLowerCase.toString).replaceAll(" ")).replaceAll(" ")
    var i = 0
    while (i < non.length) { if (cleaned.contains(non(i))) return NONRCT; i += 1 }
    i = 0
    while (i < yes.length) { if (cleaned.contains(yes(i))) return RCT; i += 1 }
    UNKNOWN
  }
}

/** `rct_class(study_design)` → 'RCT' | 'non-RCT' | 'unknown' (never null). */
case class RctClass(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "rct_class"

  override def eval(input: InternalRow): Any =
    RctOps.classify(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cg = child.genCode(ctx)
    ev.copy(code = code"""
      ${cg.code}
      boolean ${ev.isNull} = false;
      org.apache.spark.unsafe.types.UTF8String ${ev.value} =
        graft.domain.RctOps.classify(${cg.isNull} ? null : ${cg.value});""")
  }

  override protected def withNewChildInternal(newChild: Expression): RctClass =
    copy(child = newChild)
}
