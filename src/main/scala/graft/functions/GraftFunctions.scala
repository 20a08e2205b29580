package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.GraftShim

/** SQL-function descriptors for graft's native Catalyst expressions —
  * one registry consumed by both registration paths:
  * [[graft.GraftExtensions]] (`spark.sql.extensions`, at session build)
  * and [[GraftFunctions.register]] (live session).
  */
object GraftFunctions {

  private def desc(
      name: String,
      clazz: Class[_],
      arity: Int,
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    descRange(name, clazz, arity, arity, builder)

  /** Like [[desc]] but with an optional trailing argument range
    * (`rh_band_keys(v)` vs `rh_band_keys(v, ppb)`).
    */
  private def descRange(
      name: String,
      clazz: Class[_],
      minArity: Int,
      maxArity: Int,
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val checked = (exprs: Seq[Expression]) => {
      require(exprs.length >= minArity && exprs.length <= maxArity,
        if (minArity == maxArity)
          s"$name expects $minArity argument(s), got ${exprs.length}"
        else
          s"$name expects $minArity to $maxArity arguments, got ${exprs.length}")
      builder(exprs)
    }
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), checked)
  }

  /** `mesh_for(text, k)`'s field index must be a foldable int literal
    * (it parameterizes the expression, it is not per-row data).
    */
  private def literalInt(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: field index must be a literal")
    e.eval() match {
      case i: Int => i
      case other  => throw new IllegalArgumentException(
        s"$fn: field index must be an int literal, got $other")
    }
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    desc("shingle_h32", classOf[ShingleHash32], 1, es => ShingleHash32(es.head)),
    desc("bigram_h32", classOf[BigramHash32], 1, es => BigramHash32(es.head)),
    desc("distinct_token_h32", classOf[DistinctTokenHash32], 1,
      es => DistinctTokenHash32(es.head)),
    desc("simhash32", classOf[SimHash32], 1, es => SimHash32(es.head)),
    desc("bigram_stats32", classOf[BigramStats32], 1, es => BigramStats32(es.head)),
    desc("mesh_for", classOf[MeshFor], 2,
      es => MeshFor(es.head, literalInt(es(1), "mesh_for"))),
    desc("dot_product", classOf[DotProduct], 2, es => DotProduct(es.head, es(1))),
    desc("squared_norm", classOf[SquaredNorm], 1, es => SquaredNorm(es.head)),
    descRange("rh_band_keys", classOf[RhBandKeys], 1, 2,
      es => RhBandKeys(es.head,
        if (es.length > 1) literalInt(es(1), "rh_band_keys")
        else RhOps.minPlanesPerBand)),
    desc("rh_probed_band_keys", classOf[RhProbedBandKeys], 3,
      es => RhProbedBandKeys(es.head,
        literalInt(es(1), "rh_probed_band_keys"),
        literalInt(es(2), "rh_probed_band_keys"))),
    desc("rct_class", classOf[graft.domain.RctClass], 1,
      es => graft.domain.RctClass(es.head)))

  /** Register every graft function on an existing session. Idempotent
    * (re-registration overwrites with identical builders).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      GraftShim.registerFunction(spark, ident.funcName, info, builder)
    }
}
