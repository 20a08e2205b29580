package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single most recent
  * right row with `right.ts <= left.ts` on the same key (the operator
  * the round brief flags as missing from Spark's built-ins; the naive
  * encoding `JOIN ON key AND r.ts <= l.ts` + keep-latest explodes to
  * O(|L|·|R|) per key before pruning).
  *
  * Formulation: UNION the two sides tagged, then ONE window pass per
  * key ordered by (ts, side, seq) carrying the last-seen right row
  * forward (`last(..., ignoreNulls)` over unbounded-preceding). Cost
  * is a single shuffle + sort of |L|+|R| rows — the same shape as any
  * windowed aggregation, no row blowup, AQE-skew-splittable.
  *
  * Determinism: at equal ts the right side sorts BEFORE the left side
  * (ties-inclusive semantics: a right row at exactly left.ts is
  * visible), and right-side ts ties resolve to the largest `seq`
  * (event id) — the total order every engine can reproduce.
  */
object AsOf {

  /** left/right share `keyCol`/`tsCol`; each brings its own
    * tie-breaking sequence column. Returns left rows with
    * `asof_<payload>` columns from the matched right row (null when no
    * right row precedes). `payloadCols` are the right-side columns to
    * carry; left keeps all its columns.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      leftSeqCol: String,
      rightSeqCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val carried = (rightSeqCol +: payloadCols).distinct
    val rTagged = right.select(
      col(keyCol) +: col(tsCol).as("__ts") +: col(rightSeqCol).cast("long").as("__seq") +:
        lit(1).as("__is_r") +:
        carried.map(c => col(c).as(s"__r_$c")): _*)
    val lTagged = left.select(
      col(keyCol) +: col(tsCol).as("__ts") +: col(leftSeqCol).cast("long").as("__seq") +:
        lit(0).as("__is_r") +:
        carried.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c"))
        :+ struct(left.columns.map(col): _*).as("__l"): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__is_r").desc, col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lTagged
      .unionByName(rTagged.withColumn("__l",
        lit(null).cast(lTagged.schema("__l").dataType)), allowMissingColumns = false)
      .select(col("*") +: carried.map(c =>
        last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
      .filter(col("__is_r") === 0)
    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    joined.select(leftCols ++ carried.map(c => col(s"asof_$c")): _*)
  }
}
