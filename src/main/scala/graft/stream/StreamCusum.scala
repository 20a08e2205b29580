package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One micro-batch of the STREAMING CUSUM MONITOR (q232's foreachBatch
  * body): batch 0 is the CALIBRATION window — it fixes the mean μ and
  * slack the detector runs with — and every later batch continues the
  * cumulative walk from standing state, emitting one (day, S, alarm)
  * row per monitored day. The walk uses q228's closed form WITHIN a
  * batch (cumsum − running min) seeded by the carried state, so the
  * streamed trajectory equals the batch closed form over the whole
  * monitored span exactly.
  *
  * State regime (the [[StreamNeardup]]/[[StreamDecontam]] subdir
  * contract): batch k READS state/b(k−1) and WRITES state/b(k) with
  * Overwrite — a retried batch re-reads the same input state and
  * rewrites the same outputs, so the step is idempotent without a
  * transaction log. State is two integers (last C, last running min)
  * plus the calibration row — never a growing table.
  */
object StreamCusum {

  def step(batch: DataFrame, batchId: Long, stateDir: String,
      verdictsDir: String): Unit = {
    val ss = batch.sparkSession
    val daily = batch.groupBy("day").agg(sum("v6").as("x"))
    // Empty micro-batches happen outside the mtime-pinned fixture (idle
    // source ticks): an empty calibration would write a null mu and an
    // empty monitoring batch would write empty state — either crashes
    // the NEXT batch's head()/getAs. Short-circuit: carry state forward.
    val isEmpty = daily.isEmpty
    if (batchId == 0L) {
      val cal =
        if (isEmpty)
          // neutral calibration: nothing observed yet → mu = 0
          ss.createDataFrame(Seq((0L, 0L, 0L))).toDF("mu", "c", "m")
        else daily.agg(sum("x").as("sx"), count(lit(1)).as("nd"))
          // floorDiv, not `div`: daily sums can be negative and the
          // q232 oracle floors with DuckDB `//`
          .select(expr(graft.queries.Sql.floorDiv("sx", "nd")).as("mu"),
            lit(0L).as("c"), lit(0L).as("m"))
      cal.coalesce(1).write.mode("overwrite").parquet(s"$stateDir/b0")
    } else {
      val st = ss.read.parquet(s"$stateDir/b${batchId - 1}").head()
      val (mu, c0, m0) = (st.getAs[Long]("mu"), st.getAs[Long]("c"),
        st.getAs[Long]("m"))
      // Math.floorDiv matches DuckDB `//` for negative mu where Scala
      // `/` truncates toward zero
      val slack = Math.floorDiv(mu, 20L)
      val thresh = Math.floorDiv(mu, 2L)
      val wc = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val walked = daily
        .withColumn("dev", col("x") - lit(mu) - lit(slack))
        .withColumn("c", lit(c0) + sum("dev").over(wc))
        .withColumn("m", least(lit(m0), min(col("c")).over(wc)))
        .withColumn("s", col("c") - least(lit(0L), col("m")))
      walked.select(lit(batchId).as("window_id"), col("day"),
          col("x").as("x_v6"), col("s").as("s_v6"),
          (col("s") > lit(thresh)).as("alarm"))
        .coalesce(1).write.mode("overwrite").parquet(s"$verdictsDir/b$batchId")
      val nextState =
        if (isEmpty)
          // no monitored days this tick: the walk is unchanged
          ss.createDataFrame(Seq((mu, c0, m0))).toDF("mu", "c", "m")
        else walked.orderBy(col("day").desc).limit(1)
          .select(lit(mu).as("mu"), col("c"), col("m"))
      nextState
        .coalesce(1).write.mode("overwrite").parquet(s"$stateDir/b$batchId")
    }
  }
}
