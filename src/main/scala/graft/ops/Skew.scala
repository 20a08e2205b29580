package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join/aggregation keys (SURVEY §2/optimizer
  * notes: "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join handles sort-merge skew automatically at runtime;
  * these helpers cover the cases AQE cannot: aggregation skew and
  * broadcast-infeasible skewed equi-joins against a replicable side.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from arbitrary columns
    * (xxhash64 — uniform, cheap, codegen'd). Deterministic salting
    * keeps retries/speculative tasks consistent, unlike rand().
    */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt), then final aggregate on key. Correct for any
    * algebraic aggregate expressed as (partial, merge) pairs.
    */
  def saltedCount(df: DataFrame, key: Column, saltSrc: Column, buckets: Int): DataFrame =
    df.groupBy(key.as("k"), salt(buckets, saltSrc).as("s"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_n")).as("n"))

  /** Skewed equi-join: salt the big (skewed) side deterministically
    * from a high-cardinality column, replicate the small side across
    * all salt buckets, join on (key, salt). Every hot key's rows spread
    * over `buckets` tasks instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      bigSaltSrc: Column, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(buckets, bigSaltSrc))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
