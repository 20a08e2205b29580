package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory lives in graft.queries.Registry; this object
  * is the stable façade the driver calls.
  */
object SparkEntry {
  /** Flagship query (real-data-model picosearch: struct containment +
    * subtree expansion + arm union, SURVEY §3.1) on
    * /root/testdata/sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Registry.byName("q40_picosearch_struct").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = graft.queries.Registry.oracleSql
}
