package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch smoke-test main (not part of the library surface). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.select(min(col("ts")), max(col("ts"))).show(false)
    ev.select(col("ts"), year(col("ts")), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).show(3, false)
    // portable hash check: conv(substr(md5, 1, 8), 16, 10)
    spark.range(1).select(
      md5(lit("abc")).as("m"),
      conv(substring(md5(lit("abc")), 1, 8), 16, 10).cast("long").as("h32"),
      split(lit("a b c"), " ").as("toks"),
      ascii(lit("")).as("asc_empty")
    ).show(false)
    spark.stop()
  }
}
