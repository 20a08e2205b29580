package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Subset of [[graft.Verify]] for fast iteration: dump only the named
  * queries (plus their oracle entries) so scripts/compare.py checks
  * just those. Usage: runMain graft.tools.VerifySome <sfDir> <outDir>
  * q1 q2 ...
  *
  * Mirrors Verify's contract: same session config (SPARK_GRAFT_CPUS
  * honored), same shared JSON escaper (Verify.jsonEscape — the two
  * tools cannot emit divergent oracle_sql.json), per-query failure
  * isolation, and a clear error for an unknown query name.
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(graft.queries.Registry.byName.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — known names are " +
        s"${graft.queries.Registry.all.map(_.name).sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // Scale-adaptive scan splits: the corpora are single parquet FILES
      // (64 KB..175 MB), so the default split floor (openCost 4 MB) runs
      // whole-table scans as ONE task at these sizes. minPartitionNum=32
      // makes Spark size splits to totalBytes/32 per scan (floored at
      // 64 KB) — ~32 tasks for ANY table size, the local-mode stand-in
      // for a many-file layout, without the fixed-small-split task-count
      // blowup on larger tables. Row-group sizing in make_sf1.py makes
      // the small sf1 tables actually splittable. Measured (TimeQ A/B):
      // committed-scale walls are unchanged within noise, sf1 scan tails
      // drop 3-4x (q72 3.8->1.0 s, q164 3.9->1.1 s, q23 3.5->1.0 s).
      // On a real many-file cluster the defaults are correct.
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try graft.queries.Registry.byName(name).fn(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify-some] $name failed: ${e.getMessage}")
      }
    }
    val json = names
      .flatMap(n => graft.queries.Registry.byName(n).oracle.map(n -> _))
      .map { case (k, v) =>
        s"${graft.Verify.jsonEscape(k)}: ${graft.Verify.jsonEscape(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
