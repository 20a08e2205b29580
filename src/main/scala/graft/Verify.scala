package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL would otherwise make
    * the driver's json.load fail and silently zero the round's
    * correctness. Shared with [[graft.tools.VerifySome]] so the two
    * tools cannot emit divergent oracle_sql.json.
    */
  private[graft] def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
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
    // A query that throws writes no parquet, so the driver records no
    // CORRECTNESS row for it — absent rows read as "not sampled", which
    // is how a 38-query hole once shipped silently. Record every failure
    // in a dedicated artifact so holes are loud.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val failJson = failures
      .map { case (k, v) => s"${jsonEscape(k)}: ${jsonEscape(v.take(500))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_failures.json"), failJson)
    if (failures.nonEmpty) {
      System.err.println(
        s"[verify] ${failures.size}/${SparkEntry.queries.size} queries FAILED: " +
          failures.keys.mkString(", "))
      println(s"[verify] FAILURES=${failures.size} (see verify_failures.json)")
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Verify.jsonEscape(k)}: ${Verify.jsonEscape(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Registry manifest: one entry per query (family, oracle md5, bench
    // membership) so coverage audits — the driver's and future rounds'
    // — are mechanical instead of grep-archaeology.
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val manifest = queries.Registry.all.map { q =>
      val fam = queries.Registry.familyOf(q.name)
      val omd5 = q.oracle.map(o => jsonEscape(md5(o))).getOrElse("null")
      s"${jsonEscape(q.name)}: {\"family\": ${jsonEscape(fam)}, " +
        s"\"oracle_md5\": $omd5, \"bench\": ${q.bench}}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifest)
    spark.stop()
  }
}
