package graft
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
    val spark = tools.GraftSession.local(logLevel = "WARN", appName = "graft-verify")
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
