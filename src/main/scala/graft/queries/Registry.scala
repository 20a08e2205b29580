package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability.
  *
  * @param name   stable key — used by the driver for CORRECTNESS/BENCH
  * @param fn     (session, sfDir) => result DataFrame. Column names must
  *               match the oracle exactly (driver compares by-name).
  * @param oracle equivalent DuckDB SQL over the same parquet tables;
  *               None for ops not expressible in SQL (weaker rows-only
  *               check by the driver).
  * @param bench  include in the headline benchmark set
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** Scratch-directory hygiene for queries that write their own tables:
  * per-run temp dirs must not accumulate (some hold full fact-table
  * copies) and fixed dirs race across concurrent JVMs.
  */
object Scratch {

  def rmTree(root: String): Unit = {
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      val stream = java.nio.file.Files.walk(p)
      try {
        val it = stream
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator()
        while (it.hasNext) java.nio.file.Files.deleteIfExists(it.next())
      } finally stream.close()
    }
  }

  /** Land a frame as ONE file in `landingDir` under a sortable name
    * with an explicit modTime — the file-stream fixture pattern every
    * streaming entry shares (q76/q135/q136/q137/q138/q140): the
    * source's oldest-first discovery plus `maxFilesPerTrigger=1`
    * turns each landed file into its own ordered micro-batch, so both
    * the name sort and the modTime agree on replay order.
    */
  def landFile(df: DataFrame, landingDir: String, fileName: String,
      modTime: Long = 0L, format: String = "parquet"): Unit = {
    val stage = java.nio.file.Files.createTempDirectory("graft-land-").toString
    df.coalesce(1).write.mode("overwrite").format(format).save(stage)
    val suffix = s".$format"
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(suffix))
      .getOrElse(sys.error(s"no $format part file in $stage"))
    val dir = new java.io.File(landingDir)
    dir.mkdirs()
    val dst = new java.io.File(dir, fileName)
    java.nio.file.Files.move(part.toPath, dst.toPath)
    // setLastModified reports failure by RETURN VALUE; order-sensitive
    // fixtures (q135/q137/q140) replay wrongly if the mtime silently
    // keeps wall clock, so fail loudly instead
    if (modTime > 0L)
      require(dst.setLastModified(modTime), s"could not set mtime on $dst")
    rmTree(stage)
  }

  /** Collect a SMALL result, delete the scratch dirs backing its plan,
    * and return the rows as an in-memory frame — the returned plan
    * must not reference deleted files, so materialization comes first.
    */
  def sealAndClean(df: DataFrame, roots: String*): DataFrame = {
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    df.collect().foreach(rows.add)
    roots.foreach(rmTree)
    df.sparkSession.createDataFrame(rows, df.schema)
  }
}

object Registry {
  lazy val all: Seq[Q] =
    Relational.queries ++ Pipeline.queries ++ Domain.queries ++
      Flagship.queries ++ Annotate.queries ++ Cdc.queries ++
      Readers.queries ++ Extensions.queries ++ Ictrp.queries ++
      Coverage.queries ++ Sources.queries ++ Api.queries ++ EndToEnd.queries ++
      Sinks.queries ++ Training.queries ++ Analytics.queries ++
      Curation.queries ++ Linkage.queries ++ ScaleOps.queries ++
      Corpus.queries ++ Vectors.queries ++ Temporal.queries ++ Govern.queries ++
      Evaluate.queries

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  lazy val benchSet: Seq[Q] = all.filter(_.bench)
}
