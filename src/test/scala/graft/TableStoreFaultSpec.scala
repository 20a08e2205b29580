package graft

import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.stream.TableStore

/** Fault-injection pins for the versioned-snapshot invariants
  * [[TableStore]]'s scaladoc claims (SURVEY §11.1): readers never see a
  * torn version, crashed writes self-heal, a crash between the snapshot
  * write and the update_log append is repaired by an idempotent
  * re-apply, and a second live writer with a stale applied-files cache
  * cannot double-apply a file. (TRUE concurrent-writer interleavings
  * — A reads version n, B commits, A commits — are pinned separately
  * by TableStoreRaceSpec against the optimistic version-claim
  * protocol.)
  */
class TableStoreFaultSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("ts-fault-").toString

  private def ups(rows: (String, String, Long)*): DataFrame =
    rows.toDF("k", "v", "seq")
  private def dels(keys: String*): DataFrame = keys.toDF("k")

  private def state(store: TableStore): Map[String, String] =
    store.snapshot("t")
      .map(_.collect().map(r => r.getString(0) -> r.getString(1)).toMap)
      .getOrElse(Map.empty)

  private def listFiles(dir: String): Set[Path] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Set.empty
    else {
      val s = Files.list(p)
      try {
        val it = s.iterator()
        val buf = Set.newBuilder[Path]
        while (it.hasNext) buf += it.next()
        buf.result()
      } finally s.close()
    }
  }

  test("a v-dir without _SUCCESS is invisible and self-heals") {
    val root = freshRoot()
    val a = new TableStore(spark, root, "k")
    assert(a.merge("t", ups(("a", "1", 1), ("b", "1", 2)), dels(), "f0"))

    // inject: a crashed v2 write — part file present, no _SUCCESS
    val torn = Paths.get(s"$root/t/v2")
    Files.createDirectories(torn)
    Files.writeString(torn.resolve("part-00000.parquet"), "garbage")

    // reader resolves v1, never the torn v2 (and doesn't crash on it)
    assert(state(a) === Map("a" -> "1", "b" -> "1"))

    // the next merge claims version 2 again and Overwrite replaces the
    // partial dir — crashed attempts self-heal with no operator action
    assert(a.merge("t", ups(("c", "1", 1)), dels(), "f1"))
    assert(state(a) === Map("a" -> "1", "b" -> "1", "c" -> "1"))
    assert(Files.exists(torn.resolve("_SUCCESS")))
  }

  test("crash between snapshot write and log append: re-apply is idempotent") {
    val root = freshRoot()
    val a = new TableStore(spark, root, "k")
    assert(a.merge("t", ups(("a", "1", 1), ("b", "1", 2)), dels(), "f0"))

    // apply f1 fully, then delete its log records — the exact state a
    // crash leaves between the v2 write and the update_log append
    val logBefore = listFiles(s"$root/_update_log")
    assert(a.merge("t", ups(("a", "2", 1)), dels("b"), "f1"))
    val applied = state(a)
    assert(applied === Map("a" -> "2"))
    (listFiles(s"$root/_update_log") -- logBefore)
      .foreach(p => Files.deleteIfExists(p))

    // recovery: a fresh instance (post-crash process) re-drains the
    // source; f1 is not logged, so it re-applies — on top of a snapshot
    // that already includes it. MERGE is idempotent by key (tombstone
    // anti-join + upsert-key anti-join + last-wins), so the re-applied
    // version is value-identical and the log regains f1.
    val b = new TableStore(spark, root, "k")
    assert(b.merge("t", ups(("a", "2", 1)), dels("b"), "f1"))
    assert(state(b) === applied)
    assert(b.appliedFiles("t") === Set("f0", "f1"))
    // f0 stays gated as before
    assert(!b.merge("t", ups(("a", "1", 1), ("b", "1", 2)), dels(), "f0"))
  }

  test("stale-cache second writer cannot double-apply a file") {
    val root = freshRoot()
    val a = new TableStore(spark, root, "k")
    val b = new TableStore(spark, root, "k")
    assert(a.merge("t", ups(("a", "1", 1)), dels(), "f0"))
    // b loads (and caches) the applied set as of f0
    assert(b.appliedFiles("t") === Set("f0"))
    // a races ahead with f1…
    assert(a.merge("t", ups(("a", "2", 1)), dels(), "f1"))
    val versionsAfter = state(a)
    // …and b, whose cache predates f1, attempts the same file: the
    // cache-miss path re-reads the log and refuses the double apply
    assert(!b.merge("t", ups(("a", "2", 1)), dels(), "f1"))
    assert(state(b) === versionsAfter)
    assert(b.snapshot("t").isDefined)
    // no third version appeared: v1 (f0) + v2 (f1) only
    assert(!Files.exists(Paths.get(s"$root/t/v3")))
  }
}
