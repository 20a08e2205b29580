package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.domain.Rules

/** Column-level unit tests for the domain rules (through Spark). */
class RulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def isRct(s: String): String =
    Seq(Option(s)).toDF("sd").select(Rules.isRct(col("sd"))).head.getString(0)

  test("is_rct: RCT phrases") {
    assert(isRct("Randomized Controlled Trial") === "RCT")
    assert(isRct("phase iii study") === "RCT")
    assert(isRct("Cross-over design") === "RCT")       // cleanup folds hyphen
    assert(isRct("double-masked") === "RCT")
  }

  test("is_rct: non-RCT checked before RCT (precedence)") {
    assert(isRct("non-randomized controlled trial") === "non-RCT")
    assert(isRct("quasi-randomized controlled") === "non-RCT")
  }

  test("is_rct: non-RCT phrases incl. cleanup of punctuation") {
    assert(isRct("Case-Control Study") === "non-RCT")
    assert(isRct("N-of-1 trial") === "non-RCT")
    assert(isRct("OBSERVATIONAL") === "non-RCT")
  }

  test("is_rct: unknown for null and unmatched") {
    assert(isRct(null) === "unknown")
    assert(isRct("some novel design") === "unknown")
  }

  test("registry regex matches one id per registry family") {
    val ids = Seq(
      "NCT01234567", "ISRCTN12345678", "ACTRN12605000123456", "RBR-7qvb9c",
      "ChiCTR-IOR-12345678", "ChiCTR1800012345", "IRCT20150303021315N2",
      "PACTR201601001234567", "EUCTR2015-001234-12", "DRKS00012345",
      "JPRN-C000012345", "JPRN-JMA-IIA00123", "JPRN-UMIN000012345",
      "JPRN-JapicCTI-123456", "KCT0001234", "NTR1234", "PER-012-34",
      "RPCEC00001234", "SLCTR/2015/012", "TCTR20150101001")
    val re = Rules.registryIdPattern.r
    for (id <- ids)
      assert(re.findFirstIn(s"registered as $id today") === Some(id), s"for $id")
  }

  test("registry regex: CTRI truncation quirk preserved; no false hits") {
    val re = Rules.registryIdPattern.r
    assert(re.findFirstIn("CTRI/2015/01/005634") === Some("CTRI/2015/01/0"))
    assert(re.findFirstIn("no ids here, NCT123 too short") === None)
  }

  test("page ranges incl. python negative-slice semantics") {
    val rows = Seq("123-9", "100-10", "123", "", "1-2-3", "9-123", "10-9")
      .toDF("pages")
      .select(Rules.pageRange(col("pages")).as("pr"))
      .select("pr.page_from", "pr.page_to")
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))))
    assert(rows(0) === (Some("123"), Some("129")))
    assert(rows(1) === (Some("100"), Some("110")))
    assert(rows(2) === (Some("123"), Some("123")))
    assert(rows(3) === (Some(""), Some("")))
    assert(rows(4) === (None, None))
    assert(rows(5) === (Some("9"), Some("123")))   // "9"[:1-3] -> ""
    assert(rows(6) === (Some("10"), Some("19")))
  }

  test("title chain with [Not Available]. sentinel") {
    val out = Seq(
      ("Real.", "V"), ("", "Vern."), ("[Not Available].", "Vern2."),
      ("[Not Available].", ""), (null, null))
      .toDF("t", "v")
      .select(Rules.titleChain(col("t"), col("v")))
      .collect().map(_.getString(0))
    assert(out === Array("Real.", "Vern.", "Vern2.", "", ""))
  }

  test("year extraction with MedlineDate regex fallback") {
    val out = Seq(("2001", ""), ("", "1998 Dec-1999 Jan"), ("", "Winter 2020"),
      ("", "none"), (null, null))
      .toDF("y", "md")
      .select(Rules.yearExtract(col("y"), col("md")))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    assert(out === Array(2001L, 1998L, 2020L, -1L, -1L))
  }

  test("per-registry date parsing incl. name/prefix mismatch nulls") {
    val out = Seq(
      ("NCT01234567", "05/06/2019"), ("ChiCTR1800012345", "2019-06-05"),
      ("CTRI/2015/01/0", "05-06-2019"), ("ACTRN12605000123456", "31/12/2001"),
      ("NCT99999999", "31/31/2019"), ("nct123", "2020-12-31"))
      .toDF("regid", "raw")
      .select(Rules.dateRegistered(col("regid"), col("raw")).cast("string"))
      .collect().map(r => Option(r.getString(0)))
    // ChiCTR: guess_registry("ChiCTR...") = "C" (the lowercase 'h'
    // breaks the [A-Z]+ run) -> not in the format table -> null, the
    // same quirk as the reference (its map key 'ChiCTR' is unreachable)
    assert(out === Array(Some("2019-06-05"), None,
      Some("2019-06-05"), None, None, Some("2020-12-31")))
  }

  test("citation formatter branches on author count") {
    import graft.queries.Domain.Author
    val out = Seq(
      (1L, Seq(Author("Smith"), Author("Jones")), "Lancet", 2019),
      (2L, Seq(Author("Garcia")), "BMJ", 2020),
      (3L, Seq.empty[Author], "Nature", 2021))
      .toDF("fid", "authors", "journal", "year")
      .orderBy("fid")
      .select(Rules.citation(col("authors"), col("journal"), col("year")))
      .collect().map(_.getString(0))
    assert(out === Array("Smith et al., Lancet. 2019", "Garcia, BMJ. 2020", "Nature. 2021"))
  }

  test("doi cleanup: href, url path, regex fallback, reject") {
    val out = Seq("<a href=\"https://doi.org/10.1000/xyz\">x</a>",
      "https://doi.org/10.1234/abc", "doi:10.5555/99x", "10.1000/direct", "junk")
      .toDF("raw")
      .select(Rules.doiClean(col("raw")))
      .collect().map(r => Option(r.getString(0)))
    assert(out === Array(Some("10.1000/xyz"), Some("10.1234/abc"),
      Some("10.5555/99x"), Some("10.1000/direct"), None))
  }

  test("abstract flatten reproduces the reference's join quirk") {
    import graft.queries.Domain.Section
    val out = Seq(
      (1L, Seq(Section("BACKGROUND", "Intro."), Section("_UNSTRUCTURED", "Tail."))),
      (2L, Seq.empty[Section]))
      .toDF("fid", "sections").orderBy("fid")
      .select(Rules.abstractFlatten(col("sections")))
      .collect().map(_.getString(0))
    assert(out === Array("BACKGROUND\n\n\nIntro.\nTail.", ""))
  }
}
