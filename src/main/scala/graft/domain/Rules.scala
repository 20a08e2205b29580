package graft.domain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Trialstreamer's rule-based domain operators, re-expressed as native
  * Spark Column builders (no UDFs — everything stays inside codegen).
  *
  * Every rule, phrase list, regex, and format table is behavioral data
  * lifted from the reference (cited per member); the implementations
  * are original Spark expressions.
  */
object Rules {

  // ===========================================================================
  // is_rct rule classifier — reference: ictrp.py:66-186 (phrase lists
  // from "analysis of unique study_design fields conducted on
  // 2020-03-29"); duplicated at ictrp_csv.py:94-215.
  // ===========================================================================

  /** Definite-no phrases, checked FIRST (ictrp.py:66-115). Kept verbatim
    * — including duplicates and entries containing ':' or double spaces
    * that can never match cleaned text (the reference has the same dead
    * entries).
    */
  val nonRctPhrases: Seq[String] = Seq(
    "allocation : not applicable", "assignment: other", "before after control",
    "case control", "case control", "case control study", "case series",
    "case study", "cluster randomly sampling", "cohort study",
    "control: historical", "cross sectional", "cross sectional",
    "cross sectional study", "diagnostic accuracy study",
    "diagnostic test for accuracy", "duration: longitudinal",
    "epidemiological study", "historical control", "logitudinal",
    "longitudinal study  treatment ", "mixed methods", "n of 1 trial",
    "non comparative", "non randomised trial", "non randomized control",
    "non randomized controlled trial", "non rct", "not randomized",
    "observational", "observational study", "open label", "open label",
    "pre post", "purpose: natural history", "qualitative",
    "quasi experimental", "quasi randomized controlled", "randomised: no",
    "randomization sequence:not applicable", "randomization sequence:other",
    "randomization: n a", "randomly sampling", "retrospective", "sequential",
    "single arm", "single arm", "single group assignment", "survey",
    "uncontrolled")

  /** Likely-yes phrases, checked second (ictrp.py:117-154). */
  val rctPhrases: Seq[String] = Seq(
    "adaptive randomization", "allocation : rct", "assignment: crossover",
    "cluster controlled trial", "cluster randomization",
    "computer generated randomization", "cross over", "crossover trial",
    "double blind", "double masked", "experimental", "factorial",
    "interventional trial", "parallel", "permuted block randomization",
    "phase 1", "phase 2", "phase 3", "phase 4", "phase i", "phase ii",
    "phase iii", "phase iv", "pilot rct", "ramdomised controlled trial",
    "rct", "random allocation", "random number table", "randomised",
    "randomise", "randomised controlled trial",
    "randomization sequence:coin toss  lottery  toss of dice  shuffling cards",
    "randomize", "randomized", "randomized controlled trial",
    "single centre trial", "stratified block randomization",
    "stratified randomization")

  /** cleanup() — ictrp.py:156-159: non-alphanumerics to spaces, then
    * collapse runs of 2+ whitespace to one space.
    */
  def cleanText(c: Column): Column =
    regexp_replace(regexp_replace(c, "[^a-zA-Z\\d]", " "), "\\s\\s+", " ")

  /** is_rct(study_design) — ictrp.py:169-186: null → unknown; cleaned
    * lowercase text matched against non-RCT phrases first, then RCT
    * phrases; else unknown. One codegen'd pass per row ([[RctClass]] —
    * the HOF `exists` formulation re-ran the cleanup per phrase).
    */
  def isRct(studyDesign: Column): Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      RctClass(org.apache.spark.sql.graftshim.GraftShim.expression(studyDesign)))

  /** is_recruiting normalizer — ictrp.py:161-167 (exact-match map). */
  def isRecruiting(status: Column): Column =
    when(status === "Recruiting", "recruiting")
      .when(status === "Not Recruiting", "not recruiting")
      .otherwise("unknown")

  // ===========================================================================
  // Registry-ID extraction — reference: ictrp.py:31-52 (iteratively
  // developed Sept 2018; matched 428,822/428,822 ICTRP ids); duplicated
  // at ictrp_csv.py:34-55.
  // ===========================================================================

  /** The 22-registry alternation, ported verbatim with two deviations
    * documented from the reference source:
    *  - `JPRN\-JapicCTI\-{0-9}{6}` (a typo'd duplicate of the JapicCTI
    *    alternative two lines later) cannot compile under java.util.regex
    *    and never matches any text in Python either — dropped;
    *  - the `CTRI/..../[0-9{6}]` single-character class quirk IS
    *    preserved (it truncates CTRI ids after one digit, exactly as the
    *    reference does).
    */
  val registryIdPattern: String =
    "RBR\\-[0-9a-z]{6}|ACTRN[0-9]{14}|ChiCTR\\-[A-Za-z]{2,5}\\-[0-9]{8}|" +
      "ChiCTR[0-9]{10}|IRCT[0-9N]{14,18}|PACTR[0-9]{15,16}|ISRCTN[0-9]{8}|" +
      "NCT[0-9]{8}|CTRI/[0-9]{4}/[0-9]{2,3}/[0-9{6}]|DRKS[0-9]{8}|" +
      "EUCTR[0-9]{4}\\-[0-9]{6}\\-[0-9]{2}|JPRN\\-C[0-9]{9}|" +
      "JPRN\\-JMA\\-IIA[0-9]{5}|JPRN\\-UMIN[0-9]{9}|JPRN\\-JapicCTI\\-[0-9]{6}|" +
      "KCT[0-9]{7}|NTR[0-9]{2,4}|PER-[0-9]{3}-[0-9]{2}|RPCEC[0-9]{8}|" +
      "SLCTR/[0-9]{4}/[0-9]{3}|TCTR[0-9]{11}"

  /** All registry ids appearing in a text column (F6). */
  def registryIds(text: Column): Column =
    regexp_extract_all(text, lit(registryIdPattern), lit(0))

  // ===========================================================================
  // Per-registry date parsing — reference: ictrp_csv.py:73-92 (format
  // table), 218-222 (guess_registry), 258-261 (strptime + except→None).
  // ===========================================================================

  /** guess_registry — first run of capital letters, else "UNK". */
  def guessRegistry(regid: Column): Column = {
    val m = regexp_extract(regid, "[A-Z]+", 0)
    when(m === "" || m.isNull, "UNK").otherwise(m)
  }

  /** Registries parsed with day/month/year. Note the reference's format
    * table keys ANZCTR/REBEC/REPEC by registry NAME while guess_registry
    * yields the id PREFIX (ACTRN/RBR/PER) — those prefixes miss the
    * table, so their dates parse to null, exactly as in the reference
    * (KeyError → except → None, ictrp_csv.py:258-261).
    */
  val dmySlashRegistries: Seq[String] = Seq(
    "ANZCTR", "DRKS", "EUCTR", "ISRCTN", "JPRN", "NCT", "NTR", "PACTR",
    "REBEC", "RPCEC", "TCTR", "REPEC")
  /** NB: the 'ChiCTR' key is unreachable in the reference too —
    * guess_registry("ChiCTR...") yields "C" (the lowercase 'h' ends the
    * [A-Z]+ run), which misses the table, so ChiCTR dates are null.
    */
  val ymdDashRegistries: Seq[String] = Seq("ChiCTR", "CRIS", "IRCT", "SLCTR", "UNK")
  val dmyDashRegistries: Seq[String] = Seq("CTRI")

  /** date_registered parse keyed by guessed registry prefix; unknown
    * prefix or unparseable text → null (requires ANSI off so to_date
    * yields null on malformed input).
    */
  def dateRegistered(regid: Column, raw: Column): Column = {
    val reg = guessRegistry(regid)
    when(reg.isin(dmySlashRegistries: _*), to_date(raw, "dd/MM/yyyy"))
      .when(reg.isin(ymdDashRegistries: _*), to_date(raw, "yyyy-MM-dd"))
      .when(reg.isin(dmyDashRegistries: _*), to_date(raw, "dd-MM-yyyy"))
      .otherwise(lit(null).cast("date"))
  }

  // ===========================================================================
  // PubMed reader scalar functions — reference: readers/pmreader.py.
  // ===========================================================================

  /** parse_pages — pmreader.py:130-141. "123-9" → (123, 129): the end
    * page borrows the start page's prefix. Reproduces Python's negative
    * slice `parts[0][:l0-l1]` exactly: for l0 < l1 the prefix keeps the
    * first max(2*l0-l1, 0) chars.
    */
  def pageRange(pages: Column): Column = {
    val parts = split(pages, "-")
    val n = size(parts)
    val p0 = element_at(parts, 1)
    val p1 = element_at(parts, 2)
    val l0 = length(p0)
    val l1 = length(p1)
    val k = l0 - l1
    val prefLen = when(k >= 0, k).otherwise(greatest(l0 + k, lit(0)))
    val pageTo = concat(substring(p0, lit(1), prefLen), p1)
    when(n === 2, struct(p0.as("page_from"), pageTo.as("page_to")))
      .when(n === 1, struct(p0.as("page_from"), p0.as("page_to")))
      .otherwise(struct(lit(null).cast("string").as("page_from"),
        lit(null).cast("string").as("page_to")))
  }

  /** Title fallback chain — pmreader.py:73-84: ArticleTitle unless empty
    * or the '[Not Available].' sentinel, then VernacularTitle under the
    * same test, else ''.
    */
  def titleChain(title: Column, vernacular: Column): Column = {
    def ok(c: Column): Column = {
      val t = trim(coalesce(c, lit("")))
      (t =!= "") && (t =!= "[Not Available].")
    }
    when(ok(title), trim(title))
      .when(ok(vernacular), trim(vernacular))
      .otherwise(lit(""))
  }

  /** Year with MedlineDate regex fallback — pmreader.py:143-156. */
  def yearExtract(yearRaw: Column, medlineDate: Column): Column = {
    val y = trim(coalesce(yearRaw, lit("")))
    val fallback = regexp_extract(coalesce(medlineDate, lit("")),
      "\\b(19|20)\\d{2}\\b", 0)
    when(y =!= "", y).otherwise(nullif(fallback, lit(""))).cast("long")
  }

  // ===========================================================================
  // Citation formatter — reference: cnxapp.py:157-165.
  // ===========================================================================

  /** get_cite(authors, journal, year): "{LastName}[ et al.], {journal}.
    * {year}"; no authors → "{journal}. {year}". `authors` is an
    * array<struct<LastName:string,...>>.
    */
  def citation(authors: Column, journal: Column, year: Column): Column = {
    val first = element_at(authors, 1).getField("LastName")
    val suffix = when(size(authors) > 1, lit(" et al.")).otherwise(lit(""))
    when(size(authors) >= 1,
      concat(first, suffix, lit(", "), journal, lit(". "), year.cast("string")))
      .otherwise(concat(journal, lit(". "), year.cast("string")))
  }

  // ===========================================================================
  // DOI cleanup — reference: mendeley.py:21-39.
  // ===========================================================================

  /** doi_clean: strip `<a href=...>` wrappers, strip URL scheme+host,
    * then accept only strings starting '10.' or containing the DOI
    * regex `10.\d{4,9}/[-._;()/:A-Za-z0-9]+` (first match), else null.
    * (The reference parses the href with BeautifulSoup and the URL with
    * urlparse; for the well-formed inputs it receives, the regexes below
    * are behavior-identical.)
    */
  def doiClean(raw: Column): Column = {
    val afterHref = when(raw.startsWith("<a "),
      regexp_extract(raw, "href=\"([^\"]*)\"", 1)).otherwise(raw)
    val afterUrl = when(afterHref.startsWith("http"),
      regexp_replace(afterHref, "^https?://[^/]*/", "")).otherwise(afterHref)
    when(afterUrl.startsWith("10."), afterUrl)
      .otherwise(nullif(
        regexp_extract(afterUrl, "10.\\d{4,9}/[-._;()/:A-Za-z0-9]+", 0), lit("")))
  }

  // ===========================================================================
  // Structured-abstract flatten — reference: pmreader.py:86-104.
  // ===========================================================================

  /** abstract_plaintext: per section, labeled sections contribute
    * "header\n\n\ntext" (the reference appends header, "\n", text to a
    * flat list then '\n'.joins it — yielding the triple newline), then
    * sections join with "\n". `sections` is
    * array<struct<header:string,text:string>>.
    */
  def abstractFlatten(sections: Column): Column =
    array_join(
      transform(sections, s =>
        when(s.getField("header") =!= "_UNSTRUCTURED",
          concat(s.getField("header"), lit("\n\n\n"), s.getField("text")))
          .otherwise(s.getField("text"))),
      "\n")
}
