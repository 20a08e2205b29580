package graft.annotate

/** minimap — free-text → UMLS-style concept mapping (F5).
  *
  * Re-implementation of the reference's minimap.py:40-217: text
  * normalization pipeline (parenthetical removal, hyphen→space,
  * syntactic uninversion, possessive/NOS stripping) followed by a
  * GREEDY LONGEST-MATCH sliding window over lemmas against a
  * string→CUI dictionary, left-to-right non-overlap selection, and
  * per-document first-wins dedupe by CUI (get_unique_terms,
  * minimap.py:204-217).
  *
  * The reference's dictionaries (UMLS-derived pickles) and spaCy
  * lemmatizer are not reproducible offline; per SURVEY §7.5 we freeze
  * our own deterministic tokenizer ([a-z0-9]+ runs of the lowercased
  * text), lemma table, and concept dictionaries. The ALGORITHM—window
  * order, ambiguity (>15 CUIs) and short-string (<=2 chars) drops,
  * ignore/stopword gates, non-overlap selection, first-wins dedupe—is
  * ported faithfully.
  */
object Minimap {

  final case class Concept(cui: String, mesh_ui: String, mesh_term: String, source_text: String)

  // --- frozen deterministic dictionaries (stand-ins for the UMLS pickles) ---

  val lemmaDict: Map[String, String] = Map(
    "trials" -> "trial", "studies" -> "study", "infections" -> "infection",
    "women" -> "woman", "adults" -> "adult", "children" -> "child",
    "inhibitors" -> "inhibitor", "cancers" -> "cancer", "attacks" -> "attack",
    "infarctions" -> "infarction", "anticoagulants" -> "anticoagulant",
    "randomised" -> "randomized")

  /** lemma-phrase → CUIs. Entries that would be dropped by the
    * reference's precision filters (len<=2, >15 CUIs) are excluded up
    * front, mirroring minimap.py:42-57.
    */
  val strToCui: Map[String, Seq[String]] = Map(
    "type 2 diabetes" -> Seq("C0011860"),
    "diabetes" -> Seq("C0011849"),
    "diabetes mellitus" -> Seq("C0011849"),
    "myocardial infarction" -> Seq("C0027051"),
    "heart attack" -> Seq("C0027051"),
    "aspirin" -> Seq("C0004057"),
    "hypertension" -> Seq("C0020538"),
    "randomized controlled trial" -> Seq("C0034656"),
    "breast cancer" -> Seq("C0006142"),
    "cancer" -> Seq("C0006826"),
    "covid 19" -> Seq("TS-COV19"),
    "pregnant woman" -> Seq("C0033011"),
    "heparin" -> Seq("C0019134"),
    "low molecular weight heparin" -> Seq("C0023652"),
    "child" -> Seq("C0008059"),
    // deliberately ambiguous term mapping to two CUIs (multi-emit path)
    "cold" -> Seq("C0009443", "C0024117"),
    // in-dictionary but suppressed by the ignore list (precision gate)
    "trial" -> Seq("C0008976"))

  val cuiToMesh: Map[String, (String, String)] = Map(
    "C0011860" -> ("D003924", "Diabetes Mellitus, Type 2"),
    "C0011849" -> ("D003920", "Diabetes Mellitus"),
    "C0027051" -> ("D009203", "Myocardial Infarction"),
    "C0004057" -> ("D001241", "Aspirin"),
    "C0020538" -> ("D006973", "Hypertension"),
    "C0034656" -> ("D016449", "Randomized Controlled Trial"),
    "C0006142" -> ("D001943", "Breast Neoplasms"),
    "C0006826" -> ("D009369", "Neoplasms"),
    "TS-COV19" -> ("D000086382", "COVID-19"),
    "C0033011" -> ("D011247", "Pregnant Women"),
    "C0019134" -> ("D006493", "Heparin"),
    "C0023652" -> ("D006495", "Heparin, Low-Molecular-Weight"),
    "C0008059" -> ("D002648", "Child"),
    "C0009443" -> ("D003139", "Common Cold"),
    "C0024117" -> ("D029424", "Pulmonary Disease, Chronic Obstructive"),
    "C0008976" -> ("D016430", "Clinical Trial"))

  /** Generic terms suppressed for precision (ignorelist.txt analog). */
  val ignores: Set[String] = Set("study", "trial", "patient")

  val stopwords: Set[String] = Set(
    "a", "an", "the", "of", "in", "and", "or", "with", "without", "for",
    "to", "was", "were", "on", "at", "by", "from", "as", "is", "are")

  /** Prepositions/conjunctions blocking syntactic uninversion. */
  val prepConj: Seq[String] = Seq(
    "and", "or", "of", "in", "on", "with", "without", "for", "to", "at",
    "by", "from", "as", "but", "nor")

  private val prepConjRe = ("\\b(" + prepConj.mkString("|") + ")\\b").r
  private val leftParenRe = "^\\[(X|V|D|M|EDTA|SO|Q)\\]".r
  private val parenRe = "[\\(\\[]\\w+[\\)\\]]".r
  private val posRe = "(?<=\\w)('s?)\\b".r
  private val nosRe = "\\bNOS\\b".r
  private val spaceRe = "\\s+".r

  /** syn_uninv — minimap.py:82-96: "Diabetes, Type 2" → "Type 2
    * Diabetes"; no-op when ', ' is absent/terminal or the tail contains
    * a preposition/conjunction.
    */
  def synUninv(text: String): String = {
    val ip = text.indexOf(", ")
    if (ip == -1) text
    else if (ip + 2 == text.length) text
    else if (prepConjRe.findFirstIn(text.substring(ip + 2)).isDefined) text
    else text.substring(ip + 2) + " " + text.substring(0, ip)
  }

  /** Normalization pipeline — minimap.py:113-146. umlsMode adds
    * uninversion + NOS stripping (dictionary-side); free-text mapping
    * uses umlsMode=false, exactly as minimap() does (minimap.py:107).
    */
  def pipeline(text0: String, umlsMode: Boolean = false,
      abbrevs: Map[String, String] = Map.empty): String = {
    var text = text0
    for ((abbrev, expansion) <- abbrevs)
      text = ("\\b" + java.util.regex.Pattern.quote(abbrev) + "\\b").r
        .replaceAllIn(text, java.util.regex.Matcher.quoteReplacement(expansion))
    text = leftParenRe.replaceAllIn(text, "")
    text = parenRe.replaceAllIn(text, "")
    text = text.replace('-', ' ')
    if (umlsMode) text = synUninv(text)
    text = posRe.replaceAllIn(text, "")
    if (umlsMode) text = nosRe.replaceAllIn(text, " ")
    spaceRe.replaceAllIn(text, " ").trim
  }

  /** Frozen tokenizer: maximal [a-z0-9]+ runs of the lowercased text. */
  def tokenize(text: String): Array[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toArray

  def lemma(token: String): String = lemmaDict.getOrElse(token, token)

  /** Greedy longest-match matcher — minimap.py:152-201: windows from
    * longest to shortest, all dictionary hits collected, sorted by
    * (start, -end), then left-to-right non-overlap selection.
    */
  def matcher(text: String): Seq[Concept] = {
    val tokens = tokenize(text)
    val lemmas = tokens.map(lemma)
    val maxLen = tokens.length
    val matches = scala.collection.mutable.ArrayBuffer[(Int, Int, Concept)]()
    var window = maxLen
    while (window >= 1) {
      var i = 0
      while (i <= maxLen - window) {
        val windowText = tokens.slice(i, i + window).mkString(" ")
        val windowLemma = lemmas.slice(i, i + window).mkString(" ")
        if (windowLemma.nonEmpty && strToCui.contains(windowLemma) &&
          !ignores.contains(windowLemma) && !stopwords.contains(windowText)) {
          for (cui <- strToCui(windowLemma)) {
            val (ui, term) = cuiToMesh(cui)
            matches += ((i, i + window, Concept(cui, ui, term, windowText)))
          }
        }
        i += 1
      }
      window -= 1
    }
    val sorted = matches.sortBy { case (s, e, _) => (s, -e) }
    val out = scala.collection.mutable.ArrayBuffer[Concept]()
    var rightBorder = 0
    for ((s, e, c) <- sorted) {
      if (s >= rightBorder) { out += c; rightBorder = e }
    }
    out.toSeq
  }

  /** minimap(text) — pipeline(umls_mode=false) then matcher. */
  def minimap(text: String, abbrevs: Map[String, String] = Map.empty): Seq[Concept] =
    matcher(pipeline(text, umlsMode = false, abbrevs = abbrevs))

  /** get_unique_terms — minimap.py:204-217: concat matches over
    * snippets, first-wins dedupe by cui, source positions dropped.
    */
  def uniqueTerms(snippets: Seq[String],
      abbrevs: Map[String, String] = Map.empty): Seq[(String, String, String)] = {
    val seen = scala.collection.mutable.Set[String]()
    val out = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    for (s <- snippets; c <- minimap(s, abbrevs)) {
      if (!seen.contains(c.cui)) {
        seen += c.cui
        out += ((c.cui, c.mesh_ui, c.mesh_term))
      }
    }
    out.toSeq
  }
}
