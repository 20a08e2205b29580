package graft.annotate

import scala.collection.mutable

/** Schwartz–Hearst abbreviation–definition mining (F4).
  *
  * Faithful Scala re-implementation of the algorithm in the reference's
  * schwartz_hearst.py:49-297 (itself "A Simple Algorithm for Identifying
  * Abbreviation Definitions in Biomedical Text", Schwartz & Hearst,
  * Biocomputing 2003). Semantics ported line-by-line — including the
  * quirks that shape real output:
  *  - ')' , ';' and ':' all close a parenthetical (schwartz_hearst.py:83);
  *  - a sentence with unbalanced parens, or ')' before '(', is skipped
  *    wholesale (py:56-60);
  *  - an empty token in the definition prefix (e.g. from "--") aborts
  *    the candidate (the reference's `t[0]` IndexError, py:156);
  *  - definitions failing the min(|A|+5, |A|*2) token bound or with
  *    unbalanced parens are dropped (py:253-260);
  *  - later occurrences of the same abbreviation overwrite earlier ones
  *    (dict assignment, py:291).
  */
object SchwartzHearst {

  /** abbrev -> definition pairs for a whole document (lines split on \n). */
  def extractPairs(docText: String): Map[String, String] = {
    val out = mutable.LinkedHashMap[String, String]()
    if (docText == null) return out.toMap
    for (line <- docText.split("\n", -1).map(_.trim)) {
      try {
        for ((cand, candStart) <- bestCandidates(line)) {
          try {
            val definition = getDefinition(cand, candStart, line)
            val selected = selectDefinition(definition, cand)
            out(cand) = selected
          } catch { case _: SkipCandidate => () }
        }
      } catch { case _: SkipCandidate => () }
    }
    out.toMap
  }

  private final class SkipCandidate extends RuntimeException
  private def skip(): Nothing = throw new SkipCandidate

  /** Candidate abbreviations inside parentheticals (py:49-104).
    * Returns (candidate, startIndexInSentence).
    */
  private def bestCandidates(sentence: String): Seq[(String, Int)] = {
    val acc = mutable.ArrayBuffer[(String, Int)]()
    if (sentence.contains('(')) {
      if (sentence.count(_ == '(') != sentence.count(_ == ')')) skip()
      if (sentence.indexOf('(') > sentence.indexOf(')') && sentence.contains(')')) skip()

      var closeindex = -1
      var done = false
      while (!done) {
        val openindex = sentence.indexOf('(', closeindex + 1)
        if (openindex == -1) done = true
        else {
          closeindex = openindex + 1
          var open = 1
          var skipThis = false
          while (open > 0 && !skipThis) {
            if (closeindex >= sentence.length) skipThis = true
            else {
              val c = sentence.charAt(closeindex)
              if (c == '(') open += 1
              else if (c == ')' || c == ';' || c == ':') open -= 1
              closeindex += 1
            }
          }
          if (skipThis) closeindex = openindex + 1
          else {
            var start = openindex + 1
            var stop = closeindex - 1
            val raw = sentence.substring(start, stop)
            start = start + (raw.length - raw.replaceAll("^\\s+", "").length)
            stop = stop - (raw.length - raw.replaceAll("\\s+$", "").length)
            // a whitespace-only/empty parenthetical trims to '' — the
            // reference's conditions('') raises IndexError on
            // candidate[0], aborting the WHOLE sentence (py:134,287)
            val candidate = if (start > stop) "" else sentence.substring(start, stop)
            if (candidate.isEmpty) skip()
            if (conditions(candidate)) acc += ((candidate, start))
          }
        }
      }
    }
    acc.toSeq
  }

  /** Candidate viability (py:107-135): 2..10 chars, <=2 tokens, contains
    * a letter, starts alphanumeric.
    */
  private def conditions(candidate: String): Boolean = {
    if (candidate.length < 2 || candidate.length > 10) return false
    if (candidate.split("\\s+").count(_.nonEmpty) > 2) return false
    if (!candidate.exists(_.isLetter)) return false
    if (candidate.isEmpty || !Character.isLetterOrDigit(candidate.charAt(0))) return false
    true
  }

  /** Definition candidate: shortest token suffix before the paren with
    * enough key-initial tokens (py:139-197). Returns the definition
    * string (whitespace-trimmed, as the reference slices it).
    */
  private def getDefinition(candidate: String, candStart: Int, sentence: String): String = {
    if (candStart < 2) skip()
    val tokens = sentence.substring(0, candStart - 2).toLowerCase.split("[\\s\\-]", -1)
    val key = candidate.charAt(0).toLower
    // the reference's eager `[t[0] for t in tokens]` raises on ANY empty token
    if (tokens.exists(_.isEmpty)) skip()
    val firstchars = tokens.map(_.charAt(0))

    val definitionFreq = firstchars.count(_ == key)
    val candidateFreq = candidate.toLowerCase.count(_ == key)

    if (candidateFreq <= definitionFreq) {
      var count = 0
      var start = 0
      var startindex = firstchars.length - 1
      while (count < candidateFreq) {
        if (math.abs(start) > firstchars.length) skip()
        start -= 1
        // Python list.index(key, s) clamps negative s to len+s (>=0)
        val from0 = firstchars.length + start
        val from = if (from0 < 0) math.max(firstchars.length + from0, 0) else from0
        val idx = firstchars.indexOf(key, from)
        if (idx >= 0) startindex = idx
        count = firstchars.drop(startindex).count(_ == key)
      }
      val defStart0 = tokens.take(startindex).mkString(" ").length
      val defStop0 = candStart - 1
      val raw = sentence.substring(defStart0, math.max(defStart0, defStop0))
      val defStart = defStart0 + (raw.length - raw.replaceAll("^\\s+", "").length)
      val defStop = defStop0 - (raw.length - raw.replaceAll("\\s+$", "").length)
      if (defStart > defStop) skip()
      sentence.substring(defStart, defStop)
    } else skip()
  }

  /** Backward char alignment of abbreviation into definition
    * (py:200-260), then the min(|A|+5, |A|*2) token bound and the
    * balanced-paren check.
    */
  private def selectDefinition(definition: String, abbrev: String): String = {
    if (definition.length < abbrev.length) skip()
    if (definition.split("\\s+").filter(_.nonEmpty).contains(abbrev)) skip()

    var sindex = -1
    var lindex = -1
    var break = false
    while (!break) {
      if (definition.length + lindex < 0) skip()
      if (abbrev.length + sindex < 0) skip()
      val longchar = definition.charAt(definition.length + lindex).toLower
      val shortchar = abbrev.charAt(abbrev.length + sindex).toLower
      if (!Character.isLetterOrDigit(shortchar)) sindex -= 1
      if (sindex == -abbrev.length) {
        if (shortchar == longchar) {
          if (lindex == -definition.length ||
            !Character.isLetterOrDigit(definition.charAt(definition.length + lindex - 1))) {
            break = true
          } else lindex -= 1
        } else {
          lindex -= 1
          if (lindex == -(definition.length + 1)) skip()
        }
      } else {
        if (shortchar == longchar) { sindex -= 1; lindex -= 1 }
        else lindex -= 1
      }
    }

    val selected = definition.substring(definition.length + lindex)
    val tokens = selected.split("\\s+").count(_.nonEmpty)
    val length = abbrev.length
    if (tokens > math.min(length + 5, length * 2)) skip()
    if (selected.count(_ == '(') != selected.count(_ == ')')) skip()
    selected
  }
}
