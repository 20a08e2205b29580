package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-engine dtype guard over every registered oracle (SURVEY §16.1
  * exactness rules, moved from memory into the build): DuckDB sums
  * integer columns into HUGEINT, which the driver's pandas fetch turns
  * into float64 — while the Spark side emits int64 — so any integer
  * `sum(...)` that reaches the oracle's FINAL select without a
  * `CAST(... AS BIGINT)` hash-mismatches even when every value agrees.
  * That class was round 7's only red row (q159: `sum(CASE...) AS part`
  * laundered through a CTE alias into the final projection).
  *
  * The scan is a small taint tracker over the oracle SQL text:
  *  - a select item containing `sum(` with no `CAST` and no top-level
  *    boolean comparison is HUGEINT-tainted (sum over doubles is
  *    float64 in both engines, but those sites all carry CASTs or
  *    feed further arithmetic; the conservative rule costs nothing);
  *  - taint propagates through bare-identifier re-projections
  *    (`SELECT part FROM pa` keeps `part` tainted);
  *  - a tainted item or alias in the FINAL top-level select fails.
  *
  * Verified discriminating: flags exactly q159's pre-fix oracle and
  * nothing else across the 246-query registry.
  */
class OracleDtypeSpec extends AnyFunSuite {

  private val Ident = "[A-Za-z_][A-Za-z0-9_]*"

  /** Split a select clause on top-level commas. */
  private def splitItems(clause: String): Seq[String] = {
    val items = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    clause.foreach { c =>
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      if (c == ',' && depth == 0) { items += cur.toString; cur.clear() }
      else cur += c
    }
    items += cur.toString
    items.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Every `SELECT ... FROM` clause in the SQL (any nesting depth),
    * with a flag marking the final top-level SELECT.
    */
  private def selectClauses(sql: String): Seq[(String, Boolean)] = {
    val up = sql.toUpperCase
    def isSelectAt(i: Int): Boolean =
      up.startsWith("SELECT", i) && (i == 0 || !sql(i - 1).isLetterOrDigit)
    val starts = (0 until sql.length).filter(isSelectAt)
    var depth = 0
    var finalStart = -1
    sql.indices.foreach { i =>
      sql(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => if (depth == 0 && isSelectAt(i)) finalStart = i
      }
    }
    starts.map { st =>
      var d = 0
      var i = st + 6
      var end = -1
      while (i < sql.length && end < 0) {
        sql(i) match {
          case '(' => d += 1
          case ')' => if (d == 0) end = i else d -= 1
          case _ =>
            if (d == 0 && up.startsWith("FROM", i) &&
              !sql(i - 1).isLetterOrDigit) end = i
        }
        i += 1
      }
      val stop = if (end < 0) sql.length else end
      (sql.substring(st + 6, stop), st == finalStart)
    }
  }

  /** Item that would fetch as HUGEINT→float64: contains an integer
    * `sum(` (windowed or aggregate) or an unqualified reference to an
    * already-tainted alias, with nothing that changes the type back:
    *  - CAST anywhere → typed explicitly, safe;
    *  - a top-level comparison → boolean, safe;
    *  - float division `/` (DuckDB `/` is always DOUBLE; only `//`
    *    stays integral) or a float literal → double in both engines,
    *    safe;
    *  - references inside `WHEN … THEN` predicates don't count (the
    *    branch VALUE determines the type, not the predicate);
    *  - `alias.x` doesn't count as a reference to tainted `alias`
    *    (table qualifier, not the tainted column).
    * HUGEINT propagates through `//`, `+`, `*` — which is how q250's
    * windowed cumsum laundered into its chunk_id group key.
    */
  private def taintedItem(item: String,
      tainted: collection.Set[String]): Boolean = {
    if ("(?i)\\bCAST\\s*\\(".r.findFirstIn(item).isDefined) return false
    // mask predicate segments: the WHEN condition never sets the type
    val masked = "(?is)\\bWHEN\\b.*?\\bTHEN\\b".r
      .replaceAllIn(item, "WHEN THEN")
    // float division / float literal → DOUBLE in both engines
    if (masked.replace("//", "").contains("/")) return false
    if ("[0-9]\\.[0-9]".r.findFirstIn(masked).isDefined) return false
    val hasSum = "(?i)\\bsum\\s*\\(".r.findFirstIn(masked).isDefined
    val refsTaint = tainted.exists(t =>
      t.nonEmpty &&
        s"(?i)(?<![\\w.])${java.util.regex.Pattern.quote(t)}\\b(?!\\s*\\.)".r
          .findFirstIn(masked).isDefined)
    if (!hasSum && !refsTaint) return false
    // a top-level comparison yields a boolean column — safe
    var depth = 0
    var cmp = false
    var i = 0
    while (i < masked.length) {
      val c = masked(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && (c == '=' || c == '<' || c == '>')) cmp = true
      i += 1
    }
    !cmp
  }

  private val aliasRe = s"(?is).*?\\bAS\\s+($Ident)\\s*$$".r
  private val bareRe = s"(?:$Ident\\.)?($Ident)".r

  /** Tainted items reaching the final projection of one oracle. */
  private def offenders(sql: String): Seq[String] = {
    val tainted = scala.collection.mutable.Set.empty[String]
    val bad = Seq.newBuilder[String]
    selectClauses(sql).foreach { case (clause, isFinal) =>
      splitItems(clause).foreach { item =>
        val alias = item match {
          case aliasRe(a) => Some(a.toLowerCase)
          case _ => None
        }
        val bare = item match {
          case bareRe(b) => Some(b.toLowerCase)
          case _ => None
        }
        val isBad = taintedItem(item, tainted)
        if (isFinal && isBad)
          bad += item.replaceAll("\\s+", " ").take(80)
        else if (isBad) tainted += alias.orElse(bare).getOrElse("")
      }
    }
    bad.result()
  }

  test("no oracle projects an un-CAST integer sum (HUGEINT→float64)") {
    val flagged = queries.Registry.all.flatMap { q =>
      q.oracle.toSeq.flatMap(sql => offenders(sql).map(i => s"${q.name}: $i"))
    }
    assert(flagged.isEmpty,
      s"\nHUGEINT-tainted final projections (pin CAST(... AS BIGINT), " +
        s"SURVEY §16.1):\n  ${flagged.mkString("\n  ")}")
  }

  test("the scan still catches the two known-bad patterns (controls)") {
    // q159's round-7 bug: sum(CASE…) laundered through a CTE alias
    val q159Style = """WITH pa AS (SELECT doc_id,
        sum(CASE WHEN b >= s THEN 1 ELSE 0 END) AS part FROM t GROUP BY 1)
      SELECT part, count(*) AS n FROM pa GROUP BY 1 ORDER BY 1"""
    assert(offenders(q159Style) === Seq("part"))
    // q250's pre-fix bug: windowed cumsum flowing through arithmetic
    // into a projected group key
    val q250Style = """WITH c AS (SELECT doc_id, n_tok,
        sum(n_tok) OVER (PARTITION BY doc_id ORDER BY i) AS cum FROM sen)
      SELECT doc_id, (cum - n_tok) // 64 AS chunk_id, min(i) AS f
      FROM c GROUP BY 1, 2 ORDER BY 1, 2"""
    assert(offenders(q250Style) === Seq("(cum - n_tok) // 64 AS chunk_id"))
    // and stays quiet on the legitimate launderings
    val clean = """WITH c AS (SELECT g, sum(x) AS sx, count(*) AS n FROM t
        GROUP BY 1)
      SELECT g, CAST(sx AS BIGINT) AS sx, round(sx / n, 6) AS mean,
        sx > 100 AS big, CASE WHEN sx >= n THEN g ELSE 0 END AS pick
      FROM c ORDER BY 1"""
    assert(offenders(clean).isEmpty)
  }
}
