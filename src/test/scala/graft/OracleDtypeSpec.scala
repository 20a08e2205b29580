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

  /** Integer-sum item that would fetch as HUGEINT→float64. */
  private def taintedItem(item: String): Boolean = {
    if (!"(?i)\\bsum\\s*\\(".r.findFirstIn(item).isDefined) return false
    if ("(?i)\\bCAST\\s*\\(".r.findFirstIn(item).isDefined) return false
    // a top-level comparison yields a boolean column — safe
    var depth = 0
    var cmp = false
    var i = 0
    while (i < item.length) {
      val c = item(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && (c == '=' || c == '<' || c == '>')) cmp = true
      i += 1
    }
    !cmp
  }

  test("no oracle projects an un-CAST integer sum (HUGEINT→float64)") {
    val aliasRe = s"(?is).*?\\bAS\\s+($Ident)\\s*$$".r
    val bareRe = s"(?:$Ident\\.)?($Ident)".r
    val offenders = queries.Registry.all.flatMap { q =>
      q.oracle.toSeq.flatMap { sql =>
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
            val isBad = taintedItem(item) ||
              bare.exists(tainted.contains)
            if (isFinal && isBad)
              bad += s"${q.name}: ${item.replaceAll("\\s+", " ").take(80)}"
            else if (isBad) tainted += alias.orElse(bare).getOrElse("")
          }
        }
        bad.result()
      }
    }
    assert(offenders.isEmpty,
      s"\nHUGEINT-tainted final projections (pin CAST(... AS BIGINT), " +
        s"SURVEY §16.1):\n  ${offenders.mkString("\n  ")}")
  }
}
