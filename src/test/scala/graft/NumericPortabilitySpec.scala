package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static gate for the §18.5 numeric-portability contract, learned
  * from the three REAL sf1 reds of round 10 (q224, q230, q241 —
  * commit 2f5d1be) and previously only prose in SURVEY.md:
  *
  *  1. **round(x, 6) over a big-magnitude double** (q224/q241 class):
  *     once a 6-decimal value needs >15 significant digits (operand
  *     past ~1e9), Spark's exact-BigDecimal round and DuckDB's double
  *     round diverge BY CONSTRUCTION — ULP luck, not correctness. The
  *     operands that get there carry VALUE² magnitude: sums of
  *     products (variances, squares of e6-quantized columns) divided
  *     by count-only denominators, so the value² scale never cancels.
  *     The scan flags round(X, 6) whose NUMERATOR is product-sum-
  *     tainted while its DENOMINATOR is not — which is exactly what
  *     separates the broken shapes (variance / n²) from the bounded
  *     ones the registry uses everywhere (cosine dp/√(n2·n2),
  *     correlation/OLS covariance ratios: value² over value², bounded
  *     by Cauchy-Schwarz). Such values must take the exact-integer
  *     path (Portable.dsum6 / HUGEINT half-up, one correctly-rounded
  *     int64→double at the end) or be allowlisted BY NAME with the
  *     bound that keeps the operand under ~1e9.
  *
  *  2. **bare BIGINT×BIGINT between e6-scaled aggregates** (q230
  *     class): DuckDB does NOT auto-promote — it throws on overflow
  *     where Spark's decimal lattice widens. The overflow-feasible
  *     products are those whose BOTH operands carry aggregate(N)×1e6
  *     magnitude (q230's w ≈ n·1e6 times row_target ≈ tt·1e6/ns
  *     crossed 2^63 at sf1 row counts); per-row e6 squares like
  *     q77's (q−c)² are bounded by quantization (~1e13) and plain
  *     count products cross only at ~3e9 rows — both out of the
  *     learned class. Flagged items must carry an explicit HUGEINT
  *     (or DECIMAL) widening in the same select item.
  *
  * Both scans are textual taint trackers in the OracleDtypeSpec
  * style: conservative, calibrated so the current registry passes on
  * merit or named allowlist, and pinned by control tests that replay
  * the actual pre-fix q224/q230 oracle shapes.
  */
class NumericPortabilitySpec extends AnyFunSuite {

  private val Ident = "[A-Za-z_][A-Za-z0-9_]*"

  /** Split a clause on a top-level separator character. */
  private def splitTop(clause: String, sep: Char): Seq[String] = {
    val items = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    clause.foreach { c =>
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      if (c == sep && depth == 0) { items += cur.toString; cur.clear() }
      else cur += c
    }
    items += cur.toString
    items.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Every SELECT clause body (any nesting depth), in source order —
    * WITH-chain order, so taint flows forward through the CTEs.
    */
  private def selectClauses(sql: String): Seq[String] = {
    val up = sql.toUpperCase
    def isSelectAt(i: Int): Boolean =
      up.startsWith("SELECT", i) && (i == 0 || !sql(i - 1).isLetterOrDigit)
    (0 until sql.length).filter(isSelectAt).map { st =>
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
      sql.substring(st + 6, if (end < 0) sql.length else end)
    }
  }

  /** Balanced argument text of every call of `fn` in `s`. */
  private def callArgs(s: String, fn: String): Seq[String] = {
    val re = s"(?i)(?<![\\w.])${fn}\\s*\\(".r
    re.findAllMatchIn(s).map { m =>
      var d = 1
      var i = m.end
      while (i < s.length && d > 0) {
        if (s(i) == '(') d += 1 else if (s(i) == ')') d -= 1
        i += 1
      }
      s.substring(m.end, math.max(m.end, i - 1))
    }.toSeq
  }

  private val aliasRe = s"(?is).*?\\bAS\\s+($Ident)\\s*$$".r

  /** Does `s` reference any of `names` as a bare or table-qualified
    * identifier? Qualifier prefixes are stripped so `w.rs` counts as
    * a reference to tainted `rs`.
    */
  private def refs(s: String, names: collection.Set[String]): Boolean = {
    val stripped = s.replaceAll(s"$Ident\\.", "")
    names.exists(t => t.nonEmpty &&
      s"(?i)(?<!\\w)${java.util.regex.Pattern.quote(t)}\\b".r
        .findFirstIn(stripped).isDefined)
  }

  /** Is the operand token touching position `i` (exclusive) a
    * NON-LITERAL term — identifier/call/parenthesized expression
    * rather than a numeric literal like 1000000 or 1e6?
    */
  private def nonLiteralAt(s: String, i: Int, fromLeft: Boolean): Boolean = {
    val identChars = (c: Char) =>
      c.isLetterOrDigit || c == '_' || c == '.' || c == '(' || c == ')'
    val tok =
      if (fromLeft)
        s.substring(0, i).reverse.dropWhile(_.isWhitespace)
          .takeWhile(identChars).reverse
      else
        s.substring(i + 1).dropWhile(_.isWhitespace).takeWhile(identChars)
    tok.nonEmpty &&
      !tok.replaceAll("[()]", "").matches("[0-9][0-9.eE+\\-]*")
  }

  /** A sum over an argument containing a product of two non-literal
    * terms — the value²-magnitude shape (variance second moments,
    * squares of e6-quantized columns, dot products, covariances).
    * `sum(x * 1000000)` (literal scaling) is NOT in this class.
    */
  private def hasProdSum(s: String): Boolean =
    callArgs(s, "sum").exists { arg =>
      arg.indices.filter(arg(_) == '*').exists { i =>
        nonLiteralAt(arg, i, fromLeft = true) &&
          nonLiteralAt(arg, i, fromLeft = false)
      }
    }

  /** Power-of-ten literal ≥ 1e6 — the e6/e9 fixed-point multipliers. */
  private def hasE6Literal(s: String): Boolean =
    "\\b10{6,}\\b".r.findFirstIn(s).isDefined ||
      "(?i)\\b[1-9]e(?:0?[6-9]|1[0-9])\\b".r.findFirstIn(s).isDefined

  private case class Taint(big: Set[String], bigE6: Set[String],
      prodVal: Set[String])

  /** One forward pass over the SQL's select items, accumulating the
    * three alias taints: `big` = aggregate-derived (N-magnitude),
    * `bigE6` = aggregate-derived AND e6-scaled somewhere in the
    * lineage (N·1e6 magnitude, the q230 class), `prodVal` = carries
    * value² magnitude (product-sum lineage, the q224 class).
    */
  private def taints(sql: String): Taint = {
    val big = scala.collection.mutable.Set.empty[String]
    val bigE6 = scala.collection.mutable.Set.empty[String]
    val prodVal = scala.collection.mutable.Set.empty[String]
    selectClauses(sql).foreach { clause =>
      splitTop(clause, ',').foreach { item =>
        val alias = item match {
          case aliasRe(a) => Some(a.toLowerCase)
          case _ => None
        }
        val isBig =
          "(?i)\\b(sum|count)\\s*\\(".r.findFirstIn(item).isDefined ||
            refs(item, big)
        val isBigE6 = (isBig && hasE6Literal(item)) || refs(item, bigE6)
        val isProd = hasProdSum(item) || refs(item, prodVal)
        alias.foreach { a =>
          if (isBig) big += a
          if (isBigE6) bigE6 += a
          if (isProd) prodVal += a
        }
      }
    }
    Taint(big.toSet, bigE6.toSet, prodVal.toSet)
  }

  /** Class-1 offenders: round(X, 6) where X's numerator carries
    * value² (product-sum) magnitude and its denominator does not —
    * variance-over-count shapes whose 6-decimal form outgrows double
    * precision with N or quantization².
    */
  private def roundedProdSums(sql: String): Seq[String] = {
    val t = taints(sql)
    def prod(e: String): Boolean =
      e.nonEmpty && (hasProdSum(e) || refs(e, t.prodVal))
    callArgs(sql, "round").flatMap { args =>
      val items = splitTop(args, ',')
      if (items.length != 2 || items.last.trim != "6") None
      else {
        val parts = splitTop(items.head, '/')
        val num = parts.headOption.getOrElse("")
        val den = parts.drop(1).mkString("/")
        if (prod(num) && !prod(den))
          Some(items.head.replaceAll("\\s+", " ").take(90))
        else None
      }
    }.distinct
  }

  /** Class-2 offenders: a `*` whose BOTH operands resolve to
    * bigE6-tainted terms, in a select item with no HUGEINT/DECIMAL
    * widening — the q230 aggregate(N)·1e6 × aggregate(N)·1e6 shape.
    *
    * Runs its own PROGRESSIVE forward pass (each clause is scanned
    * with only the taints of EARLIER clauses — SQL alias scoping, so
    * a later CTE re-defining `x` cannot retro-taint an earlier one),
    * and aliases whose defining item already carries HUGEINT/DECIMAL
    * are `wide` — their type follows the expression, so products over
    * them (directly or via a parenthesized mixed expression) are
    * exempt: the widening the contract demands is already there.
    */
  private def bareBigProducts(sql: String): Seq[String] = {
    val big = scala.collection.mutable.Set.empty[String]
    val bigE6 = scala.collection.mutable.Set.empty[String]
    val wide = scala.collection.mutable.Set.empty[String]
    val out = Seq.newBuilder[String]
    def hot: collection.Set[String] = bigE6.diff(wide)
    def operandE6(side: String, fromLeft: Boolean): Boolean = {
      val s = side.trim
      if (s.isEmpty) false
      else if (fromLeft) {
        if (s.endsWith(")")) {
          var d = 0
          var i = s.length - 1
          var start = -1
          while (i >= 0 && start < 0) {
            if (s(i) == ')') d += 1
            else if (s(i) == '(') { d -= 1; if (d == 0) start = i }
            i -= 1
          }
          if (start < 0) false
          else {
            val sub = s.substring(start)
            refs(sub, hot) && !refs(sub, wide)
          }
        } else {
          s"(?is).*?($Ident)\\s*$$".r.findFirstMatchIn(s)
            .exists(m => hot.contains(m.group(1).toLowerCase))
        }
      } else {
        if (s.startsWith("(") ||
          s"(?is)^$Ident\\s*\\(.*".r.findFirstIn(s).isDefined) {
          val open = s.indexOf('(')
          var d = 0
          var i = open
          var end = -1
          while (i < s.length && end < 0) {
            if (s(i) == '(') d += 1
            else if (s(i) == ')') { d -= 1; if (d == 0) end = i }
            i += 1
          }
          end > 0 && {
            val sub = s.substring(open, end + 1)
            refs(sub, hot) && !refs(sub, wide)
          }
        } else {
          s"(?is)^\\s*($Ident)".r.findFirstMatchIn(s)
            .exists(m => hot.contains(m.group(1).toLowerCase))
        }
      }
    }
    selectClauses(sql).foreach { clause =>
      val items = splitTop(clause, ',')
      // scan with the PRE-clause taint state
      items.foreach { item =>
        if ("(?i)\\b(HUGEINT|DECIMAL)\\b".r.findFirstIn(item).isEmpty) {
          val stars = item.indices.filter(item(_) == '*')
            .filterNot(i => i > 0 && item(i - 1) == '(')  // count(*)
            .filterNot(i => i + 1 < item.length && item(i + 1) == ')')
          val hit = stars.exists { i =>
            operandE6(item.substring(0, i), fromLeft = true) &&
              operandE6(item.substring(i + 1), fromLeft = false)
          }
          if (hit) out += item.replaceAll("\\s+", " ").take(90)
        }
      }
      // then absorb this clause's aliases
      items.foreach { item =>
        val alias = item match {
          case aliasRe(a) => Some(a.toLowerCase)
          case _ => None
        }
        val isBig =
          "(?i)\\b(sum|count)\\s*\\(".r.findFirstIn(item).isDefined ||
            refs(item, big)
        val isBigE6 = (isBig && hasE6Literal(item)) || refs(item, bigE6)
        val isWide =
          "(?i)\\b(HUGEINT|DECIMAL)\\b".r.findFirstIn(item).isDefined
        alias.foreach { a =>
          if (isBig) big += a
          if (isBigE6) bigE6 += a
          if (isWide) wide += a
        }
      }
    }
    out.result().distinct
  }

  /** Oracles whose class-1 flag is bounded on inspection — each entry
    * names the bound that keeps the rounded operand under ~1e9 at ANY
    * oracle scale. Additions need the same justification (or, better,
    * the exact-integer path).
    */
  private val boundedRounds: Map[String, String] = Map(
    "q231_snips_off_policy" ->
      ("SNIPS is the SELF-NORMALIZED estimator Σw·r/Σw — a weighted " +
        "MEAN of r_v6, bounded by max(r_v6) ≈ max(value)·1e6 " +
        "(data-scale, ~1e8 on the events value domain), independent " +
        "of N; the raw-IPS sum it replaces would be the unbounded one")
  )

  test("no oracle rounds a value-squared magnitude to 6 decimals (q224 class)") {
    val flagged = queries.Registry.all
      .filterNot(q => boundedRounds.contains(q.name))
      .flatMap { q =>
        q.oracle.toSeq.flatMap(roundedProdSums).map(x => s"${q.name}: $x")
      }
    assert(flagged.isEmpty,
      "\nround(x,6) over a product-sum numerator with a count-only " +
        "denominator diverges by construction past 15 significant " +
        "digits — take the exact-integer path (Portable.dsum6 / " +
        "HUGEINT half-up) or allowlist with a bound:\n  " +
        flagged.mkString("\n  "))
  }

  test("no oracle multiplies two e6-scaled aggregates without HUGEINT (q230 class)") {
    val flagged = queries.Registry.all.flatMap { q =>
      q.oracle.toSeq.flatMap(bareBigProducts).map(x => s"${q.name}: $x")
    }
    assert(flagged.isEmpty,
      "\nDuckDB throws on BIGINT×BIGINT overflow where Spark widens — " +
        "carry an explicit CAST(... AS HUGEINT) on e6-scaled aggregate " +
        "products:\n  " + flagged.mkString("\n  "))
  }

  test("allowlisted names exist in the registry") {
    val names = queries.Registry.all.map(_.name).toSet
    val ghosts = boundedRounds.keySet.filterNot(names)
    assert(ghosts.isEmpty,
      s"allowlist entries no longer in the registry: ${ghosts.mkString(", ")}")
  }

  test("control: the PRE-FIX q224 shape (rounded e6 variance) is caught") {
    // the actual round-10 red: round over (n·s2 − s1²)/n² where
    // s2 = sum(q·q) of e6-quantized values — ~1.6e10 operand
    val preFix = """WITH el AS (SELECT dim, CAST(floor(x * 1e6) AS BIGINT)
          AS q FROM embeddings),
      m AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(q) AS BIGINT) AS s1,
          CAST(sum(q * q) AS BIGINT) AS s2 FROM el GROUP BY 1)
      SELECT dim, round((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
          / (CAST(n AS DOUBLE) * n) / 1000000.0, 6) AS var_q6
      FROM m ORDER BY 1"""
    assert(roundedProdSums(preFix).nonEmpty,
      "the q224 pre-fix oracle must trip the round-of-product-sum scan")
  }

  test("control: the PRE-FIX q230 shape (bare e6-aggregate product) is caught") {
    // the actual round-10 red: w × row_target with both sides
    // aggregate·1e6 BIGINTs and no HUGEINT widening
    val preFix = """WITH ct AS (SELECT source, CAST(count(*) AS BIGINT)
          AS n FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM ct),
      w0 AS (SELECT source, n * 1000000 AS w, (tt * 1000000) // 10
          AS row_target FROM ct, tot),
      rs AS (SELECT CAST(sum(w) AS BIGINT) AS rs FROM w0)
      SELECT source, (2 * w * row_target + rs.rs) // (2 * rs.rs) AS w
      FROM w0, rs ORDER BY 1"""
    assert(bareBigProducts(preFix).nonEmpty,
      "the q230 pre-fix oracle must trip the bare-e6-product scan")
  }

  test("control: the safe canonical shapes stay quiet") {
    // cosine: value² over value² — bounded by Cauchy-Schwarz
    val cosine = """WITH n AS (SELECT vec_id, CAST(sum(x * x) AS BIGINT)
          AS n2 FROM el GROUP BY 1),
      d AS (SELECT a, b, sum(xa * xb) AS dp FROM p GROUP BY 1, 2)
      SELECT a, b, round(dp / sqrt(na.n2 * nb.n2), 6) AS cs
      FROM d JOIN n na ON d.a = na.vec_id JOIN n nb ON d.b = nb.vec_id"""
    assert(roundedProdSums(cosine).isEmpty,
      "norm-cancelled cosine ratios must pass the class-1 scan")
    // OLS slope: covariance over variance — value² cancels
    val ols = """WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          CAST(sum(x * y) AS BIGINT) AS sxy,
          CAST(sum(x * x) AS BIGINT) AS sxx FROM t)
      SELECT round(CAST(n * sxy - sx * sy AS DOUBLE)
          / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope6 FROM m"""
    assert(roundedProdSums(ols).isEmpty,
      "covariance/variance ratios must pass the class-1 scan")
    // plain e6 mean: round of a plain-sum ratio
    val mean = """WITH m AS (SELECT dim, CAST(sum(q) AS BIGINT) AS s1,
        CAST(count(*) AS BIGINT) AS n FROM el GROUP BY 1)
      SELECT dim, round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6)
        AS mean_q6 FROM m ORDER BY 1"""
    assert(roundedProdSums(mean).isEmpty, "plain sum ratios must pass")
    // the FIXED q230 shape: HUGEINT widening present
    val fixed = """WITH w0 AS (SELECT source, n * 1000000 AS w,
          (tt * 1000000) // 10 AS row_target FROM ct, tot),
      rs AS (SELECT CAST(sum(w) AS BIGINT) AS rs FROM w0)
      SELECT source, (2 * CAST(w.w AS HUGEINT) * w.row_target + r.rs)
        // (2 * CAST(r.rs AS HUGEINT)) AS w FROM w0 w, rs r"""
    assert(bareBigProducts(fixed).isEmpty,
      "HUGEINT-widened e6 products must pass the class-2 scan")
    // per-row e6 squares bounded by quantization (q77's Lloyd step)
    val lloyd = """SELECT e.vec_id, c.cell,
        sum((e.q - c.c) * (e.q - c.c)) AS d2 FROM el e JOIN c0 c
        ON e.dim = c.dim GROUP BY 1, 2"""
    assert(bareBigProducts(lloyd).isEmpty,
      "per-row quantization-bounded squares must pass the class-2 scan")
  }
}
