package graft

import org.scalatest.funsuite.AnyFunSuite
import java.util.regex.Pattern

/** Twin-doctrine enforcement (round 14): DuckDB inlines CTEs by
  * default, so a non-materialized CTE referenced more than once is
  * re-derived per reference — and inside an unrolled iterative twin
  * the expansion is EXPONENTIAL in the round count. This cost round 13
  * its entire driver-side correctness artifact (graph_eigenvector's
  * twin hung DuckDB at 21 GB; graph_ktruss peaked at 57 GB; the bpe
  * family burned 30 s each). The rule, enforced here over every gated
  * oracle string so it can never regress silently:
  *
  *   every CTE referenced >= 2 times must carry `AS MATERIALIZED`,
  *   EXCEPT self-referencing (recursive) members, which cannot be.
  *
  * Reference counting is deliberately conservative: a column alias
  * sharing a CTE's name counts as a reference, so the check can
  * over-flag but never under-flag. A new twin tripping this either
  * materializes the CTE or renames the colliding alias.
  * `tools/audit_cte.py` is the ad-hoc twin of this spec.
  */
class GateHygieneSpec extends AnyFunSuite {
  private val CtePat =
    """(?i)\b(\w+)(?:\s*\([\w\s,]*\))?\s+AS\s+(MATERIALIZED\s+)?\(""".r

  private def cteBody(sql: String, start: Int): String = {
    var depth = 1
    var i = start
    while (depth > 0 && i < sql.length) {
      if (sql(i) == '(') depth += 1
      else if (sql(i) == ')') depth -= 1
      i += 1
    }
    sql.substring(start, i - 1)
  }

  test("every multiply-referenced non-recursive oracle CTE is MATERIALIZED") {
    val violations = for {
      (qname, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      m <- CtePat.findAllMatchIn(sql)
      if m.group(2) == null // not MATERIALIZED
      name = m.group(1)
      q = Pattern.quote(name)
      // recursive member: references itself inside its own body
      if s"(?i)(?:FROM|JOIN)\\s+$q\\b".r.findFirstIn(cteBody(sql, m.end)).isEmpty
      // the lookahead excludes DEFINITION sites only (`name AS (` /
      // `name AS MATERIALIZED (`); `FROM name AS alias` is a real
      // reference and must count — a broader `AS` exclusion would
      // under-flag aliased self-joins, the exact hazard class
      refs = s"(?i)(?<![\\w.])$q\\b(?!\\s+AS\\s+(MATERIALIZED\\s+)?\\()".r
        .findAllIn(sql.substring(m.end)).size
      if refs >= 2
    } yield s"$qname: $name x$refs"
    assert(violations.isEmpty,
      "unmaterialized multiply-referenced oracle CTEs (the DuckDB " +
        "inlining hazard — add AS MATERIALIZED):\n" +
        violations.mkString("\n"))
  }

  // ---- float-seam doctrine (round 15, test-enforced round 16) --------
  //
  // Two cross-engine float seams in twin SQL, both per-scale-factor
  // coin tosses (r15 found 27 latent sites that had sat green for ten
  // rounds before one flipped analytics_regression at sf0.001 only):
  //
  //   1. DuckDB's direct DECIMAL→DOUBLE cast DOUBLE-ROUNDS (int128 →
  //      double → ÷10^scale); Spark's goes through BigDecimal and is
  //      correctly rounded — one ulp apart on boundary values. Twins
  //      must hop through text: CAST(CAST(x AS STRING) AS DOUBLE).
  //   2. ROUND(double, n≥1): Spark rounds the SHORTEST REPRESENTATION
  //      half-up (1.005 → 1.01), DuckDB the binary value (→ 1.00).
  //      Twins respell as
  //      CAST(ROUND(CAST(CAST(x AS STRING) AS DECIMAL(38,18)), n) AS DOUBLE).
  //      Scale-0 rounds are exempt: the N.5 boundary is exactly
  //      representable, so both engines see the same tie.
  //
  // `tools/fix_decimal_double_casts.py` is the ad-hoc twin (it also
  // --fix-rewrites class 1); these tests make reintroduction fail
  // `sbt test` instead of a future scale factor. The checks run over
  // the REGISTERED oracle strings — the exact text DuckDB executes —
  // so programmatically-built twins are covered too.

  /** (start, inner) for every balanced `CAST( … )` span in `sql`. */
  private def castSpans(sql: String): Seq[(Int, String)] =
    "(?i)\\bCAST\\s*\\(".r.findAllMatchIn(sql).toSeq.flatMap { m =>
      var depth = 1
      var j = m.end
      while (j < sql.length && depth > 0) {
        if (sql(j) == '(') depth += 1
        else if (sql(j) == ')') depth -= 1
        j += 1
      }
      if (depth == 0) Some((m.start, sql.substring(m.end, j - 1))) else None
    }

  /** Inner texts of `CAST(<decimal-typed expr> AS DOUBLE)` spans missing
    * the text hop (mirrors the tool's needs_hop).
    */
  /** True iff expr is, in whole, one `CAST( … AS STRING)` — the leading
    * CAST's paren must close at the very end. A mere trailing
    * `AS STRING)` (e.g. `SUM(dec) + CAST(y AS STRING)`) is NOT a hop:
    * the decimal seam beside it is still live (mirrors the tool).
    */
  private def isWholeStringCast(expr0: String): Boolean = {
    val e = expr0.reverse.dropWhile(_.isWhitespace).reverse
    "(?is)^\\s*CAST\\s*\\(".r.findFirstMatchIn(e) match {
      case Some(m)
          if "(?is)\\bAS\\s+STRING\\s*\\)\\s*$".r.findFirstIn(e).isDefined =>
        var depth = 1
        var i = m.end
        while (i < e.length && depth > 0) {
          if (e(i) == '(') depth += 1
          else if (e(i) == ')') depth -= 1
          i += 1
        }
        depth == 0 && i == e.length
      case _ => false
    }
  }

  private[graft] def unhoppedDecimalDoubleCasts(sql: String): Seq[String] =
    castSpans(sql).map(_._2).filter { inner =>
      val body = inner.reverse.dropWhile(_.isWhitespace).reverse
      "(?is)\\bAS\\s+DOUBLE\\s*$".r.findFirstMatchIn(body) match {
        case None => false
        case Some(m) =>
          val expr = body.substring(0, m.start).trim
          "(?i)\\bDECIMAL\\s*\\(".r.findFirstIn(expr).isDefined &&
            !isWholeStringCast(expr) &&
            // the Spark-parity ROUND respell: its result is a small-scale
            // decimal whose significand fits a double exactly — the outer
            // cast is single-rounding-safe by construction
            !("(?is)^\\s*ROUND\\s*\\(".r.findFirstIn(expr).isDefined &&
              "(?i)DECIMAL\\s*\\(38,\\s*18\\s*\\)".r.findFirstIn(expr).isDefined)
      }
    }.map(_.split("\\s+").mkString(" ").take(90))

  /** `ROUND(x, n≥1)` spans whose argument is not the Spark-parity
    * respell (mirrors the tool's round_hazards, incl. the scale-0
    * exemption).
    */
  private[graft] def bareRoundHazards(sql: String): Seq[String] =
    "(?i)\\bROUND\\s*\\(".r.findAllMatchIn(sql).toSeq.flatMap { m =>
      var depth = 1
      var j = m.end
      while (j < sql.length && depth > 0) {
        if (sql(j) == '(') depth += 1
        else if (sql(j) == ')') depth -= 1
        j += 1
      }
      if (depth != 0) None
      else {
        val inner = sql.substring(m.end, j - 1)
        // first top-level argument
        var d = 0
        var cut = inner.length
        var i = 0
        while (i < inner.length && cut == inner.length) {
          inner(i) match {
            case '(' => d += 1
            case ')' => d -= 1
            case ',' if d == 0 => cut = i
            case _ =>
          }
          i += 1
        }
        val firstArg = inner.substring(0, cut).reverse
          .dropWhile(_.isWhitespace).reverse
        val rest = inner.substring(firstArg.length)
          .dropWhile(c => c == ' ' || c == ',' || c == '\n' || c == '|' || c == '\t')
        val scale = if (rest.isEmpty) "" else rest.split("\\)")(0).trim
        if (scale == "" || scale == "0") None // N.5 exact — no seam
        else if ("(?is)AS\\s+STRING\\s*\\)\\s*AS\\s+DECIMAL\\s*\\(38,\\s*18\\s*\\)\\s*\\)\\s*$".r
            .findFirstIn(firstArg).isDefined) None // already the respell
        else Some(inner.split("\\s+").mkString(" ").take(90))
      }
    }

  test("no oracle twin carries a raw DECIMAL→DOUBLE cast (double-rounding seam)") {
    val violations = for {
      (qname, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      site <- unhoppedDecimalDoubleCasts(sql)
    } yield s"$qname: $site"
    assert(violations.isEmpty,
      "raw CAST(<decimal> AS DOUBLE) in oracle twins — DuckDB double-" +
        "rounds this (a per-SF gate coin toss); hop through text as " +
        "CAST(CAST(x AS STRING) AS DOUBLE), or run tools/" +
        "fix_decimal_double_casts.py --fix:\n" + violations.mkString("\n"))
  }

  test("no oracle twin carries a bare ROUND(x, n>=1) (repr-vs-binary seam)") {
    val violations = for {
      (qname, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      site <- bareRoundHazards(sql)
    } yield s"$qname: $site"
    assert(violations.isEmpty,
      "bare ROUND(x, n>=1) in oracle twins — Spark rounds the shortest " +
        "repr, DuckDB the binary value; respell as CAST(ROUND(CAST(" +
        "CAST(x AS STRING) AS DECIMAL(38,18)), n) AS DOUBLE) (a ROUND " +
        "over a genuinely DECIMAL-typed argument is exact: if that's " +
        "the case, restructure so the auditor sees the DECIMAL(38,18) " +
        "spelling):\n" + violations.mkString("\n"))
  }

  test("the decimal-cast auditor fires on the raw spelling (bad fixture)") {
    val bad = "SELECT CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) FROM t"
    assert(unhoppedDecimalDoubleCasts(bad).nonEmpty,
      "auditor must flag the raw decimal→double cast")
    val hopped =
      "SELECT CAST(CAST(SUM(CAST(x AS DECIMAL(18,2))) AS STRING) AS DOUBLE) FROM t"
    assert(unhoppedDecimalDoubleCasts(hopped).isEmpty,
      "auditor must pass the text hop")
    val respell = "SELECT CAST(ROUND(CAST(CAST(x AS STRING) AS " +
      "DECIMAL(38,18)), 2) AS DOUBLE) FROM t"
    assert(unhoppedDecimalDoubleCasts(respell).isEmpty,
      "auditor must pass the ROUND respell's outer cast")
    val plainDouble = "SELECT CAST(x AS DOUBLE) FROM t"
    assert(unhoppedDecimalDoubleCasts(plainDouble).isEmpty,
      "a cast with no decimal in scope is out of the seam's reach")
    // a trailing unrelated string cast must NOT read as the hop: the
    // decimal seam beside it is still live (r16 review finding — the
    // old check anchored on a mere 'AS STRING)' suffix)
    val trailing = "SELECT CAST(SUM(CAST(x AS DECIMAL(18,2))) + " +
      "CAST(y AS STRING) AS DOUBLE) FROM t"
    assert(unhoppedDecimalDoubleCasts(trailing).nonEmpty,
      "auditor must flag a live decimal seam beside an unrelated " +
        "trailing string cast")
  }

  test("the ROUND auditor fires on the bare spelling (bad fixture)") {
    assert(bareRoundHazards("SELECT ROUND(AVG(x), 2) FROM t").nonEmpty,
      "auditor must flag bare ROUND(x, 2)")
    assert(bareRoundHazards("SELECT ROUND(x) + ROUND(y, 0) FROM t").isEmpty,
      "scale-0 rounds are exempt (the N.5 boundary is exact)")
    val respelled = "SELECT CAST(ROUND(CAST(CAST(x AS STRING) AS " +
      "DECIMAL(38,18)), 2) AS DOUBLE) FROM t"
    assert(bareRoundHazards(respelled).isEmpty,
      "auditor must pass the Spark-parity respell")
  }
}
