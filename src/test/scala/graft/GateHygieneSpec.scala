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
}
