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

  // ---- integer-overflow doctrine (round 17, named by the sf1 run) -----
  //
  // The class the r16 sf1 campaign caught by MEASUREMENT (the only two
  // real failures at 100x the gate scale): an unbounded SUM/cumulative
  // magnitude — revenue cents summed over the fact table — multiplied
  // by a ppm/percent scale constant in BIGINT. `cum_cents * 1000000`
  // sat green at sf0.001–sf0.1 for ten rounds and overflowed 2^63 at
  // sf1 (~2.3e13 cents x 1e6); 100 TB is another ~10^4 beyond that.
  // The fix routes the multiply through DECIMAL(38,0) (Spark) /
  // HUGEINT (DuckDB) — exact integer floor division either way.
  //
  // This check makes the class fail `sbt test` instead of a future
  // scale factor: every REGISTERED oracle twin is swept for
  // multiplicative chains holding an integer literal >= 1000 and an
  // unbounded-magnitude factor with no widening cast in the chain.
  // `tools/audit_overflow.py` is the ad-hoc twin (it additionally
  // sweeps the engine expr("...") strings in the query files); the
  // heuristic, exemptions and their headroom arithmetic are documented
  // there — the two implementations must stay in lockstep.

  private val OvfLit = """(?<![\w.$])(\d{4,})(?:L\b)?(?![\w.])""".r
  private val OvfMagnitude =
    ("(?i)(?:^|_)(cum\\w*|total\\w*|sum\\w*|rev|revenue|spend\\w*|sales|" +
      "cents\\w*)(?:_|$)|_(?:c|mc|cents)$|^grand").r
  private val OvfBounded =
    "(?i)(?:^|_)(avg|mean|max|min|med|p\\d+|stddev)(?:_|$)|^(list|array)_".r
  private val OvfIndicatorSum =
    "(?is)\\bSUM\\s*\\(\\s*CASE\\s+WHEN\\b.*?\\bTHEN\\s+1\\s+ELSE\\s+0\\s+END\\s*\\)".r
  private val OvfWidened =
    "(?is)\\bAS\\s+(?:DECIMAL\\s*\\(\\s*38\\s*,\\s*0\\s*\\)|HUGEINT)\\s*\\)".r
  private val OvfFloating =
    "(?is)\\bAS\\s+(?:DOUBLE|FLOAT|REAL)\\s*\\)\\s*$|\\d\\.\\d".r
  private val OvfCountScaleMax = BigInt(1000000)

  private def ovfIsWordChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '.' || c == '$'

  private def ovfSkipWs(s: String, i0: Int, step: Int): Int = {
    var i = i0
    while (i >= 0 && i < s.length &&
        (s(i) == ' ' || s(i) == '\t' || s(i) == '\n' || s(i) == '\r' ||
          s(i) == '|')) i += step
    i
  }

  /** Factor ending at s(i) scanning left; (start, text) or None. */
  private def ovfFactorLeft(s: String, i0: Int): Option[(Int, String)] = {
    val i = ovfSkipWs(s, i0, -1)
    if (i < 0) None
    else if (s(i) == ')') {
      var depth = 1
      var j = i - 1
      while (j >= 0 && depth > 0) {
        if (s(j) == ')') depth += 1
        else if (s(j) == '(') depth -= 1
        j -= 1
      }
      if (depth > 0) None
      else {
        var k = j
        while (k >= 0 && ovfIsWordChar(s(k))) k -= 1
        Some((k + 1, s.substring(k + 1, i + 1)))
      }
    } else if (ovfIsWordChar(s(i))) {
      var k = i
      while (k >= 0 && ovfIsWordChar(s(k))) k -= 1
      Some((k + 1, s.substring(k + 1, i + 1)))
    } else None
  }

  /** Factor starting at s(i) scanning right; (endExcl, text) or None. */
  private def ovfFactorRight(s: String, i0: Int): Option[(Int, String)] = {
    val i = ovfSkipWs(s, i0, 1)
    if (i >= s.length) None
    else if (ovfIsWordChar(s(i))) {
      var k = i
      while (k < s.length && ovfIsWordChar(s(k))) k += 1
      val j0 = ovfSkipWs(s, k, 1)
      if (j0 < s.length && s(j0) == '(') {
        var depth = 1
        var j = j0 + 1
        while (j < s.length && depth > 0) {
          if (s(j) == '(') depth += 1
          else if (s(j) == ')') depth -= 1
          j += 1
        }
        if (depth > 0) None else Some((j, s.substring(i, j)))
      } else Some((k, s.substring(i, k)))
    } else if (s(i) == '(') {
      var depth = 1
      var j = i + 1
      while (j < s.length && depth > 0) {
        if (s(j) == '(') depth += 1
        else if (s(j) == ')') depth -= 1
        j += 1
      }
      if (depth > 0) None else Some((j, s.substring(i, j)))
    } else None
  }

  /** All factor texts in the maximal multiplicative chain around the
    * literal at [litStart, litEnd).
    */
  private def ovfChainAround(s: String, litStart: Int,
      litEnd: Int): Seq[String] = {
    val factors = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = ovfSkipWs(s, litStart - 1, -1)
    var continue = i >= 0 && s(i) == '*'
    while (continue) {
      ovfFactorLeft(s, i - 1) match {
        case Some((start, text)) =>
          factors += text
          i = ovfSkipWs(s, start - 1, -1)
          continue = i >= 0 && s(i) == '*'
        case None => continue = false
      }
    }
    var j = ovfSkipWs(s, litEnd, 1)
    continue = j < s.length && s(j) == '*'
    while (continue) {
      ovfFactorRight(s, j + 1) match {
        case Some((end, text)) =>
          factors += text
          j = ovfSkipWs(s, end, 1)
          continue = j < s.length && s(j) == '*'
        case None => continue = false
      }
    }
    factors.toSeq
  }

  private def ovfIdentSegments(factor: String): Seq[String] =
    "[A-Za-z_][\\w.$]*".r.findAllIn(factor).toSeq
      .map(_.split('.').last)

  private val OvfLengthFactor =
    "(?is)^\\s*(?:CAST\\s*\\(\\s*)?(?:bit_|octet_)?len(?:gth)?\\s*\\(".r

  private def ovfIsUnbounded(factor: String, lit: BigInt): Boolean = {
    // a value-width (length) factor is per-value bounded (≤ 64 for
    // bin(BIGINT) — the log2 kernel's bit-length × 10⁶)
    if (OvfLengthFactor.findFirstIn(factor).isDefined) return false
    val stripped = OvfIndicatorSum.replaceAllIn(factor, " ")
    if ("(?i)\\bSUM\\s*\\(".r.findFirstIn(stripped).isDefined) true
    else if ("(?i)\\bCOUNT\\s*\\(".r.findFirstIn(factor).isDefined ||
        OvfIndicatorSum.findFirstIn(factor).isDefined)
      lit > OvfCountScaleMax
    else {
      val segs = ovfIdentSegments(factor).filterNot(s =>
        "(?i)^(sum|count|cast|coalesce|case|when|then|else|end|greatest|least)$"
          .r.matches(s))
      if (segs.exists(s => OvfBounded.findFirstIn(s).isDefined)) false
      else segs.exists(s => OvfMagnitude.findFirstIn(s).isDefined)
    }
  }

  private[graft] def unwidenedScaleMultiplies(sql: String): Seq[String] =
    OvfLit.findAllMatchIn(sql).toSeq.flatMap { m =>
      val lit = BigInt(m.group(1))
      val factors = ovfChainAround(sql, m.start, m.end)
      if (factors.isEmpty) Nil
      else if (factors.exists(f => OvfWidened.findFirstIn(f).isDefined)) Nil
      else if (factors.exists(f => OvfFloating.findFirstIn(f).isDefined)) Nil
      else {
        val hot = factors.filter(f => ovfIsUnbounded(f, lit))
        if (hot.isEmpty) Nil
        else Seq(s"*${m.group(1)} over " +
          hot.map(_.split("\\s+").mkString(" ").take(70)).mkString("; "))
      }
    }

  test("no oracle twin multiplies an unbounded magnitude by a scale " +
      "constant in narrow integers (the sf1 overflow class)") {
    val violations = for {
      (qname, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      site <- unwidenedScaleMultiplies(sql)
    } yield s"$qname: $site"
    assert(violations.isEmpty,
      "narrow scale-constant multiply over an unbounded SUM/cents " +
        "magnitude (the cum_cents*1e6 shape sf1 caught by measurement) " +
        "— widen through CAST(x AS HUGEINT) in the twin / " +
        "DECIMAL(38,0) in the engine, or restructure per tools/" +
        "audit_overflow.py:\n" + violations.mkString("\n"))
  }

  test("the overflow auditor fires on the narrow spelling (bad fixture)") {
    val bad = "SELECT CAST(cum_cents * 1000000 // total_c AS BIGINT) FROM t"
    assert(unwidenedScaleMultiplies(bad).nonEmpty,
      "auditor must flag the narrow cum_cents*1e6 shape")
    val widened = "SELECT CAST(CAST(cum_cents AS HUGEINT) * 1000000 " +
      "// total_c AS BIGINT) FROM t"
    assert(unwidenedScaleMultiplies(widened).isEmpty,
      "auditor must pass the HUGEINT widening")
    val widenedSpark =
      "SELECT CAST(cum_cents AS DECIMAL(38,0)) * 1000000 DIV total_c FROM t"
    assert(unwidenedScaleMultiplies(widenedSpark).isEmpty,
      "auditor must pass the DECIMAL(38,0) widening")
    val sumBad = "SELECT SUM(e.n_subwords) * 1000000 // SUM(w.n_words) FROM t"
    assert(unwidenedScaleMultiplies(sumBad).nonEmpty,
      "auditor must flag a non-indicator SUM under a scale constant")
    val indicator = "SELECT SUM(CASE WHEN x THEN 1 ELSE 0 END) * 1000000 " +
      "// n FROM t"
    assert(unwidenedScaleMultiplies(indicator).isEmpty,
      "row-count magnitudes are exempt under <= 1e6 (documented ~9x " +
        "headroom at a 100 TB row count)")
    assert(unwidenedScaleMultiplies(
      "SELECT COUNT(*) * 67108864 FROM t").nonEmpty,
      "a row count under a > 1e6 constant is back in scope")
    assert(unwidenedScaleMultiplies(
      "SELECT avg_cents * 1000000 // n FROM t").isEmpty,
      "per-row-bounded statistics (avg/mean/max/min stems) are exempt")
    assert(unwidenedScaleMultiplies(
      "SELECT CAST(length(bin(t.x_c)) - 1 AS BIGINT) * 1000000 FROM t")
      .isEmpty,
      "a value-width (length) factor is per-value bounded — the log2 " +
        "kernel's bit-length x 1e6")
    assert(unwidenedScaleMultiplies(
      "SELECT cum_cents * 1000000.0 / total_c FROM t").isEmpty,
      "floating-point chains are the float-seam doctrine's beat, not " +
        "this one's")
    // widening anywhere in a factor counts: HUGEINT propagates through
    // integer division, so the outer multiply is already wide
    val propagated = "SELECT ((CAST(sum_c AS HUGEINT) * 1000 // n) * " +
      "1000000) // d FROM t"
    assert(unwidenedScaleMultiplies(propagated).isEmpty,
      "a widened inner factor makes the whole chain wide")
  }

  test("the Scala auditor agrees with tools/audit_overflow.py on the " +
      "shared fixture corpus") {
    // THE lockstep anchor between the two hand-written implementations
    // (r17 review: 'stay in lockstep' was previously enforced by
    // nothing): both this test and `audit_overflow.py --selftest` run
    // against the SAME tools/overflow_fixtures.tsv, so a heuristic
    // change updates the fixtures once and both sides re-verify.
    val path = java.nio.file.Paths.get("tools", "overflow_fixtures.tsv")
    assert(java.nio.file.Files.isRegularFile(path),
      s"$path missing — run sbt test from the repo root")
    val disagreements = scala.jdk.CollectionConverters
      .IteratorHasAsScala(java.nio.file.Files.lines(path).iterator()).asScala
      .filter(_.trim.nonEmpty)
      .flatMap { ln =>
        val Array(verdict, sql) = ln.split("\t", 2)
        val got =
          if (unwidenedScaleMultiplies(sql).nonEmpty) "FLAG" else "PASS"
        if (got != verdict) Some(s"want=$verdict got=$got: $sql") else None
      }.toSeq
    assert(disagreements.isEmpty,
      "Scala auditor disagrees with the shared fixture corpus (run " +
        "python3 tools/audit_overflow.py --selftest for the other " +
        "side):\n" + disagreements.mkString("\n"))
  }

  // ---- twin-scalability doctrine (round 18, named by two measured
  //      oracle holes) ------------------------------------------------
  //
  // The class: a twin restating a candidate-generation query's
  // quadratic DEFINITION instead of a scalable candidate set. r17's
  // DBSCAN twins (>3600 s at sf1, LIST-kernel all-pairs) and r18's
  // MinHash twins (>1200 s / 57 GB at sf10, inverted-index sum-df^2
  // join) were both this shape; both were retired by restating a
  // scalable candidate structure (grid closure / independent-family
  // banding). Two shapes are flagged — a self-equijoin of a
  // content-unnest CTE on its unnest output column, and a self-join
  // with NO cross-alias equality conjunct (pure pair expansion).
  // Deliberately-exact baselines are exempt via the SHARED ledger
  // tools/twin_scalability_exemptions.tsv (query<TAB>tier-bound
  // justification); tools/audit_twin_scalability.py is the ad-hoc twin
  // and both run the SAME tools/twin_scalability_fixtures.tsv.

  private val TwinContentUnnest =
    Pattern.compile("""\bunnest\s*\(\s*(?!\[)""",
      Pattern.CASE_INSENSITIVE)
  private val TwinLiteralUnnest =
    Pattern.compile("""\bunnest\s*\(\s*\[""", Pattern.CASE_INSENSITIVE)
  private val TwinCteHead =
    Pattern.compile("""\b(\w+)\s+AS\s+(?:MATERIALIZED\s+)?\(""",
      Pattern.CASE_INSENSITIVE)
  private val TwinSelfJoin = Pattern.compile(
    """(?<![\w.])(?!(?:FROM|WHERE|SELECT|AND|OR|ON|AS|WHEN|THEN|ELSE|BY|IN)\b)(\w+)""" +
      """(?:\s+(?!(?:LEFT|RIGHT|FULL|OUTER|INNER|CROSS|JOIN)\b)(\w+))?""" +
      """\s+(?:(?:LEFT|RIGHT|FULL|OUTER|INNER|CROSS)\s+)*JOIN\s+""" +
      """(\w+)(?:\s+(?!ON\b)(\w+))?\s+ON\s+""",
    Pattern.CASE_INSENSITIVE)
  private val TwinClauseEnd = Pattern.compile(
    """^(?:WHERE|GROUP\s+BY|QUALIFY|ORDER\s+BY|JOIN|LEFT|RIGHT|INNER|""" +
      """CROSS|UNION|WINDOW|HAVING|LIMIT|SELECT)\b""",
    Pattern.CASE_INSENSITIVE)
  private val TwinCrossEq =
    Pattern.compile("""\b(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)""")

  private def twinCteBodies(sql: String): Map[String, String] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    val m = TwinCteHead.matcher(sql)
    while (m.find()) {
      var i = m.end
      var depth = 1
      while (i < sql.length && depth > 0) {
        if (sql(i) == '(') depth += 1
        else if (sql(i) == ')') depth -= 1
        i += 1
      }
      val name = m.group(1).toLowerCase
      if (!out.contains(name)) out(name) = sql.substring(m.end, i - 1)
    }
    out.toMap
  }

  private def twinOnClause(sql: String, start: Int): String = {
    var depth = 0
    var j = start
    var done = false
    while (j < sql.length && !done) {
      val c = sql(j)
      if (c == '(') depth += 1
      else if (c == ')') {
        if (depth == 0) done = true else depth -= 1
      } else if (depth == 0 && (j == start || " \t\n\r|".contains(sql(j - 1)))
          && TwinClauseEnd.matcher(sql).region(j, sql.length).lookingAt()) {
        done = true
      }
      if (!done) j += 1
    }
    sql.substring(start, j)
  }

  /** (shape, cte, detail) per flagged self-join — the exact mirror of
    * tools/audit_twin_scalability.py's flagged_sites.
    */
  private[graft] def twinScalabilityFlags(sql: String): Seq[String] = {
    val ctes = twinCteBodies(sql)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = TwinSelfJoin.matcher(sql)
    while (m.find()) {
      if (m.group(1).equalsIgnoreCase(m.group(3))) {
        val name = m.group(1)
        val a1 = Option(m.group(2)).getOrElse(m.group(1))
        val a2 = Option(m.group(4)).getOrElse(m.group(3))
        val on = twinOnClause(sql, m.end)
        val body = ctes.getOrElse(name.toLowerCase, "")
        val eqm = TwinCrossEq.matcher(on)
        val cross = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        while (eqm.find()) {
          if (Set(eqm.group(1), eqm.group(3)) == Set(a1, a2))
            cross += ((eqm.group(2), eqm.group(4)))
        }
        if (cross.isEmpty) {
          out += s"PAIR_EXPANSION on $name (" +
            on.split("\\s+").mkString(" ").take(80) + ")"
        } else if (TwinContentUnnest.matcher(body).find() &&
            !TwinLiteralUnnest.matcher(body).find()) {
          cross.collectFirst {
            case (c1, c2) if c1 == c2 && Pattern.compile(
                """\bunnest\s*\([^)]*\)\s+AS\s+""" + Pattern.quote(c1) +
                  """\b""", Pattern.CASE_INSENSITIVE)
                .matcher(body).find() => c1
          }.foreach(c => out += s"INVERTED_ALLPAIRS on $name ($c)")
        }
      }
    }
    out.toSeq
  }

  private def twinExemptions(): Map[String, String] = {
    val path = java.nio.file.Paths.get(
      "tools", "twin_scalability_exemptions.tsv")
    assert(java.nio.file.Files.isRegularFile(path),
      s"$path missing — run sbt test from the repo root")
    scala.jdk.CollectionConverters
      .IteratorHasAsScala(java.nio.file.Files.lines(path).iterator()).asScala
      .filter(ln => ln.trim.nonEmpty && !ln.startsWith("#"))
      .map { ln =>
        val Array(q, reason) = ln.split("\t", 2)
        q -> reason
      }.toMap
  }

  test("no oracle twin restates quadratic candidate generation " +
      "unexempted (the sf10 oracle-hole class)") {
    val exempt = twinExemptions()
    val used = scala.collection.mutable.Set.empty[String]
    val violations = for {
      (qname, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      site <- twinScalabilityFlags(sql)
      if !exempt.contains(qname) || { used += qname; false }
    } yield s"$qname: $site"
    assert(violations.isEmpty,
      "quadratic candidate generation in oracle twins — restate a " +
        "scalable candidate structure (grid closure / independent-" +
        "family banding, see SimilarityQueries.bandedShingleCtes) or " +
        "add a tier-bound justification to tools/" +
        "twin_scalability_exemptions.tsv:\n" + violations.mkString("\n"))
    val stale = (exempt.keySet -- used).toSeq.sorted
    assert(stale.isEmpty,
      "STALE twin-scalability exemptions (twin no longer flags or is " +
        "not registered — remove the ledger line):\n" +
        stale.mkString("\n"))
  }

  test("the Scala twin-scalability auditor agrees with " +
      "tools/audit_twin_scalability.py on the shared fixture corpus") {
    val path = java.nio.file.Paths.get(
      "tools", "twin_scalability_fixtures.tsv")
    assert(java.nio.file.Files.isRegularFile(path),
      s"$path missing — run sbt test from the repo root")
    val disagreements = scala.jdk.CollectionConverters
      .IteratorHasAsScala(java.nio.file.Files.lines(path).iterator()).asScala
      .filter(ln => ln.trim.nonEmpty && !ln.startsWith("#"))
      .flatMap { ln =>
        val Array(verdict, sql) = ln.split("\t", 2)
        val got =
          if (twinScalabilityFlags(sql).nonEmpty) "FLAG" else "PASS"
        if (got != verdict) Some(s"want=$verdict got=$got: ${sql.take(100)}")
        else None
      }.toSeq
    assert(disagreements.isEmpty,
      "Scala twin-scalability auditor disagrees with the shared " +
        "fixtures (run python3 tools/audit_twin_scalability.py " +
        "--selftest for the other side):\n" + disagreements.mkString("\n"))
  }

  /** The sf10 ladder's sampled dbscan oracle (tools/sf10_ladder.py,
    * r19) PARSES its shared constants (eps², minPts, nProbe, minCells,
    * dim) out of the dumped sim_dbscan_bucketed twin SQL, so it cannot
    * carry its own magic literals. That coupling is only safe if the
    * anchors it greps for survive twin respells — and a respell would
    * otherwise surface as a SystemExit ten minutes into a ladder run.
    * Pin the anchors here at test time, and cross-check the two
    * values that have a public Scala definition to compare against.
    */
  test("the sampled-dbscan ladder check's constant-parse anchors hold") {
    val sql = SparkEntry.oracleSql("sim_dbscan_bucketed")
    def one(pat: String): Long = {
      val m = pat.r.findFirstMatchIn(sql)
      assert(m.isDefined,
        s"tools/sf10_ladder.py dbscan_sampled_check anchor no longer " +
          s"matches the twin SQL — update BOTH sides: $pat")
      m.get.group(1).toLong
    }
    one("""array_inner_product\(x\.av, y\.av\)\s*<=\s*(\d+)""")
    one("""n_neighbors \+ 1 >= (\d+)""")
    val nprobe =
      one("""list_sort\(list\(\{'s': s, 'i': ci\}\)\)\), 1, (\d+)\)""")
    val mincells = one("""GREATEST\((\d+), 2 \* \d+ \* CAST\(ceil""")
    one("""AS DOUBLE\[(\d+)\]""")
    assert(nprobe == graft.ops.Similarity.DbscanNProbe,
      "parsed nProbe diverged from Similarity.DbscanNProbe")
    assert(mincells == 4L * nprobe * nprobe,
      "parsed minCells diverged from the 4*nProbe^2 floor")
  }

  /** The sf10 ladder's sampled checks must leave their wall + a host-
    * speed calib IN the artifact and gate the wall against the ladder's
    * own --timeout (r20, VERDICT ask 3): r19's 53 s quiet sampled check
    * read 125 s in the driver's loaded window and the excess was only
    * visible in prose. Pin the artifact keys and the budget gate so a
    * refactor can't silently drop them.
    */
  test("sf10_ladder.py records sampled_wall_s + calib_sec and gates " +
      "the sampled wall against its own timeout") {
    val tool = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools", "sf10_ladder.py")),
      java.nio.charset.StandardCharsets.UTF_8)
    for (anchor <- Seq("\"sampled_wall_s\": sampled_wall",
        "\"calib_sec\": calib",
        "s[\"sec\"] > args.timeout"))
      assert(tool.contains(anchor),
        s"sf10_ladder.py lost its sampled-budget anchor: $anchor")
  }

  /** tools/aba_bench.py runs graft.Bench via DIRECT java and therefore
    * duplicates build.sbt's jdk17AddOpens list; a build.sbt change
    * that doesn't reach the tool produces IllegalAccessErrors only at
    * the next cross-round triage. Keep the two lists in lockstep.
    */
  test("aba_bench.py's add-opens list matches build.sbt's") {
    def pkgs(path: String): Set[String] = {
      val p = java.nio.file.Paths.get(path)
      assert(java.nio.file.Files.isRegularFile(p),
        s"$path missing — run sbt test from the repo root")
      val text = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      """java\.base/[\w.]+""".r.findAllIn(text).toSet
    }
    val sbtList = pkgs("build.sbt")
    val toolList = pkgs("tools/aba_bench.py")
    assert(sbtList == toolList,
      "build.sbt jdk17AddOpens and tools/aba_bench.py ADD_OPENS_PKGS " +
        s"diverged: only-sbt=${(sbtList -- toolList).toSeq.sorted} " +
        s"only-tool=${(toolList -- sbtList).toSeq.sorted}")
  }

  /** tools/aba_bench.py PARSES its cpu clamp out of Bench.scala (r20,
    * replacing a hardcoded 16 that would have silently survived a
    * host-regime re-measure). The parse is only safe while its anchor
    * regex matches the source AND yields the value the compiled
    * constant actually has — pin both, same pattern as the sampled-
    * dbscan anchors above.
    */
  test("aba_bench.py's PhysicalCores parse anchor matches Bench.scala " +
      "and yields Bench.PhysicalCores") {
    val tool = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools", "aba_bench.py")),
      java.nio.charset.StandardCharsets.UTF_8)
    val anchorDef =
      """PHYSICAL_CORES_ANCHOR = r"([^"]+)"""".r.findFirstMatchIn(tool)
    assert(anchorDef.isDefined,
      "tools/aba_bench.py no longer defines PHYSICAL_CORES_ANCHOR")
    val bench = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src", "main", "scala", "graft",
        "Bench.scala")), java.nio.charset.StandardCharsets.UTF_8)
    val parsed = anchorDef.get.group(1).r.findFirstMatchIn(bench)
    assert(parsed.isDefined,
      "aba_bench.py's PhysicalCores anchor no longer matches " +
        "Bench.scala — update BOTH sides")
    assert(parsed.get.group(1).toInt == Bench.PhysicalCores,
      "aba_bench.py's anchor parses a different value than the " +
        "compiled Bench.PhysicalCores")
  }

  /** Scala mirror of tools/aba_bench.py's per-query verdict rule (r20,
    * VERDICT ask 4): ok / too-noisy / regressed / missing over the
    * (new1, old, new2) phase medians. The arithmetic copies the python
    * verbatim (multiplicative threshold form — see the tool) so both
    * implementations agree bit-for-bit on the shared fixture table;
    * `python3 tools/aba_bench.py --selftest` checks the other side.
    */
  private def abaVerdict(n1: Option[Double], o: Option[Double],
      n2: Option[Double]): String = {
    val news = Seq(n1, n2).flatten
    if (news.isEmpty || o.forall(_ == 0.0) || o.isEmpty) return "missing"
    val m = news.min
    if (m <= o.get * (1.0 + 0.10)) return "ok"
    if (news.length < 2) return "too-noisy"
    val excess = m / o.get - 1.0
    val noise = math.abs(n1.get - n2.get) / m
    if (noise < excess) "regressed" else "too-noisy"
  }

  test("the Scala ABA-verdict mirror agrees with tools/aba_bench.py " +
      "on the shared fixture table") {
    val path = java.nio.file.Paths.get("tools", "aba_verdict_fixtures.tsv")
    assert(java.nio.file.Files.isRegularFile(path),
      s"$path missing — run sbt test from the repo root")
    val disagreements = scala.jdk.CollectionConverters
      .IteratorHasAsScala(java.nio.file.Files.lines(path).iterator()).asScala
      .filter(ln => ln.trim.nonEmpty && !ln.startsWith("#"))
      .flatMap { ln =>
        val Array(n1, o, n2, want) = ln.split("\t")
        def conv(v: String): Option[Double] =
          if (v == "-") None else Some(v.toDouble)
        val got = abaVerdict(conv(n1), conv(o), conv(n2))
        if (got != want) Some(s"($n1, $o, $n2): want=$want got=$got")
        else None
      }.toSeq
    assert(disagreements.isEmpty,
      "ABA verdict mirror disagrees with the shared fixtures (run " +
        "python3 tools/aba_bench.py --selftest for the other side):\n" +
        disagreements.mkString("\n"))
  }
}
