#!/usr/bin/env python3
"""Integer-overflow auditor for scale-constant multiplies (r17).

The class (named by MEASUREMENT, not review: the r16 sf1 campaign's
only two real failures): an unbounded SUM/cumulative magnitude —
revenue cents summed over the fact table, a cumulative window over
those sums — multiplied by a ppm/percent scale constant in BIGINT.
`cum_cents * 1000000` was green at sf0.001–sf0.1 for ten rounds and
overflowed 2^63 at sf1 (cum_cents ~2.3e13 × 1e6 ≈ 2.3e19); 100 TB is
another ~10^4 beyond that. The fix routes the multiply through
DECIMAL(38,0) on the Spark side and HUGEINT in the DuckDB twin
(exact integer floor division either way, identical values wherever
the narrow spelling didn't overflow).

This auditor makes the class fail review instead of a future scale
factor, the same treatment the CTE-materialization and float-seam
classes got. It scans BOTH surfaces the class lives on:

  * triple-quoted SQL literals (the DuckDB twins), and
  * expr("...") strings (the Spark engine spellings),

for multiplicative chains that contain an integer literal >= 1000
AND an unbounded-magnitude factor, where no factor of the chain is
widened via CAST(.. AS DECIMAL(38,0)) / CAST(.. AS HUGEINT) and the
chain is not floating (a DOUBLE-cast factor or a float literal makes
the arithmetic overflow-free — precision there is the float-seam
doctrine's beat, not this one's).

"Unbounded magnitude" is a NAME heuristic, deliberately conservative
the same way the CTE check is: a factor counts if it contains a
non-indicator SUM( call, or an identifier whose last path segment
looks like a summed magnitude (ends in _c/_mc/_cents, or carries a
cum/total/sum/rev/spend/sales stem). Three documented exemptions:

  * avg/mean/max/min/stddev-stemmed identifiers — per-row-bounded
    statistics don't grow with the corpus;
  * list_*/array_* calls — per-ROW collection folds, bounded by one
    row's payload, not the corpus;
  * factors that ARE a length (optionally CAST-wrapped): a
    length/len/bit_length is bounded by one VALUE's width — 64 for
    bin(BIGINT) (the log2 kernel's bit-length × 10^6), a row's
    payload for text — never by the corpus;
  * ROW-COUNT magnitudes — COUNT(...) and the 0/1 indicator spelling
    SUM(CASE WHEN … THEN 1 ELSE 0 END) — but ONLY under scale
    constants <= 10^6: 2^63 / 10^6 ≈ 9.2e12 rows is ~9x a 100 TB
    row count, while summed CENTS are ~400x a row count (avg item
    ~3.6e5 cents) and measured the actual sf1 overflow. A row count
    under a larger constant is flagged like everything else.

A factor containing the widening cast anywhere (not only as its
outermost node) counts as widened — HUGEINT/DECIMAL(38,0) propagates
through DuckDB/Spark integer division, so
`(CAST(x AS HUGEINT) * 1000 // y) * 1000000` is safe end-to-end.
A flagged site is either widened or renamed/restructured to say why
it's bounded; there is no waiver comment on purpose.

The Scala twin of this check lives in GateHygieneSpec (with
bad-fixture proofs) and runs over every REGISTERED oracle string, so
programmatically-built twins are covered; this script is the ad-hoc
file sweep.

KNOWN REACH LIMIT: Column-DSL arithmetic (`(col(a) - col(b)) *
1000000L`) is invisible to both implementations — the r17 sweep
adjudicated every such site by hand (one live find: the Theil-Sen
slope scaling, widened; the rest are double-context, tiny constants,
or driver-local small-graph operators whose scaladocs bound the
input). New scale multiplies should prefer expr("...") strings,
which this auditor sees.

Usage: python3 tools/audit_overflow.py [--selftest] [files...]
  [files...]  Scala query files to audit (default:
              src/main/scala/graft/queries/*.scala, resolved from the
              repo root — run from there)
  --selftest  check this implementation against the SHARED fixture
              corpus tools/overflow_fixtures.tsv (verdict<TAB>sql per
              line) — the same file GateHygieneSpec runs its Scala
              mirror against, which is what actually keeps the two
              implementations in lockstep: a heuristic change updates
              the fixtures once and both sides re-verify
Exit code = number of flagged sites / fixture disagreements (0 =
clean). Dev-only tooling — not part of the Spark library.
"""
import re
import sys
from pathlib import Path

TRIPLE = re.compile(r'"""(.*?)"""', re.DOTALL)
EXPRLIT = re.compile(r'expr\(\s*"((?:[^"\\]|\\.)*)"')
# integer scale constant >= 1000 (4+ digits), optional Scala L suffix,
# not part of a float literal or a longer word
LIT = re.compile(r"(?<![\w.$])(\d{4,})(?:L\b)?(?![\w.])")

MAGNITUDE = re.compile(
    r"(?i)(?:^|_)(cum\w*|total\w*|sum\w*|rev|revenue|spend\w*|sales|"
    r"cents\w*)(?:_|$)|_(?:c|mc|cents)$|^grand")
BOUNDED = re.compile(
    r"(?i)(?:^|_)(avg|mean|max|min|med|p\d+|stddev)(?:_|$)|^(list|array)_")
INDICATOR_SUM = re.compile(
    r"(?is)\bSUM\s*\(\s*CASE\s+WHEN\b.*?\bTHEN\s+1\s+ELSE\s+0\s+END\s*\)")
WIDENED = re.compile(
    r"(?is)\bAS\s+(?:DECIMAL\s*\(\s*38\s*,\s*0\s*\)|HUGEINT)\s*\)")
FLOATING = re.compile(r"(?is)\bAS\s+(?:DOUBLE|FLOAT|REAL)\s*\)\s*$|\d\.\d")
COUNT_SCALE_MAX = 1_000_000


def _skip_ws(s: str, i: int, step: int) -> int:
    while 0 <= i < len(s) and s[i] in " \t\n\r|":
        i += step
    return i


def _factor_left(s: str, i: int):
    """Factor ending at s[i] (inclusive scan leftward). Returns (start,
    text) or None."""
    i = _skip_ws(s, i, -1)
    if i < 0:
        return None
    if s[i] == ")":
        depth = 1
        j = i - 1
        while j >= 0 and depth:
            if s[j] == ")":
                depth += 1
            elif s[j] == "(":
                depth -= 1
            j -= 1
        if depth:
            return None
        # optional function name before '('
        k = j
        while k >= 0 and (s[k].isalnum() or s[k] in "_.$"):
            k -= 1
        return (k + 1, s[k + 1:i + 1])
    if s[i].isalnum() or s[i] in "_.$":
        k = i
        while k >= 0 and (s[k].isalnum() or s[k] in "_.$"):
            k -= 1
        return (k + 1, s[k + 1:i + 1])
    return None


def _factor_right(s: str, i: int):
    """Factor starting at s[i] (scan rightward). Returns (end, text) or
    None."""
    i = _skip_ws(s, i, 1)
    if i >= len(s):
        return None
    if s[i].isalnum() or s[i] in "_.$":
        k = i
        while k < len(s) and (s[k].isalnum() or s[k] in "_.$"):
            k += 1
        # function call: swallow the balanced parens
        j = _skip_ws(s, k, 1)
        if j < len(s) and s[j] == "(" and s[i - 1:i] != ".":
            depth = 1
            j += 1
            while j < len(s) and depth:
                if s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                return None
            return (j, s[i:j])
        return (k, s[i:k])
    if s[i] == "(":
        depth = 1
        j = i + 1
        while j < len(s) and depth:
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
            j += 1
        if depth:
            return None
        return (j, s[i:j])
    return None


def chain_around(s: str, lit_start: int, lit_end: int):
    """All factor texts in the maximal multiplicative chain containing
    the literal at s[lit_start:lit_end]."""
    factors = []
    # walk left: ... factor * factor * LIT
    i = _skip_ws(s, lit_start - 1, -1)
    while i >= 0 and s[i] == "*":
        # '**'? not SQL; guard anyway
        f = _factor_left(s, i - 1)
        if f is None:
            break
        start, text = f
        factors.append(text)
        i = _skip_ws(s, start - 1, -1)
    # walk right: LIT * factor * factor ...
    i = _skip_ws(s, lit_end, 1)
    while i < len(s) and s[i] == "*":
        f = _factor_right(s, i + 1)
        if f is None:
            break
        end, text = f
        factors.append(text)
        i = _skip_ws(s, end, 1)
    return factors


def ident_segments(factor: str):
    """Last path segments of every identifier in the factor text."""
    for m in re.finditer(r"[A-Za-z_][\w.$]*", factor):
        yield m.group(0).split(".")[-1]


LENGTH_FACTOR = re.compile(
    r"(?is)^\s*(?:CAST\s*\(\s*)?(?:bit_|octet_)?len(?:gth)?\s*\(")


def is_unbounded(factor: str, lit: int) -> bool:
    # a value-width (length) factor is per-value bounded
    if LENGTH_FACTOR.match(factor):
        return False
    # non-indicator SUM: an aggregate that grows with the corpus
    stripped = INDICATOR_SUM.sub(" ", factor)
    if re.search(r"(?i)\bSUM\s*\(", stripped):
        return True
    # row-count class: exempt under the documented <= 1e6 headroom
    if re.search(r"(?i)\bCOUNT\s*\(", factor) or \
            INDICATOR_SUM.search(factor):
        return lit > COUNT_SCALE_MAX
    segs = [s for s in ident_segments(factor)
            if not re.match(r"(?i)^(sum|count|cast|coalesce|case|when"
                            r"|then|else|end|greatest|least)$", s)]
    if any(BOUNDED.search(s) for s in segs):
        return False
    return any(MAGNITUDE.search(s) for s in segs)


def flagged_chains(s: str):
    """Flagged (literal, chain-factors) sites in one SQL/expr string."""
    out = []
    for m in LIT.finditer(s):
        lit = int(m.group(1))
        factors = chain_around(s, m.start(), m.end())
        if not factors:
            continue
        if any(WIDENED.search(f) for f in factors):
            continue
        if any(FLOATING.search(f) for f in factors):
            continue
        hot = [f for f in factors if is_unbounded(f, lit)]
        if hot:
            out.append((m.group(1), [" ".join(f.split()) for f in hot]))
    return out


def audit_file(path: Path):
    text = path.read_text()
    sites = []
    for pat in (TRIPLE, EXPRLIT):
        for m in pat.finditer(text):
            body = m.group(1)
            line = text[:m.start()].count("\n") + 1
            for lit, hot in flagged_chains(body):
                sites.append((path.name, line, lit, hot))
    return sites


def selftest() -> int:
    fixtures = Path(__file__).resolve().parent / "overflow_fixtures.tsv"
    bad = 0
    for ln in fixtures.read_text().splitlines():
        if not ln.strip():
            continue
        verdict, sql = ln.split("\t", 1)
        got = "FLAG" if flagged_chains(sql) else "PASS"
        if got != verdict:
            bad += 1
            print(f"DISAGREE want={verdict} got={got}: {sql}")
    print(f"-- selftest: {bad} disagreement(s) over shared fixtures")
    return bad


def main():
    args = sys.argv[1:]
    if args and args[0] in ("-h", "--help"):
        sys.exit(__doc__)
    if args and args[0] == "--selftest":
        sys.exit(selftest())
    files = [Path(a) for a in args] if args else sorted(
        Path("src/main/scala/graft/queries").glob("*.scala"))
    if not files:
        sys.exit("error: no input files — run from the repo root or pass "
                 "Scala query files explicitly")
    total = 0
    for f in files:
        if not f.is_file():
            sys.exit(f"error: {f} is not a file")
        for name, line, lit, hot in audit_file(f):
            total += 1
            print(f"{name}:{line}: *{lit} over unbounded factor(s): "
                  f"{'; '.join(h[:70] for h in hot)}")
    print(f"-- {total} flagged site(s)")
    sys.exit(min(total, 125))


if __name__ == "__main__":
    main()
