#!/usr/bin/env python3
"""DECIMAL→DOUBLE cast determinism auditor/fixer for the oracle twins.

DuckDB (1.0.0) casts DECIMAL to DOUBLE by converting the unscaled
int128 to double and dividing by 10^scale — TWO roundings. When the
exact value needs more significand than a double holds and sits on a
rounding boundary, the result is one ulp away from the correctly
rounded double (observed: 7096786968835.8685 → ...f7a instead of
...f79 — analytics_regression's syy at sf0.001). Spark's
Decimal→Double goes through BigDecimal.doubleValue(), which IS
correctly rounded, so the gate's bit compare flips on exactly those
values: a latent per-SF coin toss across every twin that casts a
DECIMAL aggregate to DOUBLE.

The fix routes the twin's cast through text — CAST(CAST(x AS STRING)
AS DOUBLE) — because decimal→string is exact and string→double
(strtod) is correctly rounded in both engines. `STRING` (not VARCHAR)
because the one SHARED statement (q14_correlated runs the same text in
Spark and DuckDB) must parse in both dialects; for Spark the hop is a
no-op by value (its direct cast is already correctly rounded).

Scans triple-quoted SQL literals in the query files for
CAST(<expr containing DECIMAL(> AS DOUBLE) spans missing the hop.

Usage: python3 tools/fix_decimal_double_casts.py [--fix] [files...]
  [files...]  Scala query files whose triple-quoted SQL literals to
              audit (default: src/main/scala/graft/queries/*.scala,
              resolved from the repo root — run from there)
  --fix       rewrite unhopped DECIMAL→DOUBLE casts in place (the
              ROUND class is report-only; review each flag)
Exit code (without --fix) = number of flagged sites. Dev-only tooling.
"""
import argparse
import re
import sys
from pathlib import Path

TRIPLE = re.compile(r'"""(.*?)"""', re.DOTALL)


def cast_spans(text: str):
    """(start, end, inner) for every CAST( ... ) span, outermost-first."""
    out = []
    for m in re.finditer(r"(?i)\bCAST\s*\(", text):
        i = m.end()  # just past '('
        depth = 1
        j = i
        while j < len(text) and depth:
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
            j += 1
        if depth == 0:
            out.append((m.start(), j, text[i:j - 1]))
    return out


def is_whole_string_cast(expr: str) -> bool:
    """True iff expr is, in whole, one CAST( ... AS STRING) — the leading
    CAST's paren must close at the very end. A mere trailing
    'AS STRING)' (e.g. `SUM(dec_expr) + CAST(y AS STRING)`) is NOT a
    hop: the decimal seam beside it is still live."""
    e = expr.rstrip()
    m = re.match(r"(?is)\s*CAST\s*\(", e)
    if not m or not re.search(r"(?is)\bAS\s+STRING\s*\)\s*$", e):
        return False
    depth, i = 1, m.end()
    while i < len(e) and depth > 0:
        if e[i] == "(":
            depth += 1
        elif e[i] == ")":
            depth -= 1
        i += 1
    return depth == 0 and i == len(e)


def needs_hop(inner: str) -> bool:
    body = inner.rstrip()
    m = re.search(r"(?is)\bAS\s+DOUBLE\s*$", body)
    if not m:
        return False
    expr = body[:m.start()].rstrip()
    if not re.search(r"(?i)\bDECIMAL\s*\(", expr):
        return False  # not decimal-typed by spelling — out of scope
    if is_whole_string_cast(expr):
        return False  # already hopped
    if re.match(r"(?is)\s*ROUND\s*\(", expr) and \
            re.search(r"(?i)DECIMAL\s*\(38,\s*18\s*\)", expr):
        # the Spark-parity ROUND respell: its result is a small-scale
        # decimal whose significand fits a double exactly — the outer
        # cast is single-rounding-safe by construction
        return False
    return True


def hop(inner: str) -> str:
    body = inner.rstrip()
    m = re.search(r"(?is)\bAS\s+DOUBLE\s*$", body)
    expr = body[:m.start()].rstrip(" \t")
    return f"CAST({expr} AS STRING) AS DOUBLE"


def first_top_level_arg(s: str) -> str:
    depth = 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            return s[:i]
    return s


def round_hazards(content: str):
    """ROUND(x, n) spans whose argument is not the Spark-parity respell.

    Spark's ROUND on DOUBLE rounds the SHORTEST DECIMAL REPRESENTATION
    half-up (BigDecimal via Double.toString); DuckDB's round(double)
    scales-and-rounds the binary value — they disagree on values whose
    shortest representation ends in 5 but whose binary value sits below
    the boundary (1.005 → Spark 1.01, DuckDB 1.00: measured, round 15).
    The twin spelling that reproduces Spark in DuckDB is
      CAST(ROUND(CAST(CAST(x AS STRING) AS DECIMAL(38,18)), 2) AS DOUBLE)
    (shortest double→text in both engines, exact text→decimal, decimal
    ROUND is half-away-from-zero in both; valid for |x| < 1e20). A
    ROUND over a genuinely DECIMAL-typed argument is exact and may be
    left bare — review any flag before respelling.

    Scale-0 rounds (ROUND(x) / ROUND(x, 0) — the cents/quantize
    spellings all over the twins) are EXEMPT: the scale-0 half boundary
    N.5 is exactly representable in binary for |N| < 2^52, so the
    shortest representation ends in .5 IFF the binary value IS the
    boundary — both engines then see the same tie and both break it
    away from zero. The repr-vs-binary seam only opens at scale ≥ 1,
    where x.xx5 is not exactly representable.
    """
    out = []
    for m in re.finditer(r"(?i)\bROUND\s*\(", content):
        i = m.end()
        depth = 1
        j = i
        while j < len(content) and depth:
            if content[j] == "(":
                depth += 1
            elif content[j] == ")":
                depth -= 1
            j += 1
        if depth:
            continue
        inner = content[i:j - 1]
        first_arg = first_top_level_arg(inner).rstrip()
        rest = inner[len(first_arg):].lstrip(" ,\n|\t")
        scale = rest.split(")")[0].strip() if rest else ""
        if scale in ("", "0"):
            continue  # scale-0: the N.5 boundary is exact — no seam
        if re.search(r"(?is)AS\s+STRING\s*\)\s*AS\s+DECIMAL\s*\(38,\s*18\s*\)\s*\)\s*$",
                     first_arg):
            continue  # already the Spark-parity respell
        out.append((m.start(), " ".join(inner.split())[:90]))
    return out


def process(path: Path, fix: bool) -> int:
    src = path.read_text()
    hits = 0
    offset_shift = 0
    new_src = src
    for lit in TRIPLE.finditer(src):
        content = lit.group(1)
        # report-only class: ROUND over a non-respelled argument (no
        # autofix — a ROUND over a true DECIMAL is exact and may stay
        # bare; every flag needs a human eye)
        if not fix:
            for start, snippet in round_hazards(content):
                line = (content[:start].count("\n") +
                        src[:lit.start(1)].count("\n") + 1)
                print(f"{path}:{line}: ROUND without the Spark-parity "
                      f"respell (review): {snippet}")
                hits += 1
        spans = [s for s in cast_spans(content) if needs_hop(s[2])]
        if not spans:
            continue
        # rewrite right-to-left so offsets stay valid; skip spans nested
        # inside an already-selected outer span
        chosen = []
        for s in spans:
            if not any(o[0] <= s[0] and s[1] <= o[1] and o != s for o in spans):
                chosen.append(s)
        hits += len(chosen)
        if fix:
            new_content = content
            for start, end, inner in sorted(chosen, reverse=True):
                new_content = (new_content[:start] + "CAST(" + hop(inner) +
                               ")" + new_content[end:])
            lit_start = lit.start(1) + offset_shift
            lit_end = lit.end(1) + offset_shift
            new_src = new_src[:lit_start] + new_content + new_src[lit_end:]
            offset_shift += len(new_content) - len(content)
        else:
            for start, _end, inner in chosen:
                line = content[:start].count("\n") + src[:lit.start(1)].count("\n") + 1
                print(f"{path}:{line}: unhopped DECIMAL→DOUBLE cast: "
                      f"{' '.join(inner.split())[:90]}")
    if fix and hits:
        path.write_text(new_src)
        print(f"{path}: rewrote {hits} cast(s)")
    return hits


def main(argv):
    ap = argparse.ArgumentParser(
        description="Audit (or --fix) the two cross-engine float seams "
                    "in oracle-twin SQL: raw CAST(<decimal expr> AS "
                    "DOUBLE) double-rounding, and ROUND(double, n>=1) "
                    "repr-vs-binary divergence (report-only). Exit code "
                    "without --fix = flagged site count.")
    ap.add_argument("--fix", action="store_true",
                    help="rewrite unhopped DECIMAL→DOUBLE casts in place")
    ap.add_argument("files", nargs="*", type=Path,
                    help="Scala files to scan (default: "
                         "src/main/scala/graft/queries/*.scala)")
    args = ap.parse_args(argv)
    files = args.files
    if not files:
        default_glob = Path("src/main/scala/graft/queries")
        files = sorted(default_glob.glob("*.scala"))
        if not files:
            sys.exit(f"error: no Scala files under {default_glob}/ — run "
                     f"from the repo root or pass files explicitly")
    missing = [p for p in files if not p.is_file()]
    if missing:
        sys.exit("error: not a file: " +
                 ", ".join(str(p) for p in missing) +
                 " — expected Scala query files holding triple-quoted SQL")
    total = sum(process(p, args.fix) for p in files)
    print(f"-- {total} {'rewritten' if args.fix else 'flagged'} "
          f"float-seam site(s)")
    return 0 if args.fix else total


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
