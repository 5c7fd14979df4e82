#!/usr/bin/env python3
"""Audit oracle twins for the DuckDB CTE-inlining hazard.

For each query SQL in a Verify dump's oracle_sql.json, find every CTE
defined WITHOUT `AS MATERIALIZED` and count how many times its name is
referenced later in the statement. A non-materialized CTE referenced
more than once is re-derived per reference (DuckDB inlines by default);
inside an unrolled iteration that expansion is exponential in rounds
(measured gate-killers: graph_eigenvector 21 GB, graph_ktruss 57 GB,
text_bpe_* 2.6 GB / 30 s each — all sub-second materialized).

SELF-REFERENCING CTEs (recursive members) are skipped: they cannot be
materialized, and DuckDB executes them iteratively anyway. The Scala
twin of this check lives in GateHygieneSpec — the doctrine is enforced
at test time, this script is for ad-hoc sweeps.

Usage: python3 tools/audit_cte.py <oracle_sql.json> [only]
  <oracle_sql.json>  the oracle dump a `graft.Verify` run writes
                     (<outDir>/oracle_sql.json); a dump DIRECTORY is
                     accepted and resolved to the file inside it
  [only]             comma-separated query names to restrict the audit
Exit code = number of queries with violations (0 = clean).
Dev-only tooling — not part of the Spark library.
"""
import argparse
import json
import re
import sys
from pathlib import Path

CTE_PAT = re.compile(
    r"\b(\w+)(?:\s*\([\w\s,]*\))?\s+AS\s+(MATERIALIZED\s+)?\(", re.IGNORECASE)


def cte_body(sql: str, start: int) -> str:
    """Return the parenthesized body starting at sql[start] == after '('."""
    depth, i = 1, start
    while depth and i < len(sql):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
        i += 1
    return sql[start:i - 1]


def audit(sql: str):
    flagged = []
    for m in CTE_PAT.finditer(sql):
        name, mat = m.group(1), bool(m.group(2))
        if mat:
            continue
        body = cte_body(sql, m.end())
        # recursive member: references itself — cannot be materialized
        if re.search(rf"(?:FROM|JOIN)\s+{re.escape(name)}\b", body, re.I):
            continue
        rest = sql[m.end():]
        # exclude DEFINITION sites only (`name AS (`): `FROM name AS
        # alias` is a real reference and must count, or aliased
        # self-joins under-flag (the GateHygieneSpec contract)
        refs = len(re.findall(
            rf"(?<![\w.]){re.escape(name)}\b(?!\s+AS\s+(?:MATERIALIZED\s+)?\()",
            rest, re.I))
        if refs >= 2:
            flagged.append((name, refs))
    return flagged


def load_oracle(path_arg: str) -> dict:
    """Resolve and parse the Verify oracle dump, failing with a usage-
    grade message (not a traceback) on every misuse observed in the
    wild: a directory, a missing file, non-JSON, or JSON of the wrong
    shape."""
    path = Path(path_arg)
    if path.is_dir():  # accept the dump dir itself
        path = path / "oracle_sql.json"
    if not path.is_file():
        sys.exit(f"error: {path} not found — expected the oracle_sql.json "
                 f"a `graft.Verify` run writes into its output directory "
                 f"(or that directory itself)")
    try:
        oracle = json.loads(path.read_text())
    except json.JSONDecodeError as e:
        sys.exit(f"error: {path} is not JSON ({e.msg} at line {e.lineno}) — "
                 f"expected the Verify dump's oracle_sql.json")
    if not (isinstance(oracle, dict)
            and all(isinstance(v, str) for v in oracle.values())):
        sys.exit(f"error: {path} is not a {{query_name: sql}} object — "
                 f"expected the Verify dump's oracle_sql.json")
    return oracle


def main(path: str, only: str = "") -> int:
    names = set(only.split(",")) if only else None
    oracle = load_oracle(path)
    bad = 0
    for qname, sql in sorted(oracle.items()):
        if names is not None and qname not in names:
            continue
        hits = audit(sql)
        if hits:
            bad += 1
            print(f"{qname}: " + ", ".join(f"{n} x{r}" for n, r in hits))
    print(f"-- {bad} queries with multiply-referenced unmaterialized CTEs")
    return bad


if __name__ == "__main__":
    ap = argparse.ArgumentParser(
        description="Audit oracle twins for the DuckDB CTE-inlining "
                    "hazard (multiply-referenced CTEs missing AS "
                    "MATERIALIZED). Exit code = flagged query count.")
    ap.add_argument("oracle_json",
                    help="oracle_sql.json written by a graft.Verify run "
                         "(or the Verify output directory containing it)")
    ap.add_argument("only", nargs="?", default="",
                    help="comma-separated query names to audit "
                         "(default: all)")
    args = ap.parse_args()
    sys.exit(main(args.oracle_json, args.only))
