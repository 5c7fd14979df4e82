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
Exit code = number of queries with violations (0 = clean).
Dev-only tooling — not part of the Spark library.
"""
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


def main(path: str, only: str = "") -> int:
    names = set(only.split(",")) if only else None
    oracle = json.loads(Path(path).read_text())
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
    sys.exit(main(*sys.argv[1:]))
