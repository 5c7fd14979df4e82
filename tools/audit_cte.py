#!/usr/bin/env python3
"""Audit oracle twins for the DuckDB CTE-inlining hazard.

For each query SQL in a Verify dump's oracle_sql.json, find every CTE
defined WITHOUT `AS MATERIALIZED` and count how many times its name is
referenced later in the statement. A non-materialized CTE referenced
more than once is re-derived per reference (DuckDB inlines by default);
inside an unrolled iteration that expansion is exponential in rounds.
Dev-only tooling — not part of the Spark library.
"""
import json
import re
import sys
from pathlib import Path


def audit(sql: str):
    # CTE headers: name AS ( | name AS MATERIALIZED ( | name(cols) AS (
    pat = re.compile(r"\b(\w+)(?:\s*\([\w\s,]*\))?\s+AS\s+(MATERIALIZED\s+)?\(",
                     re.IGNORECASE)
    flagged = []
    for m in pat.finditer(sql):
        name, mat = m.group(1), bool(m.group(2))
        if mat:
            continue
        # references = occurrences of the bare name after its definition,
        # excluding the definition itself and column/alias hits that
        # follow a dot (qualified col) or precede AS (
        rest = sql[m.end():]
        refs = len(re.findall(rf"(?<![\w.]){re.escape(name)}\b(?!\s+AS\s)", rest))
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
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
