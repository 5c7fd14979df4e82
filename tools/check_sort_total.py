#!/usr/bin/env python3
"""Gate-sort totality check.

The driver's compare is row-by-row in produced order, so a gate query's
trailing ORDER BY must be CONTENT-TOTAL: rows that tie on the sort key
must be identical in every output column, or the two engines are free
to interleave them differently and the gate flips on engine/version
changes (round 14: materializing etl_minmax_scale's twin CTEs changed
DuckDB's tie order under a non-unique (l_orderkey, l_linenumber) sort
and failed the value compare).

For each query result parquet in a Verify dump, parse the trailing
ORDER BY of its oracle SQL, then flag sort-key groups holding more than
one DISTINCT full row. Queries whose trailing ORDER BY uses expressions
that aren't bare result columns are reported as SKIP (eyeball those).

Usage: python3 tools/check_sort_total.py <verifyOutDir> [only]
Exit code = number of flagged queries. Dev-only tooling.
"""
import json
import re
import sys
from pathlib import Path

import duckdb


def trailing_order_cols(sql: str):
    """Columns of the statement's final ORDER BY, or None."""
    idx = sql.upper().rfind("ORDER BY")
    if idx < 0:
        return None
    tail = sql[idx + len("ORDER BY"):]
    # the trailing clause may be followed only by LIMIT/OFFSET
    tail = re.split(r"(?i)\bLIMIT\b|\bOFFSET\b", tail)[0]
    # a final ORDER BY inside a parenthesized subquery is not trailing
    if ")" in tail:
        return None
    cols = []
    for item in tail.split(","):
        item = re.sub(r"(?i)\b(ASC|DESC|NULLS\s+(FIRST|LAST))\b", "", item).strip()
        # strip one level of qualification (li.l_orderkey -> l_orderkey)
        item = item.split(".")[-1].strip()
        if not re.fullmatch(r"[A-Za-z_]\w*", item):
            return "EXPR"
        cols.append(item)
    return cols


def main(out_dir: str, only: str = "") -> int:
    names = set(only.split(",")) if only else None
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    flagged = 0
    skipped = []
    for name, sql in sorted(oracle.items()):
        if names is not None and name not in names:
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            continue
        cols = trailing_order_cols(sql)
        if cols is None or cols == "EXPR":
            skipped.append((name, "no trailing ORDER BY" if cols is None
                            else "expression sort key"))
            continue
        rel = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet') LIMIT 0")
        allcols = [d[0] for d in rel.description]
        missing = [c for c in cols if c not in allcols]
        if missing:
            skipped.append((name, f"sort cols not in result: {missing}"))
            continue
        key = ", ".join(f'"{c}"' for c in cols)
        row = "(" + ", ".join(f'"{c}"' for c in allcols) + ")"
        n = con.execute(
            f"SELECT COUNT(*) FROM ("
            f"  SELECT {key} FROM read_parquet('{res_dir}/*.parquet')"
            f"  GROUP BY {key} HAVING COUNT(DISTINCT {row}) > 1)"
        ).fetchone()[0]
        if n:
            flagged += 1
            print(f"FLAG {name}: {n} sort-key groups with divergent rows "
                  f"(key: {', '.join(cols)})")
    for name, why in skipped:
        print(f"SKIP {name}: {why}")
    print(f"-- {flagged} flagged, {len(skipped)} skipped")
    return flagged


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
