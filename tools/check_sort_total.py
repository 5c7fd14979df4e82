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
ORDER BY of its oracle SQL and verify no sort-key group holds more than
one DISTINCT full row. Every query lands in exactly one class:

  OK             bare result-column keys, checked over the result parquet
  OK (expr)      expression keys whose identifiers are all result
                 columns, evaluated over the result parquet
  OK (resplice)  sort keys not in the result: the keys are spliced into
                 the twin's outermost SELECT list and the twin re-run
                 with its ORDER BY/LIMIT intact (needs <sfDir> tables)
  SKIP-OK        single-row result — any order is trivially total
  FLAG           tie groups with divergent rows (the gate hazard)
  SKIP-UNVERIFIED neither verifiable nor provably single-row — counts
                 toward the exit code like a FLAG (round 15: the silent
                 "sort cols not in result" class hid exactly the
                 etl_sample-style hazard this tool exists to catch)

Usage: python3 tools/check_sort_total.py <sfDir> <verifyOutDir> [only]
Exit code = flagged + unverified. Dev-only tooling.
"""
import json
import re
import sys
from pathlib import Path

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# Reviewed queries whose produced order is total WITHOUT a trailing
# ORDER BY — each entry carries the reason it is sound; anything not
# listed here stays SKIP-UNVERIFIED (loud, counted). Keep this SHORT.
REVIEWED_ORDER_BY_CONSTRUCTION = {
    "etl_full_clean":
        "narrow per-row transform over ONE parquet file in both engines "
        "(no shuffle, no sort): produced order IS the file's row order, "
        "identical by construction; pinned by the cleaner golden "
        "round-trip spec and green at sf0.001/0.01/0.1 since round 2",
}

# words that appear inside ORDER BY expressions but are never column refs
_EXPR_KEYWORDS = {
    "ASC", "DESC", "NULLS", "FIRST", "LAST", "CAST", "AS", "AND", "OR",
    "NOT", "NULL", "IS", "CASE", "WHEN", "THEN", "ELSE", "END", "IN",
    "LIKE", "BETWEEN", "DIV", "TRUE", "FALSE", "BIGINT", "INTEGER",
    "INT", "DOUBLE", "FLOAT", "VARCHAR", "DECIMAL", "BOOLEAN", "DATE",
    "TIMESTAMP", "INTERVAL", "COLLATE",
}


def trailing_order_items(sql: str):
    """Raw expression items of the statement's final ORDER BY, or None."""
    idx = sql.upper().rfind("ORDER BY")
    if idx < 0:
        return None
    tail = sql[idx + len("ORDER BY"):]
    # the trailing clause may be followed only by LIMIT/OFFSET
    tail = re.split(r"(?i)\bLIMIT\b|\bOFFSET\b", tail)[0]
    # a final ORDER BY inside a parenthesized subquery is not trailing
    if ")" in tail and tail.count(")") > tail.count("("):
        return None
    return [re.sub(r"(?i)\b(ASC|DESC|NULLS\s+(FIRST|LAST))\b", "", item).strip()
            for item in split_top_level(tail, ",")]


def split_top_level(s: str, sep: str):
    """Split on sep at paren depth 0, respecting quotes."""
    parts, depth, cur, i = [], 0, [], 0
    while i < len(s):
        c = s[i]
        if c in "'\"":
            q = c
            cur.append(c)
            i += 1
            while i < len(s):
                cur.append(s[i])
                if s[i] == q:
                    i += 1
                    break
                i += 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def identifiers(expr: str):
    """Bare column-ref candidates in expr (identifiers not followed by
    '(' and not SQL keywords/literals)."""
    ids = set()
    for m in re.finditer(r"[A-Za-z_]\w*", expr):
        word = m.group(0)
        rest = expr[m.end():].lstrip()
        if rest.startswith("("):
            continue  # function call
        if word.upper() in _EXPR_KEYWORDS:
            continue
        ids.add(word)
    return ids


def splice_sort_keys(sql: str, items):
    """Append the sort expressions to the OUTERMOST SELECT list so the
    twin re-runs with its keys projected (ORDER BY/LIMIT intact — the
    row set, including any limit boundary, is preserved). Returns the
    spliced SQL or None when the shape defeats a textual splice
    (SELECT DISTINCT, or no top-level SELECT...FROM found)."""
    # locate top-level SELECT and its matching FROM, outside quotes/parens
    depth, i, select_pos, from_pos = 0, 0, None, None
    up = sql.upper()
    while i < len(sql):
        c = sql[i]
        if c in "'\"":
            q = c
            i += 1
            while i < len(sql) and sql[i] != q:
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and up.startswith("SELECT", i) and \
                (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")) and \
                not (sql[i + 6: i + 7].isalnum() or sql[i + 6: i + 7] == "_"):
            select_pos = i  # keep LAST top-level SELECT (after WITH chain)
            from_pos = None
        elif depth == 0 and select_pos is not None and from_pos is None and \
                up.startswith("FROM", i) and \
                not (sql[i - 1].isalnum() or sql[i - 1] == "_") and \
                not (sql[i + 4: i + 5].isalnum() or sql[i + 4: i + 5] == "_"):
            from_pos = i
        i += 1
    if select_pos is None or from_pos is None:
        return None
    head = sql[select_pos:from_pos]
    if re.match(r"(?is)SELECT\s+DISTINCT\b", head):
        return None  # extra columns would change the dedup semantics
    extra = ", ".join(f"({item}) AS __sk{j}" for j, item in enumerate(items))
    return sql[:from_pos] + ", " + extra + " " + sql[from_pos:]


def main(sf_dir: str, out_dir: str, only: str = "") -> int:
    names = set(only.split(",")) if only else None
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    flagged, unverified, ok, skip_ok = 0, 0, 0, 0

    def result_cols(res_dir):
        rel = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet') LIMIT 0")
        return [d[0] for d in rel.description]

    def n_rows(res_dir):
        return con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{res_dir}/*.parquet')"
        ).fetchone()[0]

    def tie_groups(src: str, key_exprs, row_cols):
        keys = ", ".join(f"({k})" for k in key_exprs)
        row = "(" + ", ".join(f'"{c}"' for c in row_cols) + ")"
        positions = ", ".join(str(j + 1) for j in range(len(key_exprs)))
        return con.execute(
            f"SELECT COUNT(*) FROM ("
            f"  SELECT {keys} FROM {src}"
            f"  GROUP BY {positions} HAVING COUNT(DISTINCT {row}) > 1)"
        ).fetchone()[0]

    for name, sql in sorted(oracle.items()):
        if names is not None and name not in names:
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            continue
        items = trailing_order_items(sql)
        allcols = result_cols(res_dir)
        parquet_src = f"read_parquet('{res_dir}/*.parquet')"

        if items is None:
            if n_rows(res_dir) <= 1:
                skip_ok += 1
                print(f"SKIP-OK {name}: no trailing ORDER BY, single-row result")
            elif name in REVIEWED_ORDER_BY_CONSTRUCTION:
                skip_ok += 1
                print(f"SKIP-REVIEWED {name}: "
                      f"{REVIEWED_ORDER_BY_CONSTRUCTION[name]}")
            else:
                unverified += 1
                print(f"SKIP-UNVERIFIED {name}: multi-row result with no "
                      f"trailing ORDER BY — produced order is engine-defined")
            continue

        # positional ORDER BY (ORDER BY 1, 2) refers to output columns
        items = [allcols[int(it) - 1]
                 if re.fullmatch(r"\d+", it) and 0 < int(it) <= len(allcols)
                 else it
                 for it in items]

        bare = [it.split(".")[-1].strip() for it in items]
        if all(re.fullmatch(r"[A-Za-z_]\w*", b) for b in bare) and \
                all(b in allcols for b in bare):
            n = tie_groups(parquet_src, [f'"{b}"' for b in bare], allcols)
            if n:
                flagged += 1
                print(f"FLAG {name}: {n} sort-key groups with divergent rows "
                      f"(key: {', '.join(bare)})")
            else:
                ok += 1
            continue

        # expression keys fully expressible over the result columns
        if all(identifiers(it) <= set(allcols) for it in items):
            try:
                n = tie_groups(parquet_src, items, allcols)
            except Exception as e:
                n = None
                print(f"SKIP-UNVERIFIED {name}: expression keys failed over "
                      f"the result: {e}")
                unverified += 1
            if n is not None:
                if n:
                    flagged += 1
                    print(f"FLAG {name}: {n} sort-key groups with divergent "
                          f"rows (expr keys: {', '.join(items)})")
                else:
                    ok += 1
                    print(f"OK {name} (expr keys over result)")
            continue

        # sort keys reference columns the projection dropped: re-run the
        # twin with the keys spliced into the outermost SELECT list
        spliced = splice_sort_keys(sql, items)
        n = None
        if spliced is not None:
            try:
                sks = [f"__sk{j}" for j in range(len(items))]
                row = "(" + ", ".join(f'"{c}"' for c in allcols) + ")"
                n = con.execute(
                    f"SELECT COUNT(*) FROM ("
                    f"  SELECT {', '.join(sks)} FROM ({spliced})"
                    f"  GROUP BY ALL HAVING COUNT(DISTINCT {row}) > 1)"
                ).fetchone()[0]
            except Exception:
                n = None  # malformed splice (union/group-by shapes) — fall back
        if n is not None:
            if n:
                flagged += 1
                print(f"FLAG {name}: {n} sort-key groups with divergent rows "
                      f"(respliced twin; keys: {', '.join(items)})")
            else:
                ok += 1
                print(f"OK {name} (respliced twin)")
        elif n_rows(res_dir) <= 1:
            skip_ok += 1
            print(f"SKIP-OK {name}: dropped sort cols but single-row result")
        else:
            unverified += 1
            print(f"SKIP-UNVERIFIED {name}: multi-row, sort keys not in "
                  f"result and twin resplice failed — verify by hand")

    print(f"-- {flagged} flagged, {unverified} unverified, {ok} verified, "
          f"{skip_ok} single-row")
    return flagged + unverified


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
