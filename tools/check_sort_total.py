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
  <sfDir>         a testdata scale-factor dir (e.g. /root/testdata/sf0.01)
                  holding the <table>.parquet inputs — the resplice path
                  re-runs twins against these tables
  <verifyOutDir>  the output directory of a `graft.Verify` run: one
                  result-parquet subdir per query plus oracle_sql.json
  [only]          comma-separated query names to restrict the check
Exit code = flagged + unverified. Dev-only tooling.
"""
import argparse
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
    """(items, limit) of the statement's final ORDER BY, or None.
    `limit` is the trailing LIMIT's row count when present, else None."""
    idx = sql.upper().rfind("ORDER BY")
    if idx < 0:
        return None
    tail = sql[idx + len("ORDER BY"):]
    # paren-balance check BEFORE stripping LIMIT: a nested
    # '... ORDER BY a LIMIT 3) t ...' must not be mistaken for a
    # trailing clause (splitting at LIMIT first would remove the
    # unmatched ')' this check exists to see)
    if ")" in tail and tail.count(")") > tail.count("("):
        return None
    m = re.search(r"(?i)\bLIMIT\s+(\d+)", tail)
    limit = int(m.group(1)) if m else None
    tail = re.split(r"(?i)\bLIMIT\b|\bOFFSET\b", tail)[0]
    items, dirs = [], []
    for item in split_top_level(tail, ","):
        suffix = " ".join(m.group(0) for m in re.finditer(
            r"(?i)\b(ASC|DESC|NULLS\s+(FIRST|LAST))\b", item))
        items.append(re.sub(
            r"(?i)\b(ASC|DESC|NULLS\s+(FIRST|LAST))\b", "", item).strip())
        dirs.append(suffix.upper())
    return items, dirs, limit


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


def boundary_hazard(con, sql, items, dirs, limit, row_cols):
    """For a trailing ORDER BY ... LIMIT k: re-run the respliced twin
    WITHOUT the limit and test whether the tie group containing the
    k-th row straddles the cut with >1 distinct full row — the one
    hazard the post-limit result parquet cannot show (the two engines
    may legitimately return different members at the boundary).
    Returns True (hazard) / False (clean) / None (shape defeats the
    check — caller reports it loudly)."""
    spliced = splice_sort_keys(sql, items)
    if spliced is None:
        return None
    sans = re.sub(r"(?is)\bLIMIT\s+\d+(\s+OFFSET\s+\d+)?\s*$", "", spliced)
    if sans == spliced:
        return None  # the LIMIT is not the statement's trailing clause
    order = ", ".join(f"__sk{j} {d}".strip() for j, d in enumerate(dirs))
    keys = ", ".join(f"__sk{j}" for j in range(len(items)))
    row = "(" + ", ".join(f'"{c}"' for c in row_cols) + ")"
    key_eq = " AND ".join(
        f"r.__sk{j} IS NOT DISTINCT FROM b.__sk{j}"
        for j in range(len(items)))
    try:
        out = con.execute(
            f"WITH __ranked AS ("
            f"  SELECT *, ROW_NUMBER() OVER (ORDER BY {order}) AS __rn"
            f"  FROM ({sans})"
            f"), __b AS (SELECT {keys} FROM __ranked WHERE __rn = {limit}) "
            f"SELECT COALESCE(MAX(r.__rn) > {limit}, FALSE)"
            f"       AND COUNT(DISTINCT {row}) > 1 "
            f"FROM __ranked r, __b b WHERE {key_eq}"
        ).fetchone()[0]
        return bool(out)
    except Exception:
        return None


def main(sf_dir: str, out_dir: str, only: str = "") -> int:
    names = set(only.split(",")) if only else None
    oracle_path = Path(out_dir) / "oracle_sql.json"
    if not oracle_path.is_file():
        sys.exit(f"error: {oracle_path} not found — <verifyOutDir> must be "
                 f"the output directory of a `graft.Verify` run (one result "
                 f"subdir per query plus oracle_sql.json)")
    try:
        oracle = json.loads(oracle_path.read_text())
    except json.JSONDecodeError as e:
        sys.exit(f"error: {oracle_path} is not JSON ({e.msg} at line "
                 f"{e.lineno}) — expected the Verify dump's oracle_sql.json")
    con = duckdb.connect()
    mounted = 0
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
            mounted += 1
    if mounted == 0:
        sys.exit(f"error: no <table>.parquet found under {sf_dir} — <sfDir> "
                 f"must be a testdata scale-factor dir such as "
                 f"/root/testdata/sf0.01 (the resplice path re-runs twins "
                 f"against these tables)")
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
        parsed = trailing_order_items(sql)
        allcols = result_cols(res_dir)
        parquet_src = f"read_parquet('{res_dir}/*.parquet')"

        if parsed is None:
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

        items, dirs, limit = parsed
        # positional ORDER BY (ORDER BY 1, 2) refers to output columns
        items = [allcols[int(it) - 1]
                 if re.fullmatch(r"\d+", it) and 0 < int(it) <= len(allcols)
                 else it
                 for it in items]

        # interior check: tie groups WITHIN the produced rows
        interior = None  # tie-group count, or None = unverifiable
        how = ""
        bare = [it.split(".")[-1].strip() for it in items]
        if all(re.fullmatch(r"[A-Za-z_]\w*", b) for b in bare) and \
                all(b in allcols for b in bare):
            interior = tie_groups(parquet_src, [f'"{b}"' for b in bare], allcols)
            how = f"key: {', '.join(bare)}"
        elif all(identifiers(it) <= set(allcols) for it in items):
            try:
                interior = tie_groups(parquet_src, items, allcols)
                how = f"expr keys over result: {', '.join(items)}"
            except Exception as e:
                how = f"expression keys failed over the result: {e}"
        if interior is None and not how.startswith("expression keys failed"):
            # sort keys reference columns the projection dropped: re-run
            # the twin with the keys spliced into the outermost SELECT
            spliced = splice_sort_keys(sql, items)
            if spliced is not None:
                try:
                    sks = [f"__sk{j}" for j in range(len(items))]
                    row = "(" + ", ".join(f'"{c}"' for c in allcols) + ")"
                    interior = con.execute(
                        f"SELECT COUNT(*) FROM ("
                        f"  SELECT {', '.join(sks)} FROM ({spliced})"
                        f"  GROUP BY ALL HAVING COUNT(DISTINCT {row}) > 1)"
                    ).fetchone()[0]
                    how = f"respliced twin; keys: {', '.join(items)}"
                except Exception:
                    interior = None  # malformed splice — fall through

        if interior is None:
            if n_rows(res_dir) <= 1:
                skip_ok += 1
                print(f"SKIP-OK {name}: unverifiable sort keys but "
                      f"single-row result")
            else:
                unverified += 1
                print(f"SKIP-UNVERIFIED {name}: multi-row and sort keys "
                      f"not verifiable ({how or 'twin resplice failed'}) — "
                      f"verify by hand")
            continue
        if interior:
            flagged += 1
            print(f"FLAG {name}: {interior} sort-key groups with divergent "
                  f"rows ({how})")
            continue

        # boundary check: a trailing LIMIT can cut THROUGH a pre-limit
        # tie group, in which case the engines may return different
        # members even though the produced rows show no interior tie —
        # invisible to every post-limit check above
        if limit is not None:
            hz = boundary_hazard(con, sql, items, dirs, limit, allcols)
            if hz is True:
                flagged += 1
                print(f"FLAG {name}: the pre-limit tie group at the LIMIT "
                      f"{limit} boundary straddles the cut with divergent "
                      f"rows")
                continue
            if hz is None:
                unverified += 1
                print(f"SKIP-UNVERIFIED {name}: interior ties clean but the "
                      f"LIMIT {limit} boundary could not be re-checked "
                      f"against the twin")
                continue
            ok += 1
            print(f"OK {name} ({how}; limit-{limit} boundary clean)")
            continue
        ok += 1
        if not how.startswith("key:"):
            print(f"OK {name} ({how})")

    print(f"-- {flagged} flagged, {unverified} unverified, {ok} verified, "
          f"{skip_ok} single-row")
    return flagged + unverified


if __name__ == "__main__":
    ap = argparse.ArgumentParser(
        description="Verify every gate query's trailing ORDER BY is "
                    "content-total (no tie group holds two distinct "
                    "rows). Exit code = flagged + unverified.")
    ap.add_argument("sf_dir", metavar="sfDir",
                    help="testdata scale-factor dir holding the "
                         "<table>.parquet inputs (e.g. /root/testdata/sf0.01)")
    ap.add_argument("out_dir", metavar="verifyOutDir",
                    help="graft.Verify output dir: per-query result "
                         "parquet subdirs + oracle_sql.json")
    ap.add_argument("only", nargs="?", default="",
                    help="comma-separated query names to check "
                         "(default: all)")
    args = ap.parse_args()
    sys.exit(main(args.sf_dir, args.out_dir, args.only))
