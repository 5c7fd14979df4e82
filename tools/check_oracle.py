#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/, runs the
matching SQL from oracle_sql.json in DuckDB over the sf parquet tables and
compares values exactly (columns sorted by name, rows in file order).
Dev-only tooling — not part of the Spark library.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir: str, out_dir: str, only: str = "") -> int:
    names = set(only.split(",")) if only else None
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = 0
    for name, sql in sorted(oracle.items()):
        if names is not None and name not in names:
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            failures += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            failures += 1
            continue
        g, w = got[gc], want[wc]
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        # exact value compare, row order as produced (both sides ORDER BY)
        mismatch = None
        for c in gc:
            gv, wv = g[c].tolist(), w[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                if a != b and not (a != a and b != b):  # NaN==NaN ok
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duck={b!r}")
            failures += 1
            continue
        # dtype KIND seam: the driver's hash canonicalization distinguishes
        # 1 (int64) from 1.0 (float64) even when values compare equal —
        # round 1's stream_sessionize failed exactly this way (DuckDB
        # windowed SUM → HUGEINT → pandas float64 vs Spark int64). int32 vs
        # int64 is fine (same kind); int vs float is not.
        kind_mismatch = [
            (c, g[c].dtype, w[c].dtype) for c in gc
            if g[c].dtype.kind != w[c].dtype.kind]
        if kind_mismatch:
            c, gd, wd = kind_mismatch[0]
            print(f"FAIL {name}: col {c} dtype kind spark={gd} duck={wd}"
                  " (values equal; driver hash would differ)")
            failures += 1
        else:
            print(f"OK   {name}: {len(g)} rows x {len(gc)} cols")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], *sys.argv[3:4]))
