#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [only] [timeoutSec]

For each query result parquet under <verifyOutDir>/<name>/, runs the
matching SQL from oracle_sql.json in DuckDB over the sf parquet tables and
compares values exactly (columns sorted by name, rows in file order).

Hardened against single-query pathology (round 13: an unmaterialized
round-CTE twin hung DuckDB for 21 CPU-minutes and reduced the round's
entire correctness artifact to `{}`):
  - every OK/FAIL line carries wall-clock seconds and current peak RSS;
  - a per-query watchdog calls connection.interrupt() after timeoutSec
    (default 120), records `FAIL <name>: oracle timeout` and CONTINUES;
  - results are written INCREMENTALLY to <verifyOutDir>/check_results.json
    after every query, so even a hard kill leaves a partial artifact
    naming the last query started (status "started") instead of nothing.

Dev-only tooling — not part of the Spark library.
"""
import json
import resource
import sys
import threading
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def rss_mb() -> int:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


def main(sf_dir: str, out_dir: str, only: str = "", timeout: str = "120") -> int:
    names = set(only.split(",")) if only else None
    timeout_s = float(timeout)
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results: dict = {}
    results_path = Path(out_dir) / "check_results.json"

    def flush():
        results_path.write_text(json.dumps(results, indent=0))

    def run_with_timeout(sql):
        """Run sql; on watchdog expiry interrupt the connection and raise."""
        timer = threading.Timer(timeout_s, con.interrupt)
        timer.start()
        try:
            return con.execute(sql).fetchdf()
        finally:
            timer.cancel()
            # absorb a late interrupt: the timer can fire in the race
            # window after fetchdf() returns but before cancel(), which
            # would poison the shared connection and kill the NEXT
            # query's unguarded execute — swallow it on a no-op here
            try:
                con.execute("SELECT 1")
            except duckdb.InterruptException:
                pass

    failures = 0

    # a requested name absent from the dump must FAIL loudly, not be
    # silently skipped (r20: a Verify crash left a STALE oracle_sql.json
    # in a reused outDir and the new queries simply vanished from the
    # check — "not attempted" read as green in the ladder table)
    if names:
        for name in sorted(names - set(oracle)):
            failures += 1
            print(f"FAIL {name}: not in oracle_sql.json (stale dump from "
                  "a previous run, or the query has no oracle twin)",
                  flush=True)
            results[name] = {"status": "FAIL",
                             "reason": "not in oracle_sql.json"}
            flush()

    def fail(name, msg, t0):
        nonlocal failures
        failures += 1
        dt = time.time() - t0
        print(f"FAIL {name}: {msg}  [{dt:.1f}s rss={rss_mb()}MB]", flush=True)
        results[name] = {"status": "FAIL", "reason": msg, "sec": round(dt, 2)}
        flush()

    for name, sql in sorted(oracle.items()):
        if names is not None and name not in names:
            continue
        t0 = time.time()
        # mark started BEFORE running: a hard kill mid-query still names
        # the offender in the partial artifact
        results[name] = {"status": "started"}
        flush()
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            fail(name, "no spark result dir", t0)
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
        except Exception as e:
            fail(name, f"spark result read error: {e}", t0)
            continue
        try:
            want = run_with_timeout(sql)
        except duckdb.InterruptException:
            fail(name, f"oracle timeout after {timeout_s:.0f}s (interrupted)", t0)
            continue
        except Exception as e:
            fail(name, f"oracle sql error: {e}", t0)
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            fail(name, f"columns {gc} != {wc}", t0)
            continue
        g, w = got[gc], want[wc]
        if len(g) != len(w):
            fail(name, f"rows {len(g)} != {len(w)}", t0)
            continue
        # exact value compare, row order as produced (both sides ORDER BY)
        mismatch = None
        for c in gc:
            # vectorized fast path (r20): Series.equals is NaN==NaN-true
            # and C-speed; it returns False on a dtype difference (e.g.
            # int32 vs int64), in which case the python loop below still
            # does the value-level compare. Object (string) columns stay
            # on the loop: equals() treats None and NaN as equivalent
            # there, which the loop (correctly) flags. Needed since the
            # sf10 ladder grew per-event outputs (10M rows x 5 cols was
            # ~60 s of python-loop per query; this path is ~1 s).
            if g[c].dtype.kind != "O" and g[c].equals(w[c]):
                continue
            gv, wv = g[c].tolist(), w[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                if a != b and not (a != a and b != b):  # NaN==NaN ok
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            fail(name, f"col {c} row {i}: spark={a!r} duck={b!r}", t0)
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
            fail(name, f"col {c} dtype kind spark={gd} duck={wd}"
                 " (values equal; driver hash would differ)", t0)
        else:
            dt = time.time() - t0
            print(f"OK   {name}: {len(g)} rows x {len(gc)} cols"
                  f"  [{dt:.1f}s rss={rss_mb()}MB]", flush=True)
            results[name] = {"status": "OK", "rows": len(g),
                             "sec": round(dt, 2)}
            flush()
    n_ok = sum(1 for r in results.values() if r.get("status") == "OK")
    print(f"-- {n_ok} OK, {failures} FAIL, peak rss {rss_mb()}MB", flush=True)
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    if len(args) < 2 or args[0] in ("-h", "--help"):
        usage = next(
            l for l in __doc__.splitlines() if l.startswith("Usage:"))
        print(f"{usage}\n\nexpects <sfDir> with the driver parquet tables "
              "and <verifyOutDir> from graft.Verify (holding "
              "oracle_sql.json + one parquet dir per query); [only] is a "
              "comma-separated query-name filter, [timeoutSec] the "
              "per-query DuckDB watchdog (default 120).",
              file=sys.stderr)
        sys.exit(0 if args and args[0] in ("-h", "--help") else 2)
    sys.exit(main(args[0], args[1], *args[2:4]))
