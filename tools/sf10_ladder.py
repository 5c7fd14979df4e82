#!/usr/bin/env python3
"""Standing sf10 ladder — the 1000x-of-gate scale point (r18).

Companion to tools/sf1_canary.py one rung up: builds /tmp/sf10 by
chaining make_sf1.py over /tmp/sf1 (10 copies of 10 copies of sf0.1 —
60 M lineitem / 500 k docs / 200 k embeddings, ~2.4 GB parquet), runs
the scale-path subset through graft.Verify at local[32], then
value-checks against DuckDB under a 1200 s/query budget.

The subset is every sf1-canary member whose 1000x point is provable:
the two fixed overflow queries (cum_cents*1e6 ~ 2.3e20 here — 25x past
2^63), the preemptive widening, fertility, the banded dedup/sim
siblings (whose twins became sf10-checkable in r18 via the banded
respell — see the PORTING.md twin-scalability doctrine), both span
operators (replica-linearity at 1000x: rows must be exactly 100x the
sf0.1 counts), the bucketed-layout gates, and one streaming query.
NOT here: the exact-tier pair (containment/jaccard — hours at sf10 by
design) and sim_dbscan_bucketed's ORACLE (the assign prefix alone is
~1e9 dots DuckDB-side; its ENGINE run is included).

The r18 runs that created this tool caught one real bug each way:
the first run's dedup_repeated_spans row count (2.46 M vs the linear
893,900) exposed the chained-build copy_tag clone bug, and the r17
minhash oracle timeouts this tool's budget would have flagged are the
holes the banded twins closed. Linearity EXPECTATIONS are asserted for
the four queries where the replica construction pins them exactly.

Usage: python3 tools/sf10_ladder.py [--sf1 /tmp/sf1] [--sf10 /tmp/sf10]
                                    [--out /tmp/sf10_out] [--cpus 16]
                                    [--timeout 1200]
Exit code = engine failures + oracle mismatches + linearity breaks.
Dev-only tooling.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

ENGINE_QUERIES = [
    "analytics_pareto", "analytics_decile_lift", "olap_ratio_to_parent",
    "text_bpe_fertility", "dedup_minhash_lsh", "dedup_containment_minhash",
    "sim_ann_ivf", "sim_dbscan_bucketed", "source_bucketed_join",
    "source_bucketed_agg", "stream_window_agg", "dedup_repeated_spans",
    "text_dup_span_fraction",
]
# sim_dbscan_bucketed: engine-only (oracle's assign prefix ~1e9 dots)
ORACLE_SKIP = {"sim_dbscan_bucketed"}
# rows must be EXACTLY 100x the sf0.1 value (replica linearity)
LINEAR_ROWS = {
    "dedup_minhash_lsh": 25600,          # 100 x 256
    "dedup_containment_minhash": 51200,  # 100 x 512
    "dedup_repeated_spans": 893900,      # 100 x 8,939
    "text_dup_span_fraction": 500000,    # one per doc
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/tmp/sf1")
    ap.add_argument("--sf10", default="/tmp/sf10")
    ap.add_argument("--out", default="/tmp/sf10_out")
    # 16, not 32: the VM's 32 vCPUs are 16 physical cores (HT hidden
    # from the guest — lscpu reports 1 thread/core), and 32-thread runs
    # inflate iterative operators 2-3.4x (ARCHITECTURE.md item 24). The
    # committed bench regime is 16; matching it keeps per-query ladder
    # walls comparable to bench_full walls.
    ap.add_argument("--cpus", default="16")
    ap.add_argument("--timeout", type=int, default=1200)
    args = ap.parse_args()
    repo = Path(__file__).resolve().parent.parent

    if not (Path(args.sf1) / "lineitem.parquet").is_file():
        print(f"[ladder] building {args.sf1} via make_sf1.py ...", flush=True)
        subprocess.run([sys.executable, str(repo / "tools/make_sf1.py"),
                        "--out", args.sf1], check=True)
    if not (Path(args.sf10) / "lineitem.parquet").is_file():
        print(f"[ladder] building {args.sf10} (10 copies of {args.sf1}) ...",
              flush=True)
        subprocess.run([sys.executable, str(repo / "tools/make_sf1.py"),
                        "--src", args.sf1, "--out", args.sf10], check=True)

    t0 = time.time()
    proc = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {args.sf10} {args.out} "
         f"{','.join(ENGINE_QUERIES)}"],
        cwd=repo, env={**os.environ, "SPARK_GRAFT_CPUS": args.cpus},
        capture_output=True, text=True)
    engine_wall = time.time() - t0
    blob = proc.stderr + proc.stdout
    walls = dict(re.findall(r"\[verify\] (\w+) ok ([0-9.]+)s", blob))
    failed = re.findall(r"\[verify\] (\w+) failed", blob)
    if failed:
        print(f"[ladder] ENGINE FAILURES: {failed}")

    checked = [q for q in ENGINE_QUERIES if q not in ORACLE_SKIP]
    oracle = subprocess.run(
        [sys.executable, str(repo / "tools/check_oracle.py"), args.sf10,
         args.out, ",".join(checked), str(args.timeout)],
        cwd=repo, capture_output=True, text=True)
    ok = set(re.findall(r"^OK\s+(\w+):", oracle.stdout, re.M))
    rows = {q: int(n) for q, n in
            re.findall(r"^OK\s+(\w+): (\d+) rows", oracle.stdout, re.M)}

    bad = len(failed)
    for q in ENGINE_QUERIES:
        if q in ORACLE_SKIP:
            verdict = "ENG " if q in walls else "FAIL"
        else:
            verdict = "OK  " if q in ok else "FAIL"
        if verdict == "FAIL":
            bad += 1
        lin = ""
        if q in LINEAR_ROWS and q in rows:
            if rows[q] == LINEAR_ROWS[q]:
                lin = " linear-ok"
            else:
                lin = f" LINEARITY-BREAK (want {LINEAR_ROWS[q]})"
                bad += 1
        print(f"{verdict} {q:28s} engine={walls.get(q, '?'):>7s}s "
              f"rows={rows.get(q, '?')}{lin}")
    summary = {
        "ladder": "sf10", "queries": len(ENGINE_QUERIES),
        "oracle_ok": len(ok), "oracle_attempted": len(checked),
        "engine_wall_sec": round(engine_wall, 1),
        "per_query_sec": {q: float(w) for q, w in walls.items()},
    }
    print(json.dumps(summary, sort_keys=True))
    if bad:
        print(oracle.stdout[-3000:])
    sys.exit(min(bad, 125))


if __name__ == "__main__":
    main()
