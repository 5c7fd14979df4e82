#!/usr/bin/env python3
"""Per-round sf1 canary — the standing 100x-scale gate (r17).

The r16 sf1 campaign (tools/make_sf1.py + a full 320-query sweep,
55:45 wall) caught two real BIGINT overflows that ten rounds of
sf0.001-sf0.1 gating could never surface. A 56-minute campaign is
one-time by design; this canary is the cheap standing version: a
fixed ~13-query subset chosen to re-walk every scale cliff the
campaign found, once per round, in roughly ten-to-fifteen minutes of
engine time:

  * analytics_pareto, analytics_decile_lift — the two queries sf1
    actually broke (cum_cents*1e6 > 2^63), now DECIMAL(38,0)-widened;
  * olap_ratio_to_parent — same class, widened preemptively at ~2x
    headroom;
  * text_bpe_fertility — the r17 auditor's token-count-sum find
    (SUM(n_subwords)*1e6), HUGEINT-widened;
  * dedup_containment — one deliberately-exact quadratic baseline
    (the cheapest of the four), so the exact-tier cost curve stays a
    measured number;
  * dedup_minhash_lsh, dedup_containment_minhash, sim_ann_ivf — one
    banded/bucketed sibling per dedup/sim family (the 100 TB paths);
  * dedup_ngram_jaccard — the strategy Auto-chooser at 10x bench
    scale (the r16 campaign verified Auto lands within run variance
    of the best strategy; this keeps that claim measured);
  * sim_dbscan_bucketed — the production DBSCAN, whose oracle twin
    became sf1-checkable in r17 (grid closure + array kernels);
  * source_bucketed_join (per-run layout write) and
    source_bucketed_agg (ensure + amortized zero-Exchange read) — the
    bucketed layout's write and steady-state costs at sf1;
  * stream_window_agg — one streaming-semantics query (also the r16
    full-map mover this round re-measured).

Usage: python3 tools/sf1_canary.py [--sf1 /tmp/sf1] [--out /tmp/sf1_canary]
                                   [--cpus 16] [--timeout 900]
Builds /tmp/sf1 via make_sf1.py when absent. Prints one line per query
(engine wall, rows, oracle verdict) plus a JSON summary line; exit
code = number of queries whose oracle compare failed. Record the
summary in ARCHITECTURE.md per round. Dev-only tooling.
"""
import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

QUERIES = [
    "analytics_pareto", "analytics_decile_lift", "olap_ratio_to_parent",
    "text_bpe_fertility", "dedup_containment", "dedup_minhash_lsh",
    "dedup_containment_minhash", "sim_ann_ivf", "dedup_ngram_jaccard",
    "sim_dbscan_bucketed", "source_bucketed_join", "source_bucketed_agg",
    "stream_window_agg",
    # r17's two-phase hash-prefilter exact-span op: 21.4s / 89,390 rows
    # at sf1 on first measure (exactly 10x the sf0.1 rows - linear)
    "dedup_repeated_spans",
    # r18: the sibling per-doc duplicated-span ppm (same linear window
    # frame) — seated after its own sf1 value-match; per-doc ppm must be
    # copy-invariant under the generator's token bijection
    "text_dup_span_fraction",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/tmp/sf1")
    ap.add_argument("--out", default="/tmp/sf1_canary")
    ap.add_argument("--cpus", default="16")
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-query DuckDB oracle budget (sec)")
    args = ap.parse_args()
    repo = Path(__file__).resolve().parent.parent

    if not (Path(args.sf1) / "lineitem.parquet").is_file():
        print(f"[canary] building {args.sf1} via make_sf1.py ...",
              flush=True)
        subprocess.run([sys.executable, str(repo / "tools/make_sf1.py"),
                        "--out", args.sf1], check=True)

    t0 = time.time()
    proc = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {args.sf1} {args.out} {','.join(QUERIES)}"],
        cwd=repo, env={**__import__('os').environ,
                       "SPARK_GRAFT_CPUS": args.cpus},
        capture_output=True, text=True)
    engine_wall = time.time() - t0
    walls = dict(re.findall(r"\[verify\] (\w+) ok ([0-9.]+)s",
                            proc.stderr + proc.stdout))
    failed = re.findall(r"\[verify\] (\w+) failed", proc.stderr + proc.stdout)
    if failed:
        print(f"[canary] ENGINE FAILURES: {failed}")

    oracle = subprocess.run(
        [sys.executable, str(repo / "tools/check_oracle.py"), args.sf1,
         args.out, ",".join(QUERIES), str(args.timeout)],
        cwd=repo, capture_output=True, text=True)
    ok = set(re.findall(r"^OK\s+(\w+):", oracle.stdout, re.M))
    rows = dict(re.findall(r"^OK\s+(\w+): (\d+) rows", oracle.stdout, re.M))

    bad = 0
    for q in QUERIES:
        verdict = "OK" if q in ok else "FAIL"
        if q not in ok:
            bad += 1
        print(f"{verdict:4s} {q:28s} engine={walls.get(q, '?'):>7s}s "
              f"rows={rows.get(q, '?')}")
    summary = {
        "canary": "sf1", "queries": len(QUERIES), "oracle_ok": len(ok),
        "engine_wall_sec": round(engine_wall, 1),
        "per_query_sec": {q: float(walls[q]) for q in walls},
    }
    print(json.dumps(summary, sort_keys=True))
    if bad:
        print(oracle.stdout[-3000:])
    sys.exit(bad)


if __name__ == "__main__":
    main()
