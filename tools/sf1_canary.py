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

Exact-tier cadence (r19, VERDICT ask 4): the two deliberately-exact
quadratic members (dedup_ngram_jaccard ~300 s + dedup_containment
~240 s at sf1) re-certify an UNCHANGED exact tier and were ~85% of the
canary's ~650 s wall every round. They now run on a tool-enforced
cadence, not prose: every EXACT_TIER_EVERY-th canary run, OR whenever
the fingerprint of the exact-tier execution path + corpus
generator (EXACT_TIER_SOURCES) differs from the one recorded at the
last exact-tier run, OR on --exact-tier=always
(--exact-tier=skip forces a skip for window debugging; a skip still
advances the ledger's run counter, so explicit skips cannot push the
next automatic exact-tier run further out).
State lives in tools/canary_ledger.json (committed). When the exact
tier runs, the qualifying-Jaccard FLOOR is asserted from the actual
pair list — min over pairs at or above the 0.7 MinHash gate threshold
must stay >= 0.8 (the exact query's own 0.5-threshold tail is
legitimate non-qualifying output and is ignored): the banded twins'
~2e-16 both-families-miss recall budget rests on the corpus-measured
min qualifying J of 0.818, so corpus drift toward the 0.7 threshold
now fails the canary instead of silently eroding the margin.

Usage: python3 tools/sf1_canary.py [--sf1 /tmp/sf1] [--out /tmp/sf1_canary]
                                   [--cpus 16] [--timeout 900]
                                   [--exact-tier auto|always|skip]
Builds /tmp/sf1 via make_sf1.py when absent. Prints one line per query
(engine wall, rows, oracle verdict) plus a JSON summary line; exit
code = number of queries whose oracle compare failed. Record the
summary in ARCHITECTURE.md per round. Dev-only tooling.
"""
import argparse
import hashlib
import json
import re
import subprocess
import sys
import time
from pathlib import Path

QUERIES = [
    "analytics_pareto", "analytics_decile_lift", "olap_ratio_to_parent",
    "text_bpe_fertility", "dedup_minhash_lsh",
    "dedup_containment_minhash", "sim_ann_ivf",
    "sim_dbscan_bucketed", "source_bucketed_join", "source_bucketed_agg",
    "stream_window_agg",
    # r17's two-phase hash-prefilter exact-span op: 21.4s / 89,390 rows
    # at sf1 on first measure (exactly 10x the sf0.1 rows - linear)
    "dedup_repeated_spans",
    # r18: the sibling per-doc duplicated-span ppm (same linear window
    # frame) — seated after its own sf1 value-match; per-doc ppm must be
    # copy-invariant under the generator's token bijection
    "text_dup_span_fraction",
    # r19: one ITERATIVE graph member — the family is the most
    # regime-sensitive (the HT over-parallelization artifact read
    # kcore 2.80 s at 32 cpus vs 1.22 at 16) and was previously only
    # re-proven at sf1 when a campaign touched it
    "graph_kcore",
    # r19: one real byte-arithmetic media decoder, so the multimodal
    # family's mapPartitions path has a standing 100x point too
    "multimodal_png_decode",
    # r20: one stream + one olap seat (VERDICT ask 5) — the families'
    # every-round 100x points; both also hold sf10 ladder rows now
    "stream_sessionize", "olap_topk_per_group",
    # r20: the exact tier's SAMPLED siblings (VERDICT ask 2) run EVERY
    # round at ~1/20 the full quadratic pair's cost — same tokenizer/
    # shingle/measure substrate, value-checked via full twins; the
    # full exact tier keeps re-certifying the AND+POPCNT kernel and
    # the qualifying-Jaccard floor on its cadence below
    "dedup_jaccard_sampled", "dedup_containment_sampled",
    # r20: the embedding sibling, same contract (the exact cosine
    # parent is sf1-certified separately; its twin is the ledgered
    # 45 s exemption)
    "dedup_embedding_cosine_sampled",
]
# The deliberately-exact quadratic pair (cadence-gated, see docstring):
# dedup_ngram_jaccard doubles as the strategy-AUTO check at 10x bench
# scale, dedup_containment as the cheapest exact-tier cost-curve point.
EXACT_TIER = ["dedup_ngram_jaccard", "dedup_containment"]
EXACT_TIER_EVERY = 3  # run the exact tier every Nth canary run
# files whose diff forces an exact-tier run regardless of cadence:
# the exact-tier execution path (Dedup + the TextQueries twins) AND
# the corpus generator — the Jaccard floor is a property of the
# GENERATED corpus, so a make_sf1.py change must re-prove it even
# when the engine code is untouched (r19 itself changed the token
# tags; the floor is bijection-invariant, but only measurement says
# the next generator change is)
EXACT_TIER_SOURCES = [
    "src/main/scala/graft/ops/Dedup.scala",
    # r20 (ADVICE): the exact path TOKENIZES via TextOps.tokens
    # (Dedup.scala:139) and the twins' DuckToks must stay in lockstep
    # with it, so a tokenizer change must force re-certification too
    "src/main/scala/graft/ops/TextOps.scala",
    "src/main/scala/graft/queries/TextQueries.scala",
    "tools/make_sf1.py",
]
# QUALIFYING means >= the MinHash gate threshold 0.7 (the banded
# twins' recall budget is about pairs they must FIND); the exact
# query's own output threshold is lower (0.5), and pairs in [0.5,
# 0.7) are legitimate non-qualifying output the floor must ignore
MINHASH_QUALIFYING_THRESHOLD = 0.7
MIN_QUALIFYING_JACCARD = 0.8


def exact_tier_fingerprint(repo: Path) -> str:
    h = hashlib.sha256()
    for f in EXACT_TIER_SOURCES:
        h.update((repo / f).read_bytes())
    return h.hexdigest()[:16]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/tmp/sf1")
    ap.add_argument("--out", default="/tmp/sf1_canary")
    ap.add_argument("--cpus", default="16")
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-query DuckDB oracle budget (sec)")
    ap.add_argument("--exact-tier", choices=["auto", "always", "skip"],
                    default="auto")
    args = ap.parse_args()
    repo = Path(__file__).resolve().parent.parent

    ledger_path = repo / "tools/canary_ledger.json"
    ledger = (json.loads(ledger_path.read_text())
              if ledger_path.is_file()
              else {"runs_since_exact": 0, "exact_fingerprint": ""})
    fp = exact_tier_fingerprint(repo)
    fp_changed = fp != ledger.get("exact_fingerprint")
    cadence_due = ledger.get("runs_since_exact", 0) + 1 >= EXACT_TIER_EVERY
    if args.exact_tier == "always":
        run_exact, why = True, "--exact-tier=always"
    elif args.exact_tier == "skip":
        run_exact, why = False, "--exact-tier=skip"
    elif fp_changed:
        run_exact, why = True, ("exact-tier source fingerprint changed "
                                f"({ledger.get('exact_fingerprint') or 'none'}"
                                f" -> {fp})")
    elif cadence_due:
        run_exact, why = True, (f"cadence due (run "
                                f"{ledger.get('runs_since_exact', 0) + 1}"
                                f"/{EXACT_TIER_EVERY} since last exact)")
    else:
        run_exact, why = False, (f"cadence not due (run "
                                 f"{ledger.get('runs_since_exact', 0) + 1}"
                                 f"/{EXACT_TIER_EVERY} since last exact)")
    queries = QUERIES + (EXACT_TIER if run_exact else [])
    print(f"[canary] exact tier {'RUNS' if run_exact else 'skipped'}: {why}",
          flush=True)

    if not (Path(args.sf1) / "lineitem.parquet").is_file():
        print(f"[canary] building {args.sf1} via make_sf1.py ...",
              flush=True)
        subprocess.run([sys.executable, str(repo / "tools/make_sf1.py"),
                        "--out", args.sf1], check=True)

    t0 = time.time()
    proc = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {args.sf1} {args.out} {','.join(queries)}"],
        cwd=repo, env={**__import__('os').environ,
                       "SPARK_GRAFT_CPUS": args.cpus,
                       # headroom over the gate-SF 8g default: the r20
                       # sf10 ladder lost queries to cumulative session
                       # heap pressure when its subset grew; the canary
                       # grew 17 -> 21+2 the same round (see the ladder
                       # for the mechanism — per-query System.gc() in
                       # Verify is the main fix, this is belt)
                       "SPARK_DRIVER_MEM": __import__('os').environ.get(
                           "SPARK_DRIVER_MEM", "16g")},
        capture_output=True, text=True)
    engine_wall = time.time() - t0
    walls = dict(re.findall(r"\[verify\] (\w+) ok ([0-9.]+)s",
                            proc.stderr + proc.stdout))
    failed = re.findall(r"\[verify\] (\w+) failed", proc.stderr + proc.stdout)
    if failed:
        print(f"[canary] ENGINE FAILURES: {failed}")

    oracle = subprocess.run(
        [sys.executable, str(repo / "tools/check_oracle.py"), args.sf1,
         args.out, ",".join(queries), str(args.timeout)],
        cwd=repo, capture_output=True, text=True)
    ok = set(re.findall(r"^OK\s+(\w+):", oracle.stdout, re.M))
    rows = dict(re.findall(r"^OK\s+(\w+): (\d+) rows", oracle.stdout, re.M))

    bad = 0
    for q in queries:
        verdict = "OK" if q in ok else "FAIL"
        if q not in ok:
            bad += 1
        print(f"{verdict:4s} {q:28s} engine={walls.get(q, '?'):>7s}s "
              f"rows={rows.get(q, '?')}")

    # qualifying-Jaccard floor (only provable when the exact pair list
    # was just produced; see module docstring)
    min_j = None
    if run_exact and "dedup_ngram_jaccard" in ok:
        import duckdb
        min_j = duckdb.sql(
            "SELECT min(jaccard) FROM "
            f"read_parquet('{args.out}/dedup_ngram_jaccard/*.parquet') "
            f"WHERE jaccard >= {MINHASH_QUALIFYING_THRESHOLD}"
        ).fetchone()[0]
        if min_j is None or min_j < MIN_QUALIFYING_JACCARD:
            bad += 1
            print(f"FAIL min qualifying jaccard {min_j} < "
                  f"{MIN_QUALIFYING_JACCARD} — the banded twins' recall "
                  "budget no longer holds (SimilarityQueries banded CTEs)")
        else:
            print(f"OK   min qualifying jaccard {min_j:.4f} >= "
                  f"{MIN_QUALIFYING_JACCARD}")

    # ledger: reset the cadence only on a GREEN exact-tier run; any
    # other run (including --exact-tier=skip) advances the counter
    exact_green = run_exact and all(q in ok for q in EXACT_TIER) and (
        min_j is not None and min_j >= MIN_QUALIFYING_JACCARD)
    if exact_green:
        ledger = {"runs_since_exact": 0, "exact_fingerprint": fp,
                  "last_exact_min_jaccard": round(min_j, 6),
                  "last_exact_utc": time.strftime(
                      "%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    else:
        ledger["runs_since_exact"] = ledger.get("runs_since_exact", 0) + 1
    ledger_path.write_text(json.dumps(ledger, indent=2, sort_keys=True)
                           + "\n")

    summary = {
        "canary": "sf1", "queries": len(queries), "oracle_ok": len(ok),
        "exact_tier_ran": run_exact,
        "min_qualifying_jaccard": min_j,
        "engine_wall_sec": round(engine_wall, 1),
        "per_query_sec": {q: float(walls[q]) for q in walls},
    }
    print(json.dumps(summary, sort_keys=True))
    if bad:
        print(oracle.stdout[-3000:])
    sys.exit(bad)


if __name__ == "__main__":
    main()
