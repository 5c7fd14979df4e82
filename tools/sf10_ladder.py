#!/usr/bin/env python3
"""Standing sf10 ladder — the 1000x-of-gate scale point (r18).

Companion to tools/sf1_canary.py one rung up: builds /tmp/sf10 by
chaining make_sf1.py over /tmp/sf1 (10 copies of 10 copies of sf0.1 —
60 M lineitem / 500 k docs / 200 k embeddings, ~2.4 GB parquet), runs
the scale-path subset through graft.Verify at local[32], then
value-checks against DuckDB under a 1200 s/query budget.

The subset: every sf1-canary member whose 1000x point is provable,
plus (r20) the stream/olap/analytics families' first >=sf1 rows —
sessionization, per-group top-k, cube, and a RANGE event-time window —
each with a full twin and a replica-linearity or closed-form row
count. The original core is:
the two fixed overflow queries (cum_cents*1e6 ~ 2.3e20 here — 25x past
2^63), the preemptive widening, fertility, the banded dedup/sim
siblings (whose twins became sf10-checkable in r18 via the banded
respell — see the PORTING.md twin-scalability doctrine), both span
operators (replica-linearity at 1000x: rows must be exactly 100x the
sf0.1 counts), the bucketed-layout gates, and one streaming query.
sim_dbscan_bucketed is value-checked by the SAMPLED oracle
(dbscan_sampled_check, r19): its FULL twin is measured-infeasible at
sf10 (assign prefix ~1.1e9 dots; 1200 s / 64.7 GB on the one r18
attempt), so ~1k deterministic points get their n_neighbors/role
recomputed exactly and their labels consistency-proven instead.
NOT here: the exact-tier quadratic queries — containment/jaccard
(hours at sf10 by design) and dedup_embedding_cosine /
sim_dbscan_bucketed_agreement (the exact 2e10-dot cross: engine
MEASURED 334 s at sf1 (r19, 16 cpus) -> ~9 h at sf10; their exact
tier stays sf1-certified, and the embedding-threshold family's 1000x
value point is the sampled dbscan row, which verifies the same
quantized eps-geometry on the same contaminated corpus).

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
    # r20 (VERDICT ask 1): the stream/olap/analytics families' first
    # >=sf1 standing rows — the shapes most sensitive to data volume
    # that previously had only sf0.01-0.1 evidence. All four carry FULL
    # twins (their DuckDB arms are linear window/agg shapes):
    #   stream_sessionize      gap-window sessionization; rows are
    #                          replica-linear (sessions partition by
    #                          user_id, user ids are copy-strided, ts
    #                          replicate verbatim -> per-copy sessions
    #                          identical to sf0.1's 69,122)
    #   olap_topk_per_group    rank-filter over a 60M-row join; rows
    #                          closed-form 3 x 25 brands (brands
    #                          replicate verbatim; ties across copies
    #                          break on p_partkey identically in both
    #                          engines)
    #   olap_cube              4-way Expand over the leaf agg; rows
    #                          closed-form 24 (3 statuses x 5
    #                          priorities + margins, scale-invariant)
    #   analytics_range_window RANGE (event-time value) frame; one
    #                          output row per event -> rows must equal
    #                          the events table count exactly
    "stream_sessionize", "olap_topk_per_group", "olap_cube",
    "analytics_range_window",
    # r20 (VERDICT ask 2): the exact dedup tier's SAMPLED 1000x value
    # points — one fingerprint row per doc_id % 199 == 0 doc (counts,
    # id/intersect sums, max measure of its exact neighbor set), the
    # same tokenize->shingle->intersect->IEEE-measure substrate as the
    # quadratic exact tier but linear in the corpus, so they carry FULL
    # twins here (the full tier's twins stay sf1-certified by the
    # canary cadence). Negative controls recorded in ARCHITECTURE.md:
    # a perturbed twin denominator and a shifted sample offset both
    # FAIL the value compare loudly at sf1.
    "dedup_jaccard_sampled", "dedup_containment_sampled",
    # r20: the embedding sibling — completes the sampled coverage of
    # all three ledgered exact-tier exemptions (sample x corpus =
    # 2e8 exact quantized dots here vs the parent's 2e10)
    "dedup_embedding_cosine_sampled",
]
# sim_dbscan_bucketed gets the SAMPLED oracle (dbscan_sampled_check)
# instead of the full twin: the full twin's assign prefix alone is
# n*nCells ~ 1.1e9 dots at sf10 (measured r18: >1200 s / 64.7 GB).
ORACLE_SKIP = {"sim_dbscan_bucketed"}
# Every deterministic (vec_id % MOD == 0) point is exact-verified —
# 199 is coprime to the replica stride (2000), so the ~1005-point
# sample walks all 100 copies instead of pinning one offset per copy.
DBSCAN_SAMPLE_MOD = 199
# rows must be EXACTLY 100x the sf0.1 value (replica linearity) or the
# query's closed form at sf10 (see the ENGINE_QUERIES comments)
LINEAR_ROWS = {
    "dedup_minhash_lsh": 25600,          # 100 x 256
    "dedup_containment_minhash": 51200,  # 100 x 512
    "dedup_repeated_spans": 893900,      # 100 x 8,939
    "text_dup_span_fraction": 500000,    # one per doc
    "stream_sessionize": 6912200,        # 100 x 69,122 sessions
    "olap_topk_per_group": 75,           # 3 per brand x 25 brands
    "olap_cube": 24,                     # (3+ALL) x (5+ALL) + gid margins
    "analytics_range_window": 10000000,  # one per event
    # one row per sampled doc: floor(499999/199) + 1 on contiguous ids
    "dedup_jaccard_sampled": 2513,
    "dedup_containment_sampled": 2513,
    # one row per sampled vector: floor(199999/199) + 1
    "dedup_embedding_cosine_sampled": 1006,
}


def calib_sec() -> float:
    """Fixed CPU-bound calibration (numpy hash-mix over a constant
    range, no I/O, no data dependence) timed alongside the sampled
    checks, mirroring Bench.scala's calib_sec: the r19 sampled-dbscan
    wall read 53 s quiet but 125 s in the driver's loaded window, and
    without a host-speed sample IN the artifact that looked like
    slow-creep. Quiet reference on this VM: ~0.15-0.25 s. The first
    pass is WARMUP and discarded (same rule as Bench.calibrate): the
    process's first big numpy allocation + ufunc dispatch measured
    8.0 s where the second pass reads 0.21 on an idle box.
    """
    import numpy as np

    def one_pass() -> float:
        t0 = time.time()
        a = np.arange(30_000_000, dtype=np.uint64)
        ((a * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)).sum()
        return round(time.time() - t0, 3)

    one_pass()
    return one_pass()


def dbscan_sampled_check(sf10: str, out: str, timeout_s: float) -> dict:
    """SAMPLED sf10 oracle for sim_dbscan_bucketed (r19): exact DuckDB
    verification of a deterministic ~1k-point sample where the FULL twin
    is measured-infeasible (assign prefix n*nCells ~ 1.1e9 dots; one r18
    attempt hit 1200 s / 64.7 GB).

    What is proven, exactly, for every sampled point p (vec_id %
    DBSCAN_SAMPLE_MOD == 0):
      1. n_neighbors — recomputed INDEPENDENTLY: p's exact eps-ball
         against ALL 200k points (sample x corpus = 2e8 dots, the
         affordable slice of the quadratic), intersected with the
         shared-probe-cell predicate under the SAME derived geometry /
         centroid seeding / (score, idx) tie order as the committed
         full twin (bucketed candidates are a subset of exact eps-pairs,
         so the eps-ball bounds every candidate — nothing outside it
         can be a neighbor). Engine value must match exactly.
      2. role 'core' <-> deg+1 >= minPts — fully independent.
      3. label consistency on every incident core-core bucketed edge:
         p core and its bucketed neighbor q engine-core => same cluster
         id (q's role/cluster read from the ENGINE output — a local
         consistency proof of the labeling, not an independent global
         CC; documented as the sampled check's partial part).
      4. border/noise: non-core p with >=1 engine-core bucketed
         neighbor must be 'border' with cluster = MIN over those
         neighbors' clusters; with none, 'noise' with NULL cluster.
    Constants (eps2, minPts, nProbe, minCells, dim) are PARSED from the
    dumped oracle_sql.json's sim_dbscan_bucketed entry, so this check
    cannot desync from the one Scala definition feeding both engines.

    Why the probe-cell assignment runs in NUMPY, not SQL: the sampled
    points' eps-balls jointly cover the whole corpus (measured: 1005
    samples -> 199,999 distinct neighbors), so the check needs top-6
    cells for ALL n points — the same n*nCells scoring the full twin
    chokes on. In SQL the blowup is the MATERIALIZATION (1.1e9 score
    rows: >1200 s / 64.7 GB; a 10k-vector GROUP BY+list chunk measured
    26 s / 12 GB). The scores themselves are bit-exact in float64
    REGARDLESS of summation order — quantized coords make every dot an
    exact integer < 2^53 (the committed twin's own EmbeddingDim
    argument), and nrm/cosine are single deterministic IEEE ops — so a
    BLAS matmul computes the identical score matrix in seconds, chunked
    to bound memory, with the exact (s DESC, ci DESC) tie order
    replicated by a stable argsort over column-reversed scores. The
    quantized vectors are pulled FROM DuckDB so the round() semantics
    (half away from zero) match the twin exactly.
    Returns {"ok": bool, "detail": str, "sec": float}.
    """
    import duckdb
    import numpy as np
    sql_text = json.loads(
        (Path(out) / "oracle_sql.json").read_text())["sim_dbscan_bucketed"]

    def c(pat):
        m = re.search(pat, sql_text)
        if not m:
            raise SystemExit(f"[ladder] dbscan const parse failed: {pat}")
        return int(m.group(1))

    eps2 = c(r"array_inner_product\(x\.av, y\.av\)\s*<=\s*(\d+)")
    minpts = c(r"n_neighbors \+ 1 >= (\d+)")
    nprobe = c(r"list_sort\(list\(\{'s': s, 'i': ci\}\)\)\), 1, (\d+)\)")
    mincells = c(r"GREATEST\((\d+), 2 \* \d+ \* CAST\(ceil")
    dim = c(r"AS DOUBLE\[(\d+)\]")

    k = DBSCAN_SAMPLE_MOD
    t0 = time.time()
    con = duckdb.connect()
    con.execute("""
CREATE TEMP TABLE v AS
  SELECT vec_id,
         CAST(list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS DOUBLE)) AS DOUBLE[{dim}]) AS av
  FROM read_parquet('{sf10}/embeddings.parquet');
CREATE TEMP TABLE vn AS
  SELECT vec_id, av, array_inner_product(av, av) AS nq FROM v;
""".format(dim=dim, sf10=sf10))

    # ---- numpy probe-cell assignment (bit-exact, see docstring) ----
    arr = con.sql("SELECT vec_id, av FROM v ORDER BY vec_id").arrow()
    ids = arr["vec_id"].combine_chunks().to_numpy()
    q_mat = arr["av"].combine_chunks().flatten().to_numpy().reshape(
        len(ids), dim)
    n = len(ids)
    ncells = max(mincells,
                 nprobe * 2 * int(__import__("math").ceil(n ** 0.5)))
    cent = q_mat[:ncells]  # lowest-vec_id seeding (ORDER BY vec_id above)
    nrm = np.sqrt((q_mat * q_mat).sum(axis=1))
    cnrm = nrm[:ncells]
    cell_rows = []
    chunk = 20000
    for lo in range(0, n, chunk):
        qc = q_mat[lo:lo + chunk]
        s = qc @ cent.T                      # exact integer dots
        s /= np.outer(nrm[lo:lo + chunk], cnrm)  # same two IEEE ops as SQL
        s[:, cnrm == 0] = -2.0
        # top-nprobe with tie order (s DESC, ci DESC) via nprobe argmax
        # passes over the COLUMN-REVERSED matrix: argmax returns the
        # FIRST max, which in reversed column order is the HIGHEST
        # original ci — a full argsort of the 1e8-element chunk measured
        # 75 s where six bandwidth-bound scans take ~1 s
        s_rev = s[:, ::-1].copy()
        rows = np.arange(s_rev.shape[0])
        cells = np.empty((s_rev.shape[0], nprobe), dtype=np.int64)
        for j in range(nprobe):
            idx = s_rev.argmax(axis=1)
            cells[:, j] = (ncells - 1) - idx
            s_rev[rows, idx] = -np.inf
        cids = np.repeat(ids[lo:lo + chunk], nprobe)
        keep = np.repeat(nrm[lo:lo + chunk] > 0, nprobe)
        cell_rows.append(
            np.stack([cids[keep], cells.reshape(-1)[keep]], axis=1))
    assign = np.concatenate(cell_rows)
    import pandas as pd
    con.register("cellsof", pd.DataFrame(
        {"vec_id": assign[:, 0].astype("int64"),
         "cell": assign[:, 1].astype("int64")}))
    log_assign = (f"assign {time.time() - t0:.0f}s n={n} ncells={ncells} "
                  f"rows={len(assign)}")

    check_sql = f"""
WITH samp AS MATERIALIZED (
  SELECT vec_id FROM v WHERE vec_id % {k} = 0
), sn AS MATERIALIZED (
  SELECT a.vec_id AS p, b.vec_id AS q
  FROM (SELECT * FROM vn WHERE vec_id % {k} = 0) a
  JOIN vn b ON b.vec_id <> a.vec_id
  WHERE a.nq + b.nq - 2 * array_inner_product(a.av, b.av) <= {eps2}
), bnb AS MATERIALIZED (
  SELECT DISTINCT sn.p, sn.q
  FROM sn
  JOIN cellsof cp ON cp.vec_id = sn.p
  JOIN cellsof cq ON cq.vec_id = sn.q AND cq.cell = cp.cell
), bdeg AS MATERIALIZED (
  SELECT s.vec_id, COALESCE(c.nn, 0) AS deg
  FROM samp s LEFT JOIN (SELECT p, COUNT(*) AS nn FROM bnb GROUP BY p) c
    ON c.p = s.vec_id
), eng AS MATERIALIZED (
  SELECT * FROM read_parquet('{out}/sim_dbscan_bucketed/*.parquet')
), es AS MATERIALIZED (
  SELECT e.*, d.deg FROM eng e JOIN bdeg d ON d.vec_id = e.vec_id
), corenbr AS MATERIALIZED (
  SELECT b.p, MIN(eq.cluster) AS min_core_cluster, COUNT(*) AS n_core_nbrs
  FROM bnb b JOIN eng eq ON eq.vec_id = b.q AND eq.role = 'core'
  GROUP BY b.p
)
SELECT
  (SELECT count(*) FROM v) AS n_points,
  (SELECT count(*) FROM eng) AS n_eng_rows,
  (SELECT count(*) FROM samp) AS n_sampled,
  (SELECT count(*) FROM bdeg d LEFT JOIN eng e ON e.vec_id = d.vec_id
    WHERE e.vec_id IS NULL) AS missing_rows,
  -- every comparison below is NULL-SAFE (IS DISTINCT FROM /
  -- COALESCE): an engine regression emitting NULL n_neighbors, NULL
  -- role, or NULL cluster on a core row must COUNT as a violation,
  -- not vanish into three-valued logic
  (SELECT count(*) FROM es
    WHERE n_neighbors IS DISTINCT FROM deg) AS deg_mismatch,
  (SELECT count(*) FROM es
    WHERE (deg + 1 >= {minpts}) IS DISTINCT FROM
          (COALESCE(role, '') = 'core')
       OR (deg + 1 >= {minpts} AND cluster IS NULL)) AS core_mismatch,
  (SELECT count(*) FROM es s
    JOIN bnb b ON b.p = s.vec_id
    JOIN eng eq ON eq.vec_id = b.q AND eq.role = 'core'
    WHERE s.deg + 1 >= {minpts}
      AND s.cluster IS DISTINCT FROM eq.cluster)
    AS core_edge_label_viol,
  (SELECT count(*) FROM es s LEFT JOIN corenbr c ON c.p = s.vec_id
    WHERE s.deg + 1 < {minpts} AND (
      CASE WHEN c.n_core_nbrs > 0
           THEN COALESCE(s.role, '') <> 'border'
             OR s.cluster IS DISTINCT FROM c.min_core_cluster
           ELSE COALESCE(s.role, '') <> 'noise'
             OR s.cluster IS NOT NULL END))
    AS border_noise_viol
"""
    timer = None
    try:
        import threading
        remaining = max(1.0, timeout_s - (time.time() - t0))
        timer = threading.Timer(remaining, con.interrupt)
        timer.start()
        row = con.execute(check_sql).fetchone()
    except Exception as e:
        return {"ok": False, "detail": f"sampled-check error: {e}",
                "sec": round(time.time() - t0, 1)}
    finally:
        if timer:
            timer.cancel()
    names = ["n_points", "n_eng_rows", "n_sampled", "missing_rows",
             "deg_mismatch", "core_mismatch", "core_edge_label_viol",
             "border_noise_viol"]
    d = dict(zip(names, row))
    d["assign"] = log_assign
    ok = (d["n_eng_rows"] == d["n_points"] and d["n_sampled"] > 0
          and all(d[n] == 0 for n in names[3:]))
    return {"ok": ok, "detail": d, "sec": round(time.time() - t0, 1)}


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
        cwd=repo, env={**os.environ, "SPARK_GRAFT_CPUS": args.cpus,
                       # 24g, not the gate-SF 8g default: the r20 run
                       # that grew the subset 13 -> 19 lost three
                       # queries to cumulative heap pressure at 8g
                       # (each passed in isolation); the sf10 rung has
                       # the whole 128 GiB box to itself
                       "SPARK_DRIVER_MEM": os.environ.get(
                           "SPARK_DRIVER_MEM", "24g")},
        capture_output=True, text=True)
    engine_wall = time.time() - t0
    blob = proc.stderr + proc.stdout
    walls = dict(re.findall(r"\[verify\] (\w+) ok ([0-9.]+)s", blob))
    # keep the MESSAGES, not just the names: the first r20 run reported
    # three bare names and the diagnosis needed a manual re-run
    failed_lines = re.findall(r"\[verify\] \w+ failed:.*", blob)
    failed = re.findall(r"\[verify\] (\w+) failed", blob)
    if failed:
        print("[ladder] ENGINE FAILURES:")
        for ln in failed_lines:
            print(f"  {ln}")

    checked = [q for q in ENGINE_QUERIES if q not in ORACLE_SKIP]
    oracle = subprocess.run(
        [sys.executable, str(repo / "tools/check_oracle.py"), args.sf10,
         args.out, ",".join(checked), str(args.timeout)],
        cwd=repo, capture_output=True, text=True)
    ok = set(re.findall(r"^OK\s+(\w+):", oracle.stdout, re.M))
    rows = {q: int(n) for q, n in
            re.findall(r"^OK\s+(\w+): (\d+) rows", oracle.stdout, re.M)}

    sampled = {}
    calib = calib_sec()
    if "sim_dbscan_bucketed" in walls:
        print("[ladder] running the sampled dbscan oracle "
              f"(~{200000 // DBSCAN_SAMPLE_MOD} exact-verified points) ...",
              flush=True)
        sampled["sim_dbscan_bucketed"] = dbscan_sampled_check(
            args.sf10, args.out, args.timeout)

    # bad starts at 0 (r20, ADVICE): the per-query loop below already
    # gives every engine-failed query a FAIL verdict (+1), so seeding
    # with len(failed) double-counted engine failures in the exit code
    bad = 0
    for q in ENGINE_QUERIES:
        if q in sampled:
            verdict = "SAMP" if sampled[q]["ok"] else "FAIL"
        elif q in ORACLE_SKIP:
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
        samp = ""
        if q in sampled:
            s = sampled[q]
            samp = f" sampled[{s['sec']}s]={s['detail']}"
        print(f"{verdict} {q:28s} engine={walls.get(q, '?'):>7s}s "
              f"rows={rows.get(q, '?')}{lin}{samp}")
    # sampled-check budget gate (r20, VERDICT ask 3): the sampled walls
    # are asserted against the ladder's OWN per-query budget (the same
    # --timeout every oracle row gets), and the wall + a host-speed
    # calib land IN the artifact — so a loaded driver window (r19: 53 s
    # quiet vs 125 s loaded) reads as "slow host, calib up" in the JSON
    # instead of as silent slow-creep in prose.
    sampled_wall = round(sum(s["sec"] for s in sampled.values()), 1)
    for q, s in sampled.items():
        if s["sec"] > args.timeout:
            bad += 1
            print(f"FAIL sampled check {q} wall {s['sec']}s exceeds the "
                  f"ladder budget {args.timeout}s")
    summary = {
        "ladder": "sf10", "queries": len(ENGINE_QUERIES),
        "oracle_ok": len(ok), "oracle_attempted": len(checked),
        "sampled_ok": sum(1 for s in sampled.values() if s["ok"]),
        "sampled_wall_s": sampled_wall, "calib_sec": calib,
        "engine_wall_sec": round(engine_wall, 1),
        "per_query_sec": {q: float(w) for q, w in walls.items()},
    }
    print(json.dumps(summary, sort_keys=True))
    if bad:
        print(oracle.stdout[-3000:])
    sys.exit(min(bad, 125))


if __name__ == "__main__":
    main()
