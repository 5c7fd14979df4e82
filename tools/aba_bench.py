#!/usr/bin/env python3
"""Same-window old-binary ABA benchmark — the ONLY trustworthy way to
triage an apparent cross-round per-query regression on this host (r18).

Why this tool exists: calib_sec normalization does NOT capture every
host degradation mode — measured in r18, calib swung 0.27->0.48 between
ADJACENT idle-machine phases and host speed shifts ~2x BETWEEN sessions,
so cross-round per-query walls are incomparable no matter how they are
normalized. The r17 judge flagged a "1.3-1.4x widening regression" on
eight queries that a matched-window ABA against the actual r16 binary
read at 0.76-1.08x (and six of the eight were byte-identical binaries).
This tool commits that runbook — r18 rebuilt it by hand in /tmp — so
the next triage is one command:

    python3 tools/aba_bench.py --old <commit> \
        --queries theil_sen,q3_group_avg [--runs 5] [--cpus 16] \
        [--sf /root/testdata/sf0.1]

What it does:
  1. compiles the CURRENT working tree (sbt compile);
  2. checks out <commit> into a git worktree under /tmp/aba_<sha> and
     compiles it there (reused across invocations if already built);
  3. runs graft.Bench via DIRECT java (no sbt JVM between samples) with
     SPARK_GRAFT_BENCH_ONLY=<queries>, SPARK_GRAFT_BENCH_RUNS=<runs>,
     in ABA order: NEW, OLD, NEW — all three phases inside one machine
     window, so host drift shows up as new1 vs new2 disagreement
     instead of silently biasing the new-vs-old ratio;
  4. prints per-query new1/old/new2 medians, the min(new)/old ratio,
     each phase's calib_sec, and (r20) an explicit VERDICT per query —
     ok / too-noisy / regressed / missing, the reading rule as code
     (see verdict(); fixtures in aba_verdict_fixtures.tsv, mirrored by
     GateHygieneSpec). Exit codes are disjoint decisions: 0 clean or
     too-noisy (rerun, don't act), 1 regression(s) confirmed, 2 a
     requested query was missing from a phase, 3 a phase produced no
     record (infrastructure failure).

CHECK CODE IDENTITY FIRST (git diff old..HEAD -- <query's files>): a
byte-identical execution path settles the question without any
benchmark. Run `python3 tools/aba_bench.py --selftest` to check the
verdict rule against its fixture table.

Per-query medians come from Bench.scala itself (interleaved passes,
lower-middle median over successful runs); this tool never re-times
anything. Dev-only tooling.
"""
import argparse
import json
import os
import re
import subprocess
import sys
from pathlib import Path

# Mirrors build.sbt's jdk17AddOpens (Spark 4 on JDK 17 outside
# spark-submit) — keep in sync if build.sbt's list changes.
ADD_OPENS_PKGS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


# Parsed (not duplicated) from Bench.scala so a re-measured host regime
# can never leave this tool silently clamping to a stale literal; the
# anchor regex is pinned by GateHygieneSpec alongside the add-opens
# lockstep test.
PHYSICAL_CORES_ANCHOR = r"val PhysicalCores = (\d+)"


def physical_cores(repo: Path) -> int:
    src = (repo / "src/main/scala/graft/Bench.scala").read_text()
    m = re.search(PHYSICAL_CORES_ANCHOR, src)
    if not m:
        sys.exit("[aba] Bench.PhysicalCores anchor no longer matches "
                 "Bench.scala — update PHYSICAL_CORES_ANCHOR (and the "
                 "GateHygieneSpec pin) alongside the Bench change")
    return int(m.group(1))


# Apparent slowdowns up to this fraction over the old binary are read
# as 'ok': the r18/r19 reproductions put same-window run-to-run medians
# in a ~±10% band even on an idle machine.
REGRESS_THRESHOLD = 0.10


def verdict(n1, o, n2) -> str:
    """Per-query ABA verdict (r20, VERDICT ask 4) — the reading rule
    that used to live in the module docstring, as code:

      missing    a phase has no sample for the query (typo, or the
                 query doesn't exist in one commit)
      ok         min(new)/old within 1 + REGRESS_THRESHOLD
      regressed  excess over old larger than the threshold AND the two
                 NEW phases agree more tightly than the excess — the
                 window was steady, the slowdown is real
      too-noisy  excess over old, but new1/new2 disagree by more than
                 the excess (host drift swamped the signal — rerun),
                 or only one NEW phase produced a sample

    The r19 reproduction's quantile_sketch read 1.15x with new1/new2
    apart by ~22% — this rule names that 'too-noisy' instead of leaving
    the judgment to prose.
    """
    news = [x for x in (n1, n2) if x is not None]
    if not news or not o:
        return "missing"
    # multiplicative form, not `ratio - 1 <= threshold`: 1.10/1.0 - 1.0
    # is 0.10000000000000009 in floats and would flag the boundary.
    # GateHygieneSpec's Scala mirror copies this arithmetic verbatim so
    # the two implementations agree bit-for-bit on the fixtures.
    if min(news) <= o * (1.0 + REGRESS_THRESHOLD):
        return "ok"
    if len(news) < 2:
        return "too-noisy"
    excess = min(news) / o - 1.0
    noise = abs(n1 - n2) / min(news)
    return "regressed" if noise < excess else "too-noisy"


def selftest() -> int:
    """Check verdict() against the shared fixture table (also mirrored
    in Scala by GateHygieneSpec — the audit_* double-entry pattern)."""
    bad = 0
    path = Path(__file__).resolve().parent / "aba_verdict_fixtures.tsv"
    for ln in path.read_text().splitlines():
        if not ln.strip() or ln.startswith("#"):
            continue
        n1, o, n2, want = ln.split("\t")
        conv = lambda v: None if v == "-" else float(v)
        got = verdict(conv(n1), conv(o), conv(n2))
        if got != want:
            bad += 1
            print(f"SELFTEST FAIL: verdict({n1}, {o}, {n2}) = {got}, "
                  f"fixture says {want}")
    print(f"[aba] selftest: {'OK' if not bad else f'{bad} FAIL'}")
    return bad


def java_cmd(classes: Path) -> list:
    flags = []
    for p in ADD_OPENS_PKGS:
        flags += ["--add-opens", f"{p}=ALL-UNNAMED"]
    return ["java"] + flags + [
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        f"-Xmx{os.environ.get('SPARK_DRIVER_MEM', '8g')}",
        "-cp", f"{classes}:/opt/spark/jars/*", "graft.Bench",
    ]


def compile_tree(tree: Path) -> Path:
    classes = tree / "target/scala-2.13/classes"
    print(f"[aba] sbt compile in {tree} ...", flush=True)
    subprocess.run(["sbt", "-batch", "compile"], cwd=tree, check=True,
                   capture_output=True, text=True)
    if not (classes / "graft").is_dir():
        sys.exit(f"[aba] compile produced no classes under {classes}")
    return classes


def run_phase(label: str, tree: Path, classes: Path, args) -> dict:
    env = {**os.environ,
           "SPARK_GRAFT_SF_DIR": args.sf,
           "SPARK_GRAFT_CPUS": str(args.cpus),
           "SPARK_GRAFT_BENCH_ONLY": args.queries,
           "SPARK_GRAFT_BENCH_RUNS": str(args.runs)}
    # BENCH_ONLY suppresses the committed bench_full_rN.json write in
    # every Bench vintage, so no explicit FULL_OUT override is needed;
    # results are parsed from stdout (present in all vintages).
    print(f"[aba] phase {label}: {args.runs} interleaved runs of "
          f"[{args.queries}] at {args.cpus} cpus ...", flush=True)
    proc = subprocess.run(java_cmd(classes), cwd=tree, env=env,
                          capture_output=True, text=True)
    best = {}
    for line in proc.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        # STRICTLY more queries: Bench prints the full-precision line
        # first and then a compact line whose per-query values are
        # rounded to 3 decimals; on ties (<=15 benched queries, the
        # normal ABA case) keeping the FIRST record keeps full precision
        if "queries" in rec and len(rec.get("queries", {})) > \
                len(best.get("queries", {})):
            best = rec
    if not best:
        print(f"[aba] phase {label}: NO bench record parsed; stderr tail:")
        print(proc.stderr[-2000:])
    return best


def main():
    if "--selftest" in sys.argv:
        sys.exit(selftest())
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True,
                    help="commit/ref of the OLD binary to A/B against")
    ap.add_argument("--queries", required=True,
                    help="comma-separated SparkEntry query names")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=16,
                    help="default 16 = the committed regime; values above "
                         "Bench.PhysicalCores (parsed, currently 16) are "
                         "clamped — see below")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rm-worktree", action="store_true",
                    help="remove the old-commit worktree afterwards "
                         "(default: keep, so repeat ABAs skip the build)")
    args = ap.parse_args()
    repo = Path(__file__).resolve().parent.parent

    # Clamp HERE, not just in Bench: the r19+ NEW binary clamps itself
    # (Bench.resolveCpus) while OLD binaries honor the literal env
    # value — an unclamped --cpus 32 would compare new@16 against
    # old@32 and fabricate a 2-3x "improvement" on iterative queries
    # (the HT artifact) in the exact tool whose purpose is trustworthy
    # triage. Clamping in the tool keeps every phase, any vintage, in
    # the same regime. The cap is PARSED from Bench.scala (r20), so a
    # re-measured host constant propagates here automatically.
    cores = physical_cores(repo)
    if args.cpus > cores:
        print(f"[aba] --cpus {args.cpus} exceeds the {cores} physical "
              "cores (Bench.PhysicalCores); clamping so OLD binaries "
              "(no Bench-side clamp) run the same regime as NEW ones",
              flush=True)
        args.cpus = cores

    sha = subprocess.run(["git", "rev-parse", "--short", args.old],
                         cwd=repo, capture_output=True, text=True,
                         check=True).stdout.strip()
    old_tree = Path(f"/tmp/aba_{sha}")
    if not old_tree.is_dir():
        subprocess.run(["git", "worktree", "add", "--detach",
                        str(old_tree), sha], cwd=repo, check=True)
    new_classes = compile_tree(repo)
    old_classes = old_tree / "target/scala-2.13/classes"
    if not (old_classes / "graft").is_dir():
        old_classes = compile_tree(old_tree)
    else:
        print(f"[aba] reusing compiled worktree {old_tree}", flush=True)

    new1 = run_phase("NEW(1)", repo, new_classes, args)
    old = run_phase(f"OLD({sha})", old_tree, old_classes, args)
    new2 = run_phase("NEW(2)", repo, new_classes, args)

    qs = [q.strip() for q in args.queries.split(",") if q.strip()]
    verdicts = {}
    print(f"\n{'query':30s} {'new1':>8s} {'old':>8s} {'new2':>8s} "
          f"{'min(new)/old':>13s} {'verdict':>10s}")
    for q in qs:
        n1 = new1.get("queries", {}).get(q)
        o = old.get("queries", {}).get(q)
        n2 = new2.get("queries", {}).get(q)
        ratio = (min(x for x in (n1, n2) if x is not None) / o
                 if o and (n1 is not None or n2 is not None) else None)
        verdicts[q] = verdict(n1, o, n2)
        fmt = lambda v: f"{v:8.3f}" if isinstance(v, float) else f"{'?':>8s}"
        print(f"{q:30s} {fmt(n1)} {fmt(o)} {fmt(n2)} "
              + (f"{ratio:13.2f}" if ratio else f"{'?':>13s}")
              + f" {verdicts[q]:>10s}")
    print(f"\ncalib_sec: new1={new1.get('calib_sec', '?')} "
          f"old={old.get('calib_sec', '?')} new2={new2.get('calib_sec', '?')}"
          f"  (adjacent-phase calib swings of ~1.8x were measured on an "
          f"idle machine — trust new1~new2 agreement, not calib)")

    if args.rm_worktree:
        subprocess.run(["git", "worktree", "remove", "--force",
                        str(old_tree)], cwd=repo, check=False)
    missing = [q for q in qs if verdicts.get(q) == "missing"]
    if missing:
        print(f"[aba] WARNING: no samples for {missing} in at least one "
              "phase — typo'd name, or the query does not exist in one "
              "of the two commits (check SparkEntry.queries keys)")
    # one decision per exit code (r20; codes kept DISJOINT so automation
    # can branch): 0 = clean or merely too-noisy (the table says rerun,
    # not act); 1 = at least one 'regressed' verdict (steady window,
    # real slowdown — the list is printed); 2 = a requested query was
    # 'missing' from a phase (typo'd name or not in one commit — the
    # tool never measured what was asked, which must not read as
    # clean); 3 = a whole phase produced no bench record at all
    # (infrastructure failure).
    if not (new1 and old and new2):
        sys.exit(3)
    regressed = [q for q, v in verdicts.items() if v == "regressed"]
    if regressed:
        print(f"[aba] REGRESSED: {regressed}")
        sys.exit(1)
    sys.exit(2 if missing else 0)


if __name__ == "__main__":
    main()
