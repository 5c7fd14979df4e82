#!/usr/bin/env python3
"""Build a one-time sf1-scale dataset by replicating sf0.1 tenfold.

Usage:
    python3 tools/make_sf1.py [--src /root/testdata/sf0.1] [--out /tmp/sf1]
                              [--copies 10]

The driver ships sf{0.001,0.01,0.1} only; the 100x-scale claims in the
engine's scaladocs are extrapolated from the 10x gate run. This tool
manufactures the missing measured point: each table is replicated
`copies` times with entity keys shifted by a per-table stride
(max(key)+1), so referential integrity (orders->customer,
lineitem->orders/part/supplier, events->user) is preserved per copy and
copies never collide.

Two columns get more than a key shift, because verbatim replication
would manufacture a pathology the engine would never meet on naturally
grown data:

* documents.text — 10 verbatim copies of every doc would make EVERY
  near-dup cluster 10x wider (candidate pairs 100x on 10x data), so the
  banded dedup queries would look superlinear for a reason that is an
  artifact of the generator, not the algorithm. Copy i>0 appends a
  per-copy 3-letter tag (two level letters + copy letter — see
  copy_tag; --level-tag overrides the level part) to every
  alphanumeric token run: a bijection on the token alphabet, so
  WITHIN-copy shingle sets (and hence n-gram Jaccard / MinHash
  structure) are preserved exactly, while cross-copy shingle overlap
  drops to ~0 — enforced by a distinct-text conservation assert after
  the build. n_chars is recomputed.
* embeddings.embedding — copy i>0 applies a SIGNED CIRCULAR SHIFT
  with a per-level random ODD step, sign chain drawn from (level
  salt, copy index) — see signed_perm_expr for the full measured
  derivation. The shift is an isometry for dot product and cosine,
  so within-copy neighbor structure is exact; cross-copy similarity
  is scrambled but NOT to the 1/sqrt(d) noise floor: this corpus
  carries up to 33% of a vector's energy in ONE coordinate, so ANY
  >d-copy isometric family at d=64 has a corpus-intrinsic residual
  (measured aligned-pair max |cos| ~0.49 at sf1, ~0.76 at sf10;
  14% of aligned cross-copy pairs sit above the sim family's 0.4
  threshold at sf10, 0.8% at sf1). Within-level pairs — the bulk —
  stay at ~0.09. Ladder gates on threshold-band operators must
  therefore score the WITHIN-copy (bijection-exact) subset and treat
  cross-copy extras as verify-only — see sf10_ladder.py.

Known realism caveats (documented, accepted for a scale smoke):
dimension-table names (c_name/s_name/p_name) replicate verbatim under
shifted keys, so name-cardinality is 10x key-cardinality lower than a
natural sf1; region/nation stay fixed (TPC-H semantics); timestamps
replicate verbatim (10x the traffic per day, not 10x the days).

Output is parquet readable by both the engine (graft.Verify) and the
DuckDB oracle (tools/check_oracle.py). Writes ONLY under --out; never
touches /root/testdata.
"""
import argparse
import os
import random
import re
import sys

STRIDED = {
    # table -> {column: stride-source table} ; stride = max(key)+1 of the
    # source table so foreign keys shift in lockstep with their dimension
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
VERBATIM = ["region", "nation"]


def copy_tag(i: int, salt: int, level_tag: str = "") -> str:
    """Per-copy token suffix: a 2-letter LEVEL tag (drawn from the level
    salt, or --level-tag verbatim) plus the copy letter, e.g. 'qxb',
    'qxc', ... (copy 0 untouched).

    The r17 spelling was copy-index-only ('bb', 'cc', ...), which made
    chained builds clone whole sub-corpora: level-1 copy (i, 0) and
    level-2 copy (0, i) appended the SAME suffix to the same base text
    — 9 pairs of textually IDENTICAL 5k-doc sub-corpora at sf10,
    inflating every cross-copy dedup/span count (measured:
    dedup_repeated_spans read 2.46 M rows at sf10 vs the ~0.89 M a
    non-manufacturing replica gives). The level tag makes tags
    level-distinct; two letters (676 combinations, vs the r18 single
    letter's 1/26 collision odds per level pair) because a salt
    collision is deterministic — re-running reproduces it — so the
    only recovery was a code change. The remaining 1/676 residual has
    an in-band recovery path: pass --level-tag explicitly. main()
    additionally ASSERTS distinct-text conservation
    (|distinct(out)| == copies * |distinct(src)|) so any collision
    across chain levels fails the build loudly instead of silently
    manufacturing clones.
    """
    lvl = level_tag
    if not lvl:
        r = random.Random(salt * 1000003 - 13).randrange(26 * 26)
        lvl = chr(ord("a") + r // 26) + chr(ord("a") + r % 26)
    return lvl + chr(ord("a") + i)


def signed_perm_expr(d: int, salt: int, i: int, copies: int) -> str:
    """SQL for copy i's signed circular shift of a FLOAT[d] column:
    out[t] = sign_i[t] * v[(t + i) mod d], with the SIGN chain drawn
    from (level salt, copy index).

    Why shifts and not random permutations (r18, all measured on this
    corpus): an isometry's cross-copy cosine has two damage sources —
    ALIGNED coordinates (same source lands at the same target:
    contributes sigma*v_k^2) and CROSS TERMS (two heavy coordinates of
    v paired by the transform quotient: contributes +-v_p*v_q). This
    corpus holds vectors with up to 33% of their energy in ONE
    coordinate, so either source can cost ~0.3+. Random permutations
    scatter the quotient pairing and pay the cross-term price
    IMMEDIATELY: measured max aligned-clone |cos| 0.51-0.53 at sf1
    under both independent and framed random perms. Small-lag shifts
    pair only coordinates within lag <= copies-1, and this corpus's
    heavy coordinates are never that close: measured max 0.09 at sf1 —
    the shift family is the measured optimum within a level.

    The r17 defect was CROSS-LEVEL, not within-level: shifts live in
    Z_d (order 64), so a chained sf10 build (10 copies OF /tmp/sf1)
    collides total shifts — and r17 derived signs from the copy index
    ALONE, so level-1 copy (i,0) and level-2 copy (0,i) were the SAME
    transform: EXACT cross-copy clones. The per-level salt in the sign
    seed removes the exact-clone case; colliding totals degrade to
    |sum sigma_t v_t^2| over a fresh random sign pattern (~0.35-0.5 on
    the heaviest vectors).

    That residual is a FLOOR, not an implementation gap: at most d
    permutations of d points can pairwise disagree everywhere (Latin
    square rows), so ANY >64-copy isometric family at d=64 has either
    full-alignment collisions (the shift family) or scattered
    cross-term pairings (any permutation family) — both ~0.33+ on a
    33%-peak-energy corpus. Ladder builds therefore RECORD the measured
    cross-copy contamination against the sim operators' actual
    thresholds (pairs >= 0.4 etc.) instead of claiming a uniform
    isolation bound; within-level pairs — the bulk — stay at ~0.09.
    """
    # The within-level no-full-alignment argument below needs
    # copies <= d (an odd step is a unit mod d=2^k, so (i-j)*step mod d
    # is 0 only when d | i-j); enforce it here rather than relying on
    # main()'s independent [1, 26] bound.
    assert copies <= d, f"copies={copies} > d={d}: shift family aligns"
    # Per-level random ODD step: copy i shifts by (i*step) mod d. Within
    # a level the quotient shift (i-j)*step is never 0 (step odd,
    # |i-j| < d), so no within-level full alignment; ACROSS chained
    # levels the composed totals {i*step1 + j*step2} collide in only
    # ~(copies^2)^2/d residue classes for independent odd steps
    # (measured sf10: 285 colliding copy-pairs at step1=step2=1 -> ~6
    # at random steps), which is what drives the >=0.4 contamination
    # count down; the ~0.5 max-|cos| floor itself is corpus-intrinsic
    # (heavy coordinates) and unchanged by any step choice.
    step = random.Random(salt * 1000003 - 7).choice(range(1, d, 2))
    rng_i = random.Random(salt * 1000003 + i)
    signs = [rng_i.choice((1, -1)) for _ in range(d)]
    terms = ", ".join(
        f"{'' if s == 1 else '-'}embedding[{(t + i * step) % d + 1}]"
        for t, s in enumerate(signs))
    return f"CAST(list_value({terms}) AS FLOAT[]) AS embedding"


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
        epilog="expects the driver-style parquet star schema under --src",
    )
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--level-tag", default="",
                    help="explicit 2-letter [a-z] level tag for copy_tag "
                         "(recovery path for a cross-level salt collision; "
                         "default: derived from the source row count)")
    args = ap.parse_args()
    if args.level_tag and not re.fullmatch(r"[a-z]{2}", args.level_tag):
        print("error: --level-tag must be exactly two [a-z] letters "
              "(anything else leaves the tokenizers' [A-Za-z0-9] class "
              "or collides with the copy letter space)", file=sys.stderr)
        return 2
    if not (1 <= args.copies <= 26):
        # copy_tag walks 'a'..'z'; past 26 the tag characters leave
        # [A-Za-z0-9] and tokenizers would strip them, silently
        # reintroducing verbatim text clones
        print("error: --copies must be in [1, 26]", file=sys.stderr)
        return 2

    try:
        import duckdb
    except ImportError:
        print("make_sf1.py needs the driver-side duckdb (pip) environment",
              file=sys.stderr)
        return 2

    for t in VERBATIM + list(STRIDED):
        if not os.path.isfile(f"{args.src}/{t}.parquet"):
            print(f"error: {args.src}/{t}.parquet missing — --src must "
                  "point at a driver testdata sf directory", file=sys.stderr)
            return 2
    os.makedirs(args.out, exist_ok=True)

    con = duckdb.connect()
    strides = {}
    for t, cols in STRIDED.items():
        for col, (st, sc) in cols.items():
            if (st, sc) not in strides:
                strides[(st, sc)] = con.sql(
                    f"SELECT max({sc}) + 1 FROM '{args.src}/{st}.parquet'"
                ).fetchone()[0]

    for t in VERBATIM:
        con.sql(f"COPY (SELECT * FROM '{args.src}/{t}.parquet') TO "
                f"'{args.out}/{t}.parquet' (FORMAT parquet)")
        print(f"{t}: verbatim")

    for t, cols in STRIDED.items():
        src = f"'{args.src}/{t}.parquet'"
        desc = con.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()
        names = [d[0] for d in desc]
        salt_doc = con.sql(f"SELECT count(*) FROM {src}").fetchone()[0]
        selects = []
        for i in range(args.copies):
            exprs = []
            for name in names:
                if name in cols:
                    st, sc = cols[name]
                    exprs.append(f"{name} + {i} * {strides[(st, sc)]} "
                                 f"AS {name}")
                elif t == "documents" and name == "text" and i > 0:
                    exprs.append(
                        "regexp_replace(text, '([A-Za-z0-9]+)', "
                        f"'\\1{copy_tag(i, salt_doc, args.level_tag)}', 'g') AS text")
                elif t == "documents" and name == "n_chars" and i > 0:
                    exprs.append(
                        "CAST(length(regexp_replace(text, "
                        "'([A-Za-z0-9]+)', "
                        f"'\\1{copy_tag(i, salt_doc, args.level_tag)}', 'g')) "
                        "AS BIGINT) AS n_chars")
                elif t == "embeddings" and name == "embedding" and i > 0:
                    d = con.sql(f"SELECT len(embedding) FROM {src} LIMIT 1"
                                ).fetchone()[0]
                    exprs.append(signed_perm_expr(d, salt_doc, i,
                                                  args.copies))
                else:
                    exprs.append(name)
            selects.append(f"SELECT {', '.join(exprs)} FROM {src}")
        union = " UNION ALL ".join(selects)
        con.sql(f"COPY ({union}) TO '{args.out}/{t}.parquet' "
                "(FORMAT parquet)")
        n = con.sql(f"SELECT count(*) FROM '{args.out}/{t}.parquet'"
                    ).fetchone()[0]
        print(f"{t}: {n} rows ({args.copies} copies)")
        if t == "documents":
            # distinct-text conservation: per-copy tags are bijections
            # on disjoint tag alphabets, so the distinct-text count must
            # scale EXACTLY with copies; a cross-level tag collision
            # (the r17 chained-build clone bug) breaks this loudly here
            # instead of silently inflating every dedup/span count
            dsrc = con.sql(f"SELECT count(DISTINCT text) FROM {src}"
                           ).fetchone()[0]
            dout = con.sql("SELECT count(DISTINCT text) FROM "
                           f"'{args.out}/{t}.parquet'").fetchone()[0]
            if dout != args.copies * dsrc:
                print(f"error: distinct-text conservation violated — "
                      f"{dout} != {args.copies} * {dsrc}; cross-copy "
                      "tag collision (see copy_tag docstring)",
                      file=sys.stderr)
                return 1
            print(f"documents: distinct-text conservation OK "
                  f"({dout} = {args.copies} x {dsrc})")
    print(f"done -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
