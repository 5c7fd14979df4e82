#!/usr/bin/env python3
"""Twin-scalability auditor for quadratic candidate generation (r18).

The class (named by MEASUREMENT twice): an oracle twin that restates a
candidate-generation query's quadratic DEFINITION instead of a scalable
candidate set, so the oracle stops being able to check what the engine
can do long before the engine stops doing it.

  * r16→r17: the exact DBSCAN twins ran the LIST-kernel all-pairs
    expansion — >3600 s at sf1 for 20 k vectors while the engine's
    bucketed path ran in seconds; fixed by restating the engine's
    ε-complete grid pruning on fixed-size array kernels.
  * r17→r18: the MinHash twins generated pairs with the inverted-index
    join `ex a JOIN ex b ON a.g = b.g` — Σ df² rows, which timed out
    DuckDB-side at sf10 (>1200 s, 57 GB RSS) while the engine's banded
    path ran in ~60 s; fixed by restating banding under an INDEPENDENT
    hash family (SimilarityQueries.bandedShingleCtes).

The doctrine (PORTING.md "oracle twins"): a twin for a
candidate-generation query must restate a SCALABLE candidate structure
— a sound pruning (grid closure, prefix filter where the vocabulary
supports it) or an independent-family restatement of the engine's
banding — whenever the all-sharing-pairs count is superlinear in the
corpus. Deliberately-exact baselines are exempt WITH a justification
that names the tier the twin is certified for (gate SF / sf1) and why
the cost is acceptable there (the engine arm is the same tier, or the
input is bounded by construction).

Two shapes are flagged over every registered twin:

  * INVERTED_ALLPAIRS — a self-equijoin of an exploded CTE on its
    unnest-of-content output column (`SELECT id, unnest(payload) AS g`
    then `ex a JOIN ex b ON a.g = b.g`): emits Σ df² rows. An unnest of
    a LITERAL list (`unnest([...])` — a fixed per-row band/bucket
    fanout) is NOT content: bucket equijoins are the scalable shape the
    doctrine asks for and pass.
  * PAIR_EXPANSION — a self-join whose ON clause carries NO cross-alias
    equality conjunct at all (pure `<` / `!=` / cross): every pair of
    the joined relation is generated. Self-joins WITH an equality
    conjunct (graph adjacency `x.dst = y.src`, pointer-doubling
    `b.v = a.l`, grid-cell equality) are standard distributed equijoins
    and pass.

Exemptions live in tools/twin_scalability_exemptions.tsv
(query<TAB>justification) — SHARED with the GateHygieneSpec mirror, so
the ledger cannot drift between the two implementations; a flagged
query is either respelled or added there with its tier bound. The
fixture corpus tools/twin_scalability_fixtures.tsv (verdict<TAB>sql) is
likewise shared: a heuristic change updates the fixtures once and both
sides re-verify.

Usage: python3 tools/audit_twin_scalability.py [--selftest] [oracle_sql.json]
  oracle_sql.json  a graft.Verify dump's twin registry (default:
                   /tmp/verify_out/oracle_sql.json)
  --selftest       check this implementation against the shared fixtures
Exit code = flagged sites / fixture disagreements (0 = clean).
Dev-only tooling — not part of the Spark library.
"""
import json
import re
import sys
from pathlib import Path

CONTENT_UNNEST = re.compile(r"\bunnest\s*\(\s*(?!\[)", re.I)
LITERAL_UNNEST = re.compile(r"\bunnest\s*\(\s*\[", re.I)
CTE_HEAD = re.compile(r"\b(\w+)\s+AS\s+(?:MATERIALIZED\s+)?\(", re.I)
# left side: table + optional alias (alias must not be a join keyword —
# `FROM e LEFT JOIN e r` has NO left alias); right side: table +
# optional alias (absent alias = the table name itself, e.g. `FROM e
# LEFT JOIN e r` left relation is addressed as `e`)
SELF_JOIN = re.compile(
    r"(?<![\w.])"
    r"(?!(?:FROM|WHERE|SELECT|AND|OR|ON|AS|WHEN|THEN|ELSE|BY|IN)\b)(\w+)"
    r"(?:\s+(?!(?:LEFT|RIGHT|FULL|OUTER|INNER|CROSS|JOIN)\b)(\w+))?"
    r"\s+(?:(?:LEFT|RIGHT|FULL|OUTER|INNER|CROSS)\s+)*JOIN\s+"
    r"(\w+)(?:\s+(?!ON\b)(\w+))?\s+ON\s+",
    re.I)
CLAUSE_END = re.compile(
    r"(?i)^(?:WHERE|GROUP\s+BY|QUALIFY|ORDER\s+BY|JOIN|LEFT|RIGHT|INNER|"
    r"CROSS|UNION|WINDOW|HAVING|LIMIT|SELECT)\b")


def cte_bodies(sql: str):
    """CTE name -> body text (balanced-paren scan; first definition wins
    so shadowing can't hide a content unnest)."""
    out = {}
    for m in CTE_HEAD.finditer(sql):
        i, depth = m.end(), 1
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        out.setdefault(m.group(1).lower(), sql[m.end():i - 1])
    return out


def on_clause(sql: str, start: int) -> str:
    """ON-condition text from `start` to the next top-level clause."""
    depth, j = 0, start
    while j < len(sql):
        c = sql[j]
        if c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                break
            depth -= 1
        elif depth == 0 and (j == start or sql[j - 1] in " \t\n\r|") and \
                CLAUSE_END.match(sql[j:]):
            break
        j += 1
    return sql[start:j]


def flagged_sites(sql: str):
    """(shape, cte, detail) for each flagged self-join in one twin."""
    ctes = cte_bodies(sql)
    out = []
    for m in SELF_JOIN.finditer(sql):
        name = m.group(1)
        a1 = m.group(2) or m.group(1)
        a2 = m.group(4) or m.group(3)
        if m.group(1).lower() != m.group(3).lower():
            continue
        on = on_clause(sql, m.end())
        body = ctes.get(name.lower(), "")
        eqs = re.findall(
            r"\b(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)", on)
        cross = [(c1, c2) for t1, c1, t2, c2 in eqs
                 if {t1, t2} == {a1, a2}]
        if not cross:
            out.append(("PAIR_EXPANSION", name,
                        " ".join(on.split())[:80]))
            continue
        if CONTENT_UNNEST.search(body) and not LITERAL_UNNEST.search(body):
            for c1, c2 in cross:
                if c1 == c2 and re.search(
                        r"\bunnest\s*\([^)]*\)\s+AS\s+" + re.escape(c1) +
                        r"\b", body, re.I):
                    out.append(("INVERTED_ALLPAIRS", name, c1))
                    break
    return out


def load_exemptions():
    path = Path(__file__).resolve().parent / \
        "twin_scalability_exemptions.tsv"
    out = {}
    for ln in path.read_text().splitlines():
        if not ln.strip() or ln.startswith("#"):
            continue
        q, reason = ln.split("\t", 1)
        out[q] = reason
    return out


def selftest() -> int:
    fixtures = Path(__file__).resolve().parent / \
        "twin_scalability_fixtures.tsv"
    bad = 0
    for ln in fixtures.read_text().splitlines():
        if not ln.strip() or ln.startswith("#"):
            continue
        verdict, sql = ln.split("\t", 1)
        got = "FLAG" if flagged_sites(sql) else "PASS"
        if got != verdict:
            bad += 1
            print(f"DISAGREE want={verdict} got={got}: {sql[:100]}")
    print(f"-- selftest: {bad} disagreement(s) over shared fixtures")
    return bad


def main():
    args = sys.argv[1:]
    if args and args[0] in ("-h", "--help"):
        sys.exit(__doc__)
    if args and args[0] == "--selftest":
        sys.exit(selftest())
    path = Path(args[0]) if args else Path("/tmp/verify_out/oracle_sql.json")
    if not path.is_file():
        sys.exit(f"error: {path} not found — run graft.Verify first or "
                 "pass an oracle_sql.json path")
    sqls = json.loads(path.read_text())
    exempt = load_exemptions()
    total = 0
    used = set()
    for q in sorted(sqls):
        sites = flagged_sites(sqls[q])
        if not sites:
            continue
        if q in exempt:
            used.add(q)
            continue
        for shape, cte, detail in sites:
            total += 1
            print(f"{q}: {shape} on {cte} ({detail})")
    for q in sorted(set(exempt) - used):
        total += 1
        where = "twin no longer flags" if q in sqls else "not in registry"
        print(f"{q}: STALE exemption ({where} — remove the ledger line)")
    print(f"-- {total} flagged site(s); {len(used)} exempt "
          f"(tools/twin_scalability_exemptions.tsv)")
    sys.exit(min(total, 125))


if __name__ == "__main__":
    main()
