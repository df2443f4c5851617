"""Shared hardening for *generated* DuckDB oracle SQL.

DuckDB inlines every reference to a non-MATERIALIZED CTE.  For the
unrolled-iteration oracles this repo generates (k-core peeling, LPA,
PageRank, BPE merges, MMR greedy rounds, k-means steps, ...) a round-r
CTE that references round-(r-1) twice therefore expands to 2^rounds
copies of the whole upstream plan — round 6 measured the k-core oracle
at ~88 GB RSS / 12-GB-OOM from exactly this, vs 0.39 s materialized.

`materialize_multiref_ctes` rewrites a generated oracle so every CTE
referenced more than once is declared AS MATERIALIZED.  MATERIALIZED is
a pure planner fence in DuckDB — same rows, bounded memory — so the
rewrite is semantics-preserving by construction; tools/oracle_check.py
(which now runs under SET memory_limit) re-verifies every rewritten
oracle against the Spark result anyway.

Only simple `name AS (` CTE heads are rewritten.  Recursive CTEs with
column lists (`reach(doc, lab) AS (`) and named windows (`WINDOW w AS
(`) never match the pattern, and no generated oracle uses either.
"""

from __future__ import annotations

import re

# A CTE head: the keyword WITH or a top-level comma, then a bare name,
# then AS ( — optionally already MATERIALIZED.
_CTE_HEAD = re.compile(
    r"(?P<lead>\bWITH\s+|,\s*)(?P<name>\w+)\s+AS\s+(?P<mat>MATERIALIZED\s+)?\(",
    re.IGNORECASE,
)


def materialize_multiref_ctes(sql: str) -> str:
    """Add AS MATERIALIZED to every CTE referenced more than once."""
    heads = list(_CTE_HEAD.finditer(sql))
    if not heads:
        return sql
    multi = set()
    for m in heads:
        name = m.group("name")
        refs = len(re.findall(rf"\b{re.escape(name)}\b", sql)) - 1
        if refs > 1:
            multi.add(name)
    if not multi:
        return sql

    def _rewrite(m: re.Match) -> str:
        if m.group("name") in multi:
            return f"{m.group('lead')}{m.group('name')} AS MATERIALIZED ("
        return m.group(0)

    return _CTE_HEAD.sub(_rewrite, sql)
