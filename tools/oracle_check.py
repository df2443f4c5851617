"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given SF and compares
against oracle_sql() via DuckDB: row count, column names/order-
insensitive schema, and an order-insensitive value hash (columns sorted
by name, rows sorted, values canonicalized). Run before every commit:

    python tools/oracle_check.py [sf_dir] [query_name ...]

Two hard gates beyond the value compare:

* DuckDB runs under SET memory_limit='8GB' (DUCKDB_MEMORY_LIMIT env to
  override) so a pathological oracle — e.g. a multi-referenced CTE
  chain DuckDB would inline exponentially (the round-6 k-core ~88 GB
  lesson) — can never pass registration again.
* Spark's "No Partition Defined for Window" runtime warning is counted
  per query (stderr is redirected to a file BEFORE the JVM launches, so
  the JVM inherits the fd; per-query attribution is by file offset).
  A query that warns without a plan_audit.WINDOW_OK declaration FAILS —
  this closes the static `gwin` audit's blind spot upstream of lazy
  localCheckpoints.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_WINDOW_WARN = b"No Partition Defined for Window"


def _redirect_stderr_to_log() -> str:
    """Redirect fd 2 to a scratch file BEFORE any JVM exists so the
    child inherits it (a post-launch dup2 can't touch the JVM's
    already-copied fd); keep a dup of the original stderr for our own
    messages. Called from main() only — importing this module (e.g.
    tests/test_oracle_parity.py borrowing _canon/value_hash) must not
    hijack the caller's stderr."""
    orig = os.dup(2)
    log = tempfile.NamedTemporaryFile(
        prefix="oracle_check_stderr_", suffix=".log", delete=False)
    os.dup2(log.fileno(), 2)
    sys.stderr = os.fdopen(orig, "w", buffering=1)
    return log.name


import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from mongo_cdc_spark.io import TABLES  # noqa: E402
from mongo_cdc_spark.session import get_spark  # noqa: E402
from tools.plan_audit import WINDOW_OK  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), kind="mergesort",
                          na_position="first").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    from pandas.util import hash_pandas_object
    return str(hash_pandas_object(_canon(df), index=False).sum())


class _WarnCounter:
    """Count window warnings appended to the stderr log since the last
    call (the JVM writes to the redirected fd 2)."""

    def __init__(self, path: str) -> None:
        self._path = path
        self._pos = 0

    def drain(self) -> int:
        with open(self._path, "rb") as fh:
            fh.seek(self._pos)
            chunk = fh.read()
            self._pos = fh.tell()
        return chunk.count(_WINDOW_WARN)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    stderr_log = _redirect_stderr_to_log()
    spark = get_spark("oracle_check")
    con = duckdb.connect()
    con.sql(f"SET memory_limit='"
            f"{os.environ.get('DUCKDB_MEMORY_LIMIT', '8GB')}'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

    warns = _WarnCounter(stderr_log)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        # per-query cache isolation (round 12): the persist sweep made
        # .persist() the default materialization barrier, so a full
        # 398-query session would otherwise accumulate every query's
        # cached frames (LRU eviction keeps it correct, but the churn
        # skews timings and memory pressure late in the run — the same
        # reason bench.py clears between queries).
        spark.catalog.clearCache()
        t0 = time.time()
        warns.drain()
        try:
            sdf = fn(get_spark("oracle_check"), sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark raised {type(exc).__name__}: {exc}")
            continue
        elapsed = time.time() - t0
        n_warn = warns.drain()
        gate = ""
        if n_warn and name not in WINDOW_OK:
            failures.append(name)
            print(f"FAIL {name}: {n_warn} single-partition-window runtime "
                  "warning(s) without a plan_audit.WINDOW_OK declaration")
            continue
        if n_warn:
            gate = f", {n_warn} declared window warn(s)"
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, "
                  f"{elapsed:.1f}s{gate})")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: duckdb raised {type(exc).__name__}: {exc}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif len(sdf) == len(odf) and value_hash(sdf) != value_hash(odf):
            problems.append("value hash mismatch")
            a, b = _canon(sdf), _canon(odf)
            neq = (a.fillna("~") != b.fillna("~")).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                problems.append(f"first diff row {i}: "
                                f"spark={a.loc[i].to_dict()} "
                                f"oracle={b.loc[i].to_dict()}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name} ({len(sdf)} rows, {elapsed:.1f}s{gate})")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
