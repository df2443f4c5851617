"""Synthetic MongoDB change-stream source (Python DataSource API).

Implements Spark 4's `pyspark.sql.datasource` contracts — the same
V2 seam a real connector (mongodb, kafka) plugs into:

  - `DataSourceReader`: batch scan with explicit partition planning
    (each partition generates its deterministic slice — the moral
    equivalent of a connector splitting a collection by key range).
  - `DataSourceStreamReader`: micro-batch streaming with offset
    bookkeeping (initialOffset / latestOffset / partitions(start, end)
    / commit) — the resume-token protocol of a change stream
    (main.go:103's implicit cursor position), made durable: offsets go
    into the checkpoint, so restart resumes exactly where the stream
    stopped, which the reference explicitly does NOT do (a crash
    re-opens at "now").

Events are deterministic functions of their global index: stable ids,
round-robin insert/update/delete, two dbs × two collections — so tests
can assert exact counts and routing without any fixture file.

Rows come out as (value STRING) JSON lines, the exact shape
`parse_change_events` / the relay transform expects from any raw
source.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SOURCE_NAME = "mongo_cdc_synthetic"
_OPS = ("insert", "update", "delete")


def _event_json(i: int) -> str:
    """Deterministic change event #i (stable across retries/partitions:
    content depends only on i, never on time or randomness)."""
    op = _OPS[i % 3]
    db = "shop" if i % 2 == 0 else "crm"
    coll = "orders" if i % 4 < 2 else "users"
    ev = {
        "_id": {"_data": f"rt{i:012d}"},
        "operationType": op,
        "clusterTime": f"2024-11-08T00:{(i // 60) % 60:02d}:{i % 60:02d}Z",
        "ns": {"db": db, "coll": coll},
        "documentKey": {"_id": f"doc{i % 1000}"},
        "fullDocument": (None if op == "delete"
                         else json.dumps({"seq": i, "amt": float(i % 97)})),
    }
    return json.dumps(ev)


class _Range(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _BatchReader(DataSourceReader):
    def __init__(self, n_rows: int, n_partitions: int) -> None:
        self._n = n_rows
        self._p = max(1, n_partitions)

    def partitions(self) -> Sequence[InputPartition]:
        step = -(-self._n // self._p)  # ceil division
        return [_Range(lo, min(lo + step, self._n))
                for lo in range(0, self._n, step)]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (_event_json(i),)


class _StreamReader(DataSourceStreamReader):
    """Offset = count of events ever emitted. Each micro-batch advances
    by `rows_per_batch` up to the `total_rows` cap (a bounded stream so
    processAllAvailable() drains deterministically in tests; a live
    connector would instead report the cursor's current position)."""

    def __init__(self, rows_per_batch: int, total_rows: int,
                 n_partitions: int) -> None:
        self._per_batch = rows_per_batch
        self._total = total_rows
        self._p = max(1, n_partitions)
        self._head = 0

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # Rate limiting lives HERE: Spark plans each micro-batch as
        # [committed, latestOffset) and commits the WHOLE range, so a
        # reader must never emit less than the planned span (rows would
        # be silently skipped). The head advances per poll, monotone, so
        # after a restart it catches back up to the checkpointed offset
        # within a few polls and the stream resumes without loss.
        self._head = min(self._head + self._per_batch, self._total)
        return {"index": self._head}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["index"], end["index"]
        if hi <= lo:
            return [_Range(lo, lo)]
        step = -(-(hi - lo) // self._p)
        return [_Range(a, min(a + step, hi)) for a in range(lo, hi, step)]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (_event_json(i),)

    def commit(self, end: dict) -> None:
        # offsets live in Spark's checkpoint; nothing external to ack
        # (the reference's resume token is held only in process memory —
        # main.go:103 — which is exactly the durability gap this closes)
        pass


class SyntheticChangeStreamDataSource(DataSource):
    """`spark.read.format("mongo_cdc_synthetic")` /
    `spark.readStream.format("mongo_cdc_synthetic")`.

    Options: rows (batch size / stream cap, default 120),
    rowsPerBatch (stream micro-batch size, default 40),
    numPartitions (default 4).
    """

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(int(self.options.get("rows", 120)),
                            int(self.options.get("numPartitions", 4)))

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _StreamReader(int(self.options.get("rowsPerBatch", 40)),
                             int(self.options.get("rows", 120)),
                             int(self.options.get("numPartitions", 4)))


def register_sources(spark) -> None:
    """Idempotent registration of all custom Python data sources."""
    spark.dataSource.register(SyntheticChangeStreamDataSource)
