"""Kafka stand-in streaming sink (Python DataSource API,
`DataSourceStreamWriter`) — the WRITE-side twin of cdc_source.py.

The reference's sink is a confluent-kafka producer with acks=all,
retries=5, and a delivery-report loop (/root/reference/main.go:39-62,
145-154). No broker exists in this sandbox, so the sink contract is
exercised through Spark's real V2 writer seam instead: the SAME
two-phase commit protocol a Kafka/Iceberg/Delta streaming sink
implements, against topic-partitioned files.

Protocol (exactly Spark's DataSourceStreamWriter contract):

  - `write(iterator)` runs per task on executors: records append to a
    STAGING file keyed by a random token (never visible to readers),
    and the returned `WriterCommitMessage` carries the staged file
    name plus per-topic counts.
  - `commit(messages, batchId)` runs once on the driver after ALL
    tasks succeed: staged files are atomically renamed into
    `committed/batch=<id>/` and a `_commits/<id>.json` manifest is
    written LAST — readers treat the manifest as the only source of
    truth, so a crash mid-promotion leaves at worst invisible
    orphans, never torn output. The manifest records per-topic
    delivered counts: the batch-level analog of the reference's
    delivery-report monitor (main.go:50-62).
  - A replayed batch (restart after Spark's checkpoint recorded the
    epoch but before/after our manifest) is detected by the existing
    manifest: commit() becomes a no-op that discards the duplicate
    staging — at-least-once delivery from the engine turns into
    exactly-once committed output, which is precisely what the
    reference CANNOT do (its producer retries can duplicate,
    main.go:44-46).
  - `abort(messages, batchId)` deletes whatever staging it can see;
    uncommitted staging is invisible to readers either way.

Records are (topic STRING, key BINARY, value BINARY) — the relay
shape from cdc.transform.to_kafka_records. Staged files are JSONL
with base64-encoded bytes (self-describing, append-only).

At scale: write() is embarrassingly parallel per task and never
coordinates; the driver-side commit touches only file RENAMES +
one manifest (metadata-sized, like a Delta commit). Topic fan-out
happens inside each task's file (one staged file per task, not per
topic) so a 10k-topic relay does not create 10k files per task.
"""

from __future__ import annotations

import base64
import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

SINK_NAME = "kafka_stub_sink"


@dataclass
class _TaskCommit(WriterCommitMessage):
    staged: str = ""
    counts: dict = field(default_factory=dict)


class _StubStreamWriter(DataSourceStreamWriter):
    def __init__(self, path: str, options: dict) -> None:
        if not path:
            raise ValueError(f"{SINK_NAME} requires a 'path' option")
        self._base = path
        # accepted for parity with the reference's producer config
        # (main.go:39-47); recorded into every manifest for audit
        self._acks = options.get("acks", "all")
        self._retries = int(options.get("retries", "5"))

    # -- executor side ------------------------------------------------
    def write(self, iterator: Iterator) -> _TaskCommit:
        staging = os.path.join(self._base, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = f"task-{uuid.uuid4().hex}.jsonl"
        tmp = os.path.join(staging, name)
        counts: dict[str, int] = {}
        with open(tmp, "w") as f:
            for row in iterator:
                key = row.key if isinstance(row.key, (bytes, bytearray)) \
                    else str(row.key).encode()
                val = row.value if isinstance(row.value,
                                              (bytes, bytearray)) \
                    else str(row.value).encode()
                f.write(json.dumps({
                    "topic": row.topic,
                    "key": base64.b64encode(bytes(key)).decode(),
                    "value": base64.b64encode(bytes(val)).decode(),
                }) + "\n")
                counts[row.topic] = counts.get(row.topic, 0) + 1
        return _TaskCommit(staged=name, counts=counts)

    # -- driver side --------------------------------------------------
    def _manifest_path(self, batch_id: int) -> str:
        return os.path.join(self._base, "_commits", f"{batch_id}.json")

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        staging = os.path.join(self._base, "_staging")
        manifest = self._manifest_path(batchId)
        if os.path.exists(manifest):
            # replayed epoch: the batch is already committed — drop the
            # duplicate staging so redelivery is invisible (exactly-once)
            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(staging, m.staged))
                    except FileNotFoundError:
                        pass
            return
        batch_dir = os.path.join(self._base, "committed",
                                 f"batch={batchId}")
        os.makedirs(batch_dir, exist_ok=True)
        totals: dict[str, int] = {}
        files = []
        for m in messages:
            if m is None:
                continue
            os.replace(os.path.join(staging, m.staged),
                       os.path.join(batch_dir, m.staged))
            files.append(m.staged)
            for t, c in m.counts.items():
                totals[t] = totals.get(t, 0) + c
        os.makedirs(os.path.dirname(manifest), exist_ok=True)
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batchId, "files": sorted(files),
                       "delivered_per_topic": totals,
                       "acks": self._acks, "retries": self._retries}, f)
        os.replace(tmp, manifest)  # manifest appears atomically, LAST
        # Orphan sweep: the micro-batch engine runs ONE epoch at a time
        # per query, so any file still staged after this batch's
        # messages were promoted belongs to a task attempt that failed
        # before returning a commit message (speculative/retried task).
        # Readers never see staging (manifest-only), so this is disk
        # hygiene, not correctness.
        for leftover in (os.listdir(staging)
                         if os.path.isdir(staging) else ()):
            try:
                os.remove(os.path.join(staging, leftover))
            except FileNotFoundError:
                pass

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        staging = os.path.join(self._base, "_staging")
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(staging, m.staged))
                except FileNotFoundError:
                    pass


class KafkaStubSink(DataSource):
    """`.writeStream.format("kafka_stub_sink").option("path", dir)`"""

    @classmethod
    def name(cls) -> str:
        return SINK_NAME

    def streamWriter(self, schema, overwrite: bool) -> _StubStreamWriter:
        return _StubStreamWriter(self.options.get("path", ""),
                                 dict(self.options))


def read_committed(base: str) -> list[dict]:
    """Reader half for tests/audit: every record of every COMMITTED
    batch (manifest-listed files only), with bytes decoded."""
    out: list[dict] = []
    commits_dir = os.path.join(base, "_commits")
    if not os.path.isdir(commits_dir):
        return out
    for mf in sorted(os.listdir(commits_dir)):
        if not mf.endswith(".json"):
            continue
        with open(os.path.join(commits_dir, mf)) as f:
            man = json.load(f)
        bdir = os.path.join(base, "committed", f"batch={man['batch_id']}")
        for name in man["files"]:
            with open(os.path.join(bdir, name)) as f:
                for line in f:
                    r = json.loads(line)
                    out.append({
                        "batch_id": man["batch_id"],
                        "topic": r["topic"],
                        "key": base64.b64decode(r["key"]),
                        "value": base64.b64decode(r["value"]),
                    })
    return out
