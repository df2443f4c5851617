"""Materialize a collection snapshot from the change stream (CDC apply).

The reference stops at relaying events to Kafka (/root/reference/
main.go:145-154); the canonical downstream — maintaining a queryable
copy of the collection — is left to Kafka Connect sinks
(docker-compose.yml:87-113). This module is that downstream, Spark-first:
latest-event-per-key reduction + partitioned upsert into a parquet
snapshot.

Scale design: the snapshot is partitioned by a key-hash bucket, and each
micro-batch rewrites ONLY the buckets it touches (dynamic partition
overwrite) — update cost is O(touched buckets × bucket size), not
O(table). Bucket count sets the rewrite granularity: more buckets =
less write amplification per batch, more small files (compact
periodically). Whole-bucket overwrite is idempotent, so checkpointed
replay of a batch converges (exactly-once table state over an
at-least-once stream).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_UPSERT_OPS = ("insert", "update", "replace")


def latest_change_per_key(events: DataFrame) -> DataFrame:
    """Reduce a batch of change events to one winner per document key:
    latest clusterTime wins, resume token (_id._data, monotone within a
    change stream) breaks clusterTime ties.

    One shuffle on the document key; row_number (not groupBy+max+join)
    keeps it a single window pass."""
    w = (Window.partitionBy(F.col("documentKey._id"))
         .orderBy(F.col("clusterTime").desc(), F.col("_id._data").desc()))
    return (events
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn"))


def apply_batch_to_snapshot(spark: SparkSession, snapshot_path: str,
                            events: DataFrame, n_buckets: int = 16) -> None:
    """Merge one batch of change events into the parquet snapshot.

    Snapshot schema: (doc_key string, doc string [JSON post-image],
    updated_at timestamp, bucket int). Deletes drop the key; upserts
    replace it. Only buckets present in the batch are rewritten
    (requires partitionOverwriteMode=dynamic, set per-write below)."""
    latest = latest_change_per_key(events).select(
        F.col("documentKey._id").alias("doc_key"),
        F.col("operationType").alias("op"),
        F.col("fullDocument").alias("doc"),
        F.col("clusterTime").alias("updated_at"),
    ).withColumn("bucket", F.pmod(F.xxhash64("doc_key"), F.lit(n_buckets))
                 .cast("int"))
    latest.persist()
    try:
        touched = [r.bucket for r in latest.select("bucket")
                   .distinct().collect()]
        if not touched:
            return
        # Probe existence explicitly instead of catching read errors:
        # a broad except here would treat ANY failure (transient IO,
        # permissions, corrupt footer) as "first batch" and skip the
        # keep-leg anti-join — the dynamic overwrite would then silently
        # drop every pre-existing document in the touched buckets. A
        # real read error must fail the batch so the streaming
        # checkpoint retries it.
        jvm = spark.sparkContext._jvm
        probe = jvm.org.apache.hadoop.fs.Path(snapshot_path)
        fs = probe.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration())
        if fs.exists(probe):
            existing = (spark.read.parquet(snapshot_path)
                        .filter(F.col("bucket").isin(touched)))
        else:  # first batch: snapshot doesn't exist yet
            existing = None
        fresh = (latest.filter(F.col("op").isin(*_UPSERT_OPS))
                 .select("doc_key", "doc", "updated_at", "bucket"))
        if existing is not None:
            keep = existing.join(
                F.broadcast(latest.select("doc_key").distinct()),
                "doc_key", "left_anti")
            # materialize BEFORE writing: the write overwrites the very
            # files `keep` reads from, so the merged frame must not be
            # lazily re-derived mid-overwrite
            fresh = keep.unionByName(fresh).localCheckpoint(eager=True)
        fresh.persist()
        try:
            (fresh.repartition("bucket")
             .write.mode("overwrite")
             .partitionBy("bucket")
             .option("partitionOverwriteMode", "dynamic")
             .parquet(snapshot_path))
            # dynamic overwrite only replaces partitions PRESENT in the
            # output — a bucket emptied by deletes writes no rows, so its
            # stale files must be removed explicitly
            nonempty = {r.bucket for r in fresh.select("bucket")
                        .distinct().collect()}
            emptied = [b for b in touched if b not in nonempty]
            if emptied:
                jvm = spark.sparkContext._jvm
                jsc = spark.sparkContext._jsc
                conf = jsc.hadoopConfiguration()
                for b in emptied:
                    p = jvm.org.apache.hadoop.fs.Path(
                        f"{snapshot_path}/bucket={b}")
                    fs = p.getFileSystem(conf)
                    if fs.exists(p):
                        fs.delete(p, True)
        finally:
            fresh.unpersist()
    finally:
        latest.unpersist()


def materialize_stream(events: DataFrame, snapshot_path: str,
                       checkpoint: str, n_buckets: int = 16) -> StreamingQuery:
    """Streaming CDC apply: change-event stream → maintained snapshot.

    foreachBatch + idempotent bucket overwrite = exactly-once table
    state; the checkpoint holds source offsets so a crash resumes
    without loss (the durability the reference lacks, main.go:95,103)."""
    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        apply_batch_to_snapshot(batch_df.sparkSession, snapshot_path,
                                batch_df, n_buckets)

    return (events.writeStream
            .foreachBatch(_apply)
            .option("checkpointLocation", checkpoint)
            .start())


def compact_snapshot(spark: SparkSession, snapshot_path: str) -> dict:
    """Compact the snapshot's small files: every micro-batch rewrite
    leaves one file per shuffle task per touched bucket, so a
    long-running apply accumulates files until scans pay per-file
    open/footer costs. Rewrites each bucket partition into ONE file
    (content-identical — same rows, same schema; hash-partitioning on
    `bucket` puts each bucket's rows in exactly one task, and the task
    count equals the live bucket count so buckets compact in parallel)
    and reports before/after file counts.

    Run periodically OUT of the hot path (e.g. from a maintenance
    trigger), like any LSM-ish store's compaction. Two hazards guarded:

    - read-overwrite: the full frame is materialized with
      localCheckpoint BEFORE the dynamic overwrite replaces the files
      it was read from (same as the apply path).
    - lost update vs a CONCURRENT apply: if a micro-batch commits to a
      bucket between this function's read and its overwrite, the
      overwrite would resurrect the pre-batch rows. So the per-bucket
      file listing (name, length, mtime) is snapshotted at read time
      and re-listed after materialization; buckets whose listing
      changed are EXCLUDED from the overwrite (dynamic overwrite only
      replaces partitions present in the output) and reported in
      `skipped_buckets` — they compact on the next pass. This shrinks
      the race to the re-list→commit window; a truly concurrent
      long-running apply should still pause around compaction (the
      skip makes a violated assumption lose compaction work, not
      data... unless a batch lands inside the residual window, which
      quiescing eliminates).

    At 100 TB scale, run it per-bucket-range to bound memory (the
    localCheckpoint holds only the buckets being compacted).
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(snapshot_path)
    fs = root.getFileSystem(conf)
    if not fs.exists(root):
        return {"files_before": 0, "files_after": 0, "buckets": 0,
                "skipped_buckets": []}

    def _listing():
        """{bucket_id: frozenset((file, len, mtime))} — identity of each
        bucket partition's current on-disk state."""
        out = {}
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not name.startswith("bucket="):
                continue
            files = frozenset(
                (f.getPath().getName(), f.getLen(),
                 f.getModificationTime())
                for f in fs.listStatus(st.getPath())
                if f.getPath().getName().endswith(".parquet"))
            out[int(name.split("=", 1)[1])] = files
        return out

    before_listing = _listing()
    before = sum(len(v) for v in before_listing.values())
    buckets = len(before_listing)
    df = (spark.read.parquet(snapshot_path)
          .repartition(max(buckets, 1), "bucket")
          .localCheckpoint(eager=True))
    after_listing = _listing()
    # compare over the UNION of bucket ids: a bucket deleted between
    # the read and the re-list (retention/cleanup) must count as
    # changed too, or the checkpointed rows would resurrect it
    changed = sorted(b for b in (set(before_listing) | set(after_listing))
                     if after_listing.get(b) != before_listing.get(b))
    if changed:  # a concurrent apply touched these — leave them alone
        df = df.filter(~F.col("bucket").isin(changed))
    (df.write.mode("overwrite")
     .partitionBy("bucket")
     .option("partitionOverwriteMode", "dynamic")
     .parquet(snapshot_path))
    after = sum(len(v) for v in _listing().values())
    return {"files_before": before, "files_after": after,
            "buckets": buckets, "skipped_buckets": changed}


# ================================================ merge-on-read (MoR)
# The copy-on-write path above (apply_batch_to_snapshot) rewrites every
# touched bucket per batch — O(bucket size) write amplification even
# for a single-row update. The merge-on-read surface below is the
# Delta/Iceberg-style alternative: a batch APPENDS an O(batch)-sized
# delta-log file plus a delete-vector file that marks superseded base
# rows dead; the read path reconstructs current state as
# (base MINUS delete-vector keys) UNION (latest delta winner per key) —
# the dv/ files supply the mask, so base masking (including VERSION AS
# OF masking) scans only the narrow (doc_key, seq, bucket) vectors,
# never the delta's doc payloads — and a periodic compaction folds
# everything back into a fresh base. Write cost per batch drops from
# O(touched buckets × bucket size) to O(batch); reads pay the resolve
# until the next compaction — the standard MoR trade.
#
# Compaction commits via VERSIONED base directories (base-1, base-2,
# ...): the new snapshot is written to a fresh base-(n+1) dir — never
# overwriting the dir it was read from — and becomes current the
# moment its _SUCCESS marker lands; old base + delta/ + dv/ deletion
# is pure cleanup AFTER that commit point. Crash mid-write leaves a
# _SUCCESS-less dir readers ignore; crash mid-cleanup leaves the old
# logs replaying onto the already-resolved new base, which is
# idempotent (the delta's winners re-mask and re-insert the identical
# rows; deletes of absent keys no-op). A legacy unversioned base/ dir
# is still honored as version 0.

MERGE_POLICIES = ("last_writer_wins", "first_writer_wins")


def resolve_current_state(base: DataFrame, delta: DataFrame,
                          policy: str = "last_writer_wins",
                          mask_keys: DataFrame | None = None) -> DataFrame:
    """Pure-frame MERGE resolution: current snapshot rows from a base
    frame (doc_key, doc, updated_at, bucket) and a delta log
    (doc_key, op, doc, updated_at, seq, bucket).

    Conflict policy picks the winning writer among delta rows for the
    same key: last_writer_wins takes the max (updated_at, seq) event
    (CDC semantics — seq is the monotone resume-token order, breaking
    clusterTime ties); first_writer_wins takes the min (the
    reject-out-of-order MERGE policy: once a key is written, stale
    writers lose). A key present in the delta ALWAYS masks its base
    row (that is the delete-vector contract); the winner's op decides
    whether a replacement row exists (upsert) or not (delete).

    mask_keys, when given, supplies the base-row mask directly — the
    file-backed read path passes the dv/ delete vectors here, whose
    (doc_key, seq, bucket) rows are exactly the delta's keys per
    commit, so masking never touches the delta's doc payload column.
    When None (pure-frame callers), the mask is derived from the
    delta itself — identical semantics.

    One shuffle on doc_key for the rank window (partitioned, bounded
    by per-key event counts); the base-side anti-join broadcasts the
    distinct masked keys (a batch is small next to the table)."""
    if policy not in MERGE_POLICIES:
        raise ValueError(f"unknown merge policy: {policy!r} "
                         f"(one of {MERGE_POLICIES})")
    order = [F.col("updated_at"), F.col("seq")]
    if policy == "last_writer_wins":
        order = [c.desc() for c in order]
    w = Window.partitionBy("doc_key").orderBy(*order)
    winners = (delta
               .withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") == 1)
               .drop("__rn"))
    mask = (mask_keys if mask_keys is not None else delta)
    survivors = base.join(
        F.broadcast(mask.select("doc_key").distinct()),
        "doc_key", "left_anti")
    fresh = (winners.filter(F.col("op").isin(*_UPSERT_OPS))
             .select("doc_key", "doc", "updated_at", "bucket"))
    return survivors.unionByName(fresh)


def merge_on_read_apply(spark: SparkSession, table_path: str,
                        events: DataFrame, batch_seq: int,
                        n_buckets: int = 16) -> None:
    """Append one batch of change events as a MoR delta commit.

    Layout under table_path: base[-N]/ (compacted snapshot, versioned
    by compaction), delta/ (append-only log of resolved per-batch
    winners), dv/ (append-only delete vector: every key the batch
    superseded, with the commit seq — the read path's base-row mask).
    Both appends are O(batch); nothing is rewritten. batch_seq must be
    monotone (foreachBatch's epoch id) — it totals-orders commits so
    replaying a checkpointed batch appends byte-identical rows that
    the seq-deduped read path collapses (idempotent).

    Commit ordering: dv BEFORE delta. A crash between the two appends
    leaves the batch's keys masked with no winners yet — interim reads
    UNDER-report (the touched rows vanish until the checkpointed
    replay re-appends both files and the dedup collapses the retry);
    the reverse order would instead DOUBLE-report (unmasked base row +
    new winner for the same key), breaking the key-uniqueness contract
    downstream consumers rely on. Replay heals either way; the chosen
    order makes the torn window's anomaly the benign one."""
    latest = latest_change_per_key(events).select(
        F.col("documentKey._id").alias("doc_key"),
        F.col("operationType").alias("op"),
        F.col("fullDocument").alias("doc"),
        F.col("clusterTime").alias("updated_at"),
        F.lit(batch_seq).cast("long").alias("seq"),
    ).withColumn("bucket", F.pmod(F.xxhash64("doc_key"),
                                  F.lit(n_buckets)).cast("int"))
    latest.persist()
    try:
        (latest.select("doc_key", "seq", "bucket")
         .write.mode("append").parquet(f"{table_path}/dv"))
        (latest.write.mode("append").parquet(f"{table_path}/delta"))
    finally:
        latest.unpersist()


_BASE_DIR_RE = re.compile(r"^base(?:-(\d+))?$")


def _base_versions(spark: SparkSession, table_path: str) -> list:
    """[(version, dirname)] of COMMITTED base snapshots, ascending.
    Legacy unversioned base/ is version 0 (written before the
    versioned-commit protocol; accepted as-is). base-N dirs count only
    once their _SUCCESS marker exists — a compaction that crashed
    mid-write leaves a marker-less dir readers must ignore."""
    jvm = spark.sparkContext._jvm
    root = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = root.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        m = _BASE_DIR_RE.match(name)
        if not m:
            continue
        if m.group(1) is None:
            out.append((0, name))
        elif fs.exists(jvm.org.apache.hadoop.fs.Path(
                f"{table_path}/{name}/_SUCCESS")):
            out.append((int(m.group(1)), name))
    return sorted(out)


def read_merge_on_read(spark: SparkSession, table_path: str,
                       policy: str = "last_writer_wins",
                       as_of: int | None = None) -> DataFrame:
    """Current state of a MoR table: base rows not masked by the dv/
    delete vectors, plus the policy-chosen winner per delta key.
    Checkpoint-replayed duplicate commits collapse because identical
    (doc_key, updated_at, seq) rows tie and row_number picks one.

    Base-row masking reads ONLY the dv/ files — narrow (doc_key, seq,
    bucket) rows, a fraction of the delta's byte size — so neither the
    current-state nor the as_of mask ever scans the delta's doc
    payloads. The base dir is the highest committed version (see
    _base_versions).

    as_of: VERSION AS OF read — reconstruct the state after commit
    seq `as_of` by filtering BOTH append-only logs (delete vectors
    make every historical snapshot free until the next compaction
    folds them away)."""
    versions = _base_versions(spark, table_path)
    base_dir = (f"{table_path}/{versions[-1][1]}" if versions
                else f"{table_path}/base")
    base = _read_or_empty(spark, base_dir,
                          "doc_key string, doc string, "
                          "updated_at timestamp, bucket int")
    delta = _read_or_empty(spark, f"{table_path}/delta",
                           "doc_key string, op string, doc string, "
                           "updated_at timestamp, seq long, bucket int")
    dv = _read_or_empty(spark, f"{table_path}/dv",
                        "doc_key string, seq long, bucket int")
    if as_of is not None:
        delta = delta.where(F.col("seq") <= as_of)
        dv = dv.where(F.col("seq") <= as_of)
    return resolve_current_state(
        base,
        delta.dropDuplicates(["doc_key", "updated_at", "seq", "op"]),
        policy, mask_keys=dv)


def compact_merge_on_read(spark: SparkSession, table_path: str,
                          policy: str = "last_writer_wins") -> dict:
    """Fold delta + dv into a FRESH versioned base (the MoR
    maintenance job), crash-safe at every step:

    1. resolve current state (reads base-N + delta + dv);
    2. write it to base-(N+1)/ — a directory that did not exist, so
       the inputs are never overwritten in place and no
       localCheckpoint guard is needed; the _SUCCESS marker Spark
       commits at the end IS the commit point (readers ignore
       marker-less dirs);
    3. cleanup: delete delta/, dv/ and every older base dir.

    A crash during (2) leaves the old base + logs fully intact; a
    crash during (3) leaves the logs replaying onto the new base,
    which is idempotent (same winners re-mask and re-insert identical
    rows), and the stale dirs are removed by the next compaction.
    Returns {'rows': n, 'base_dir': name} for the caller's
    bookkeeping."""
    old_versions = _base_versions(spark, table_path)
    state = read_merge_on_read(spark, table_path, policy)
    state = state.localCheckpoint(eager=True)  # one materialization
    n = state.count()
    next_name = (f"base-{old_versions[-1][0] + 1}" if old_versions
                 else "base-1")
    (state.repartition("bucket").write.mode("overwrite")
     .partitionBy("bucket").parquet(f"{table_path}/{next_name}"))
    # ---- committed; everything below is cleanup ----
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for sub in ("delta", "dv", *(name for _, name in old_versions)):
        p = jvm.org.apache.hadoop.fs.Path(f"{table_path}/{sub}")
        fs = p.getFileSystem(conf)
        if fs.exists(p):
            fs.delete(p, True)
    return {"rows": n, "base_dir": next_name}


def _read_or_empty(spark: SparkSession, path: str,
                   schema: str) -> DataFrame:
    """Read a parquet dir or return an empty typed frame if absent
    (same explicit existence probe as apply_batch_to_snapshot — read
    errors must raise, only absence means empty)."""
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(p):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)
