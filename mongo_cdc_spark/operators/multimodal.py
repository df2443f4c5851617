"""Multimodal column handling (SURVEY.md §2.3): opaque binary payloads
with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the actual decode is
STUBBED (decode_image_stub raises NotImplementedError; the deterministic
fake used by tests/queries is byte-level arithmetic) — but everything
Spark-side is real and tested: the binary column schema, the metadata
struct, the mapInPandas batch iteration, the per-row frame expansion.

The fixture has no binary table, so payloads are derived from
documents.text (UTF-8 bytes) — exactly how a real pipeline would treat
an undecoded blob column.

Scale: binary payloads never enter a shuffle here — metadata is
extracted in a narrow map stage and only the (id, small-metadata) rows
move. That is the rule for 100 TB multimodal data: shuffle metadata,
never media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_cdc_spark.io import load_table
from mongo_cdc_spark.operators import make_registry

QUERIES, ORACLE, query = make_registry()


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + typed metadata struct — the
    canonical multimodal column layout (payload BINARY, meta STRUCT)."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length("text").alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes) -> object:
    """Real decode would go through PIL/ffmpeg — not in this container.

    Kept as an explicit stub so the pipeline shape is honest; swap in a
    real codec by replacing this one function.
    """
    raise NotImplementedError(
        "image/audio codecs not available in this environment; "
        "use fake_features_batch for deterministic plumbing tests")


def fake_features_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for decode/feature-extract: per payload,
    byte length and a rolling byte checksum. mapInPandas signature,
    Arrow batches in/out — the real decoder drops into this exact shape.
    """
    for pdf in it:
        payloads = pdf["payload"]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": payloads.map(len).astype("int64"),
            "checksum": payloads.map(
                lambda b: sum((i + 1) * v for i, v in enumerate(b))
                % 1_000_000_007).astype("int64"),
        })


@query("multimodal_payload_meta", sql="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           substring(md5(text), 1, 16) AS payload_fp
    FROM documents
    ORDER BY doc_id
""")
def multimodal_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata extraction from the binary payload column — pure
    built-ins (octet_length, md5) on the binary type; no Python."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(
            "doc_id",
            F.col("meta.n_bytes").alias("n_bytes"),
            F.substring(F.md5("payload"), 1, 16).alias("payload_fp"))
        .orderBy("doc_id")
    )


@query("multimodal_frame_sample", sql="""
    WITH meta AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS INT) % 3 + 1 AS n_frames
      FROM documents
    )
    SELECT doc_id, CAST(g.i AS INT) AS frame_idx
    FROM meta, generate_series(0, 3) g(i)
    WHERE g.i < n_frames
    ORDER BY doc_id, frame_idx
""")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: expand each media payload into its
    sampled frame indices (count derived from metadata — deterministic
    stand-in for a container-duration probe). posexplode-style row
    expansion, the exact shape video frame-sampling takes at scale."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    n_frames = (F.col("meta.n_bytes") % 3 + 1)
    return (
        docs.select("doc_id", n_frames.alias("n_frames"))
        .select("doc_id",
                F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1))
                 .alias("frame_idx"))
        .orderBy("doc_id", "frame_idx")
    )


@query("multimodal_fake_decode", sql="""
    SELECT d.doc_id,
           CAST(MIN(octet_length(encode(d.text))) AS BIGINT) AS n_bytes,
           CAST(SUM(g.i * ord(substr(d.text, CAST(g.i AS INT), 1)))
                % 1000000007 AS BIGINT) AS checksum
    FROM documents d, generate_series(1, 2000) g(i)
    WHERE g.i <= len(d.text)
    GROUP BY d.doc_id
    ORDER BY d.doc_id
""")
def multimodal_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow
    batches, partition-parallel). The checksum stands in for an image
    feature vector; schema/batching/partitioning are the real thing.

    Oracle: the deterministic fake feature (positional byte checksum
    mod 1e9+7) is byte-arithmetic, and the fixture text is pure ASCII
    (asserted in tests/test_multimodal.py), so octet==codepoint and
    DuckDB replicates it exactly with ord(substr(...)) — the Arrow UDF
    path gets a true hash-match check, not a rows-only one."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    # repartition so decode parallelism isn't bound to input splits —
    # media decode is CPU-bound, so every core should hold a batch
    n = spark.sparkContext.defaultParallelism
    feats = docs.select("doc_id", "payload").repartition(n).mapInPandas(
        fake_features_batch, schema="doc_id long, n_bytes long, checksum long")
    return feats.orderBy("doc_id")
