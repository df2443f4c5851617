"""Multimodal plumbing tests: binary payload column, metadata struct,
mapInPandas batch shape, frame expansion, and the honest decode stub."""

from __future__ import annotations

import pandas as pd
import pytest

from mongo_cdc_spark.io import load_table
from mongo_cdc_spark.operators import multimodal


def test_decode_stub_is_honest():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_stub(b"\x89PNG")


def test_payload_schema(spark, sf_dir):
    df = multimodal.with_payload(load_table(spark, sf_dir, "documents"))
    kinds = dict(df.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<mime:string,n_bytes:int")


def test_fake_decode_matches_local_recompute(spark, sf_dir):
    got = (multimodal.multimodal_fake_decode(spark, sf_dir)
           .limit(50).toPandas().set_index("doc_id"))
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter(f"doc_id in ({','.join(map(str, got.index[:5]))})")
            .toPandas())
    for _, row in docs.iterrows():
        b = row.text.encode("utf-8")
        assert got.loc[row.doc_id, "n_bytes"] == len(b)
        expect = sum((i + 1) * v for i, v in enumerate(b)) % 1_000_000_007
        assert got.loc[row.doc_id, "checksum"] == expect


def test_fake_features_batch_shape():
    """mapInPandas contract: iterator of pdf in → iterator of pdf out,
    declared schema, one output row per input row."""
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [b"ab", b"xyz"]})
    out = list(multimodal.fake_features_batch(iter([pdf])))
    assert len(out) == 1
    assert list(out[0].columns) == ["doc_id", "n_bytes", "checksum"]
    assert out[0].n_bytes.tolist() == [2, 3]


def test_frame_sample_counts_follow_meta(spark, sf_dir):
    frames = multimodal.multimodal_frame_sample(spark, sf_dir).toPandas()
    per_doc = frames.groupby("doc_id").frame_idx.agg(["count", "min", "max"])
    assert (per_doc["min"] == 0).all()
    assert (per_doc["max"] == per_doc["count"] - 1).all()
    assert per_doc["count"].between(1, 3).all()


def test_fixture_text_ascii_for_byte_oracle(spark, sf_dir):
    """The fake-decode oracle replays the byte checksum with
    ord(substr(...)) — codepoints — so it is valid only while the
    fixture text is pure ASCII and shorter than the series cap."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    assert docs.filter(~F.col("text").rlike(r"^[\x20-\x7e]*$")).count() == 0
    assert docs.agg(F.max(F.length("text"))).first()[0] <= 2000
