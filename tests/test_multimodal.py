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


def test_ppm_round_trip_with_header_grammar():
    """decode_ppm is a real decoder: it must round-trip encode_ppm and
    accept the full netpbm header grammar (comments, arbitrary
    whitespace) — not just the bytes our encoder happens to emit."""
    px = bytes(range(4 * 2 * 3))
    w, h, got = multimodal.decode_ppm(multimodal.encode_ppm(4, 2, px))
    assert (w, h, got) == (4, 2, px)
    # hand-built header with comments and CRLF whitespace
    hairy = b"P6 # magic\n# a comment line\n 4\t2 # dims\n255\n" + px
    assert multimodal.decode_ppm(hairy) == (4, 2, px)


@pytest.mark.parametrize("bad", [
    b"P5\n2 2\n255\n" + b"\x00" * 12,          # wrong magic
    b"P6\n2 2\n65535\n" + b"\x00" * 12,        # 16-bit maxval
    b"P6\n2 2\n255\n" + b"\x00" * 5,           # truncated pixels
    b"P6\n2",                                   # truncated header
    b"P6\n0 2\n255\n",                          # zero dimension
])
def test_ppm_rejects_malformed(bad):
    with pytest.raises(ValueError):
        multimodal.decode_ppm(bad)


@pytest.mark.parametrize("w,h", [(4, 2), (3, 3), (5, 1)])
def test_bmp_round_trip_includes_row_padding(w, h):
    """BMP rows pad to 4 bytes (width 3 and 5 exercise nonzero pad);
    decode must undo bottom-up row order and BGR channel order."""
    px = bytes((i * 7 + 3) % 256 for i in range(w * h * 3))
    assert multimodal.decode_bmp(multimodal.encode_bmp(w, h, px)) \
        == (w, h, px)


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        multimodal.decode_bmp(b"not a bmp at all")
    ok = multimodal.encode_bmp(2, 2, bytes(12))
    mangled = ok[:28] + b"\x08\x00" + ok[30:]  # bpp 24 -> 8
    with pytest.raises(ValueError):
        multimodal.decode_bmp(mangled)


def test_real_decode_matches_local_recompute(spark, sf_dir):
    """End-to-end: the graded query's means must equal a local
    decode of the same synthetic PPM for a sample of documents."""
    got = (multimodal.multimodal_real_decode(spark, sf_dir)
           .limit(5).toPandas().set_index("doc_id"))
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter(f"doc_id in ({','.join(map(str, got.index))})")
            .toPandas())
    for _, row in docs.iterrows():
        img = multimodal.ppm_from_doc_bytes(row.text.encode("utf-8"))
        w, h, px = multimodal.decode_ppm(img)
        assert (got.loc[row.doc_id, "width"],
                got.loc[row.doc_id, "height"]) == (w, h)
        assert got.loc[row.doc_id, "mean_r"] == \
            pytest.approx(sum(px[0::3]) / (w * h), abs=5e-5)


def test_fixture_text_ascii_for_byte_oracle(spark, sf_dir):
    """The fake-decode oracle replays the byte checksum with
    ord(substr(...)) — codepoints — so it is valid only while the
    fixture text is pure ASCII and shorter than the series cap."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    assert docs.filter(~F.col("text").rlike(r"^[\x20-\x7e]*$")).count() == 0
    assert docs.agg(F.max(F.length("text"))).first()[0] <= 2000


def test_jvm_payload_matches_python_encoder(spark, sf_dir):
    """The JVM-side PPM synthesis in multimodal_real_decode must build
    byte-identical payloads to ppm_from_doc_bytes (the Python twin the
    decoder round-trip tests use)."""
    from pyspark.sql import functions as F

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text").limit(20).toPandas())
    body = F.expr(
        "substring(repeat(text, cast(ceil(768 / length(text)) as int)"
        " + 1), 1, 768)")
    payload = F.concat(F.lit("P6\n16 16\n255\n"), body).cast("binary")
    got = (load_table(spark, sf_dir, "documents")
           .filter(F.col("doc_id").isin([int(i) for i in docs.doc_id]))
           .select("doc_id", payload.alias("img")).toPandas()
           .set_index("doc_id"))
    for _, r in docs.iterrows():
        expect = multimodal.ppm_from_doc_bytes(r.text.encode())
        assert bytes(got.loc[r.doc_id, "img"]) == expect


def test_audio_real_decode_matches_byte_arithmetic(spark, sf_dir):
    """The WAV path end-to-end: expected features recomputed from raw
    document bytes with explicit little-endian int16 math — no wave
    module involved — must equal the decoded output."""
    import struct

    from mongo_cdc_spark.operators.multimodal import (
        _AUD_RATE, _AUD_SAMPLES, audio_real_decode)

    got = (audio_real_decode(spark, sf_dir)
           .toPandas().set_index("doc_id"))
    docs = (load_table(spark, sf_dir, "documents")
            .filter("length(text) > 0")
            .select("doc_id", "text").collect())
    assert len(got) == len(docs)
    for r in docs:
        raw = r.text.encode()
        n = _AUD_SAMPLES * 2
        body = (raw * (n // len(raw) + 1))[:n]
        samples = struct.unpack(f"<{_AUD_SAMPLES}h", body)
        row = got.loc[r.doc_id]
        assert row.framerate == _AUD_RATE
        assert row.n_samples == _AUD_SAMPLES
        # the query rounds compared doubles to 6 dp (oracle parity);
        # a half-up round of x.xxxxxx5 sits exactly 5e-7 away, so the
        # bound is strictly above that
        assert abs(row.duration_sec - _AUD_SAMPLES / _AUD_RATE) < 6e-7
        assert abs(row.mean_amp - sum(samples) / _AUD_SAMPLES) < 6e-7
        rms = (sum(s * s for s in samples) / _AUD_SAMPLES) ** 0.5
        assert abs(row.rms - rms) < 6e-7


def test_wav_roundtrip_via_stdlib(spark):
    """encode_wav/decode_wav are mutual inverses and the JVM-side
    header literal equals the encoder's real header."""
    from mongo_cdc_spark.operators.multimodal import (
        _AUD_RATE, decode_wav, encode_wav, wav_from_doc_bytes)

    pcm = bytes(range(256)) * 2
    ch, width, rate, frames = decode_wav(encode_wav(_AUD_RATE, pcm))
    assert (ch, width, rate) == (1, 2, _AUD_RATE)
    assert frames == pcm
    clip = wav_from_doc_bytes(b"hello world")
    assert decode_wav(clip)[3][:11] == b"hello world"
    assert clip[:4] == b"RIFF" and clip[8:12] == b"WAVE"


def test_audio_resample_matches_decimated_byte_arithmetic(spark, sf_dir):
    """Decimated features recomputed from raw doc bytes with stride
    arithmetic must equal the resample operator's output."""
    import struct

    from mongo_cdc_spark.operators.multimodal import (
        _AUD_RATE, _AUD_SAMPLES, AUD_DECIM, audio_resample)

    got = (audio_resample(spark, sf_dir)
           .toPandas().set_index("doc_id"))
    docs = (load_table(spark, sf_dir, "documents")
            .filter("length(text) > 0")
            .select("doc_id", "text").collect())
    assert len(got) == len(docs)
    for r in docs:
        raw = r.text.encode()
        n = _AUD_SAMPLES * 2
        body = (raw * (n // len(raw) + 1))[:n]
        samples = struct.unpack(f"<{_AUD_SAMPLES}h", body)[::AUD_DECIM]
        m = len(samples)
        row = got.loc[r.doc_id]
        assert row.framerate == _AUD_RATE // AUD_DECIM
        assert row.n_samples == m
        assert abs(row.mean_amp - sum(samples) / m) < 6e-7
        rms = (sum(s * s for s in samples) / m) ** 0.5
        assert abs(row.rms - rms) < 6e-7


def test_ahash_from_pixels_reference():
    from mongo_cdc_spark.operators.multimodal import (
        _IMG_H, _IMG_W, ahash_from_pixels)
    # uniform raster: no block exceeds the mean -> all bits zero
    flat = bytes([7] * (_IMG_W * _IMG_H * 3))
    assert ahash_from_pixels(flat, _IMG_W, _IMG_H) == (0, 0, 0)
    # one bright 2x2 block at top-left -> exactly bit 0 set
    px = bytearray(flat)
    for y in (0, 1):
        for x in (0, 1):
            o = 3 * (y * _IMG_W + x)
            px[o:o + 3] = b"\xff\xff\xff"
    hi, lo, bits = ahash_from_pixels(bytes(px), _IMG_W, _IMG_H)
    assert (hi, lo, bits) == (0, 1, 1)
    # brightening the bottom-right block flips the highest bit (63)
    for y in (14, 15):
        for x in (14, 15):
            o = 3 * (y * _IMG_W + x)
            px[o:o + 3] = b"\xff\xff\xff"
    hi, lo, bits = ahash_from_pixels(bytes(px), _IMG_W, _IMG_H)
    assert bits == 2 and lo == 1 and hi == 1 << 31


def test_image_phash_identical_docs_share_fingerprint(spark, sf_dir):
    from mongo_cdc_spark.operators import multimodal
    got = multimodal.multimodal_image_phash(spark, sf_dir).toPandas()
    from mongo_cdc_spark.io import load_table
    docs = load_table(spark, sf_dir, "documents").toPandas()
    docs = docs[docs.text.str.len() > 0]
    assert len(got) == len(docs)
    # identical text -> identical payload -> identical fingerprint,
    # so exact-dup documents must land in the same phash group
    merged = got.merge(docs[["doc_id", "text"]], on="doc_id")
    for _, g in merged.groupby("text"):
        assert g.phash_hi.nunique() == 1 and g.phash_lo.nunique() == 1
        assert (g.dup_group_size >= len(g)).all()
    assert ((got.bits_set >= 0) & (got.bits_set <= 64)).all()


def test_audio_vad_reference_and_bounds(spark, sf_dir):
    from mongo_cdc_spark.operators import multimodal as mm
    got = mm.multimodal_audio_vad(spark, sf_dir).toPandas()
    assert (got.n_frames == mm._VAD_FRAMES).all()
    assert ((got.n_active >= 0) & (got.n_active < mm._VAD_FRAMES)).all()
    assert (got.longest_run <= got.n_active).all()
    # byte-arithmetic reference for one doc, bypassing the wave module
    from mongo_cdc_spark.io import load_table
    import struct
    doc = (load_table(spark, sf_dir, "documents").toPandas()
           .sort_values("doc_id").iloc[0])
    raw = doc.text.encode()
    n_bytes = mm._AUD_SAMPLES * 2
    body = (raw * (n_bytes // len(raw) + 1))[:n_bytes]
    samples = struct.unpack(f"<{mm._AUD_SAMPLES}h", body)
    es = [sum(s * s for s in samples[f * mm._VAD_FRAME:
                                     (f + 1) * mm._VAD_FRAME])
          for f in range(mm._VAD_FRAMES)]
    active = [e * mm._VAD_FRAMES > sum(es) for e in es]
    longest = run = 0
    for a in active:
        run = run + 1 if a else 0
        longest = max(longest, run)
    row = got[got.doc_id == doc.doc_id].iloc[0]
    assert row.n_active == sum(active)
    assert row.longest_run == longest


def test_image_patches_match_python_decode(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo_cdc_spark.operators import multimodal as mm

    got = {(r.doc_id, r.patch): (r.sum_v, r.sum_v2, r.min_v, r.max_v)
           for r in mm.multimodal_image_patches(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents") \
        .where((F.length("text") > 0) & (F.col("doc_id") < 100)) \
        .select("doc_id", "text").collect()
    assert docs
    want = {}
    for d in docs:
        raw = d.text.encode()
        body = (raw * (mm._IMG_BYTES // len(raw) + 2))[:mm._IMG_BYTES]
        for i, v in enumerate(body):
            p = i // 3
            patch = (p // mm._IMG_W // mm._PATCH) * mm._PATCH_GRID \
                + (p % mm._IMG_W) // mm._PATCH
            s = want.setdefault((d.doc_id, patch), [0, 0, 255, 0])
            s[0] += v
            s[1] += v * v
            s[2] = min(s[2], v)
            s[3] = max(s[3], v)
    assert got == {k: tuple(v) for k, v in want.items()}
    assert all(k[1] in range(16) for k in got)


def test_video_shots_match_python_decode(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo_cdc_spark.operators import multimodal as mm

    got = {r.doc_id: (r.n_shots, r.max_jump, r.first_boundary)
           for r in mm.multimodal_video_shots(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents") \
        .where((F.length("text") > 0) & (F.col("doc_id") < 100)) \
        .select("doc_id", "text").collect()
    assert docs and set(got) == {d.doc_id for d in docs}
    for d in docs:
        raw = d.text.encode()
        sums = []
        for f in range(mm._VID_FRAMES):
            sums.append(sum(raw[(f * mm._VID_STRIDE + b) % len(raw)]
                            for b in range(mm._IMG_BYTES)))
        jumps = [abs(b - a) for a, b in zip(sums, sums[1:])]
        n_shots = 1 + sum(1 for j in jumps if j > mm._SHOT_TAU)
        first = next((i + 1 for i, j in enumerate(jumps)
                      if j > mm._SHOT_TAU), -1)
        assert got[d.doc_id] == (n_shots, max(jumps), first), d.doc_id


def test_audio_spectrum_matches_direct_dft(spark, sf_dir):
    """The mapInPandas spectral signature must equal a direct DFT on
    samples reconstructed from the raw document bytes (bypassing the
    wave module entirely — the independent byte-arithmetic replay)."""
    import numpy as np

    from mongo_cdc_spark.operators import multimodal
    from mongo_cdc_spark.operators.multimodal import (_AUD_SAMPLES,
                                                      _SPEC_BINS)

    got = (multimodal.multimodal_audio_spectrum(spark, sf_dir)
           .toPandas().set_index("doc_id"))
    docs = (multimodal.load_table(spark, sf_dir, "documents")
            .filter("length(text) > 0")
            .select("doc_id", "text").toPandas())
    n = _AUD_SAMPLES
    j = np.arange(n)
    for r in docs.itertuples():
        raw = r.text.encode()
        body = (raw * (2 * n // len(raw) + 1))[:2 * n]
        s = np.frombuffer(body, dtype="<i2").astype(np.float64)
        mags = np.round(np.hypot(
            *[m @ s for m in (
                np.cos(2 * np.pi
                       * np.arange(1, _SPEC_BINS + 1)[:, None]
                       * j[None, :] / n),
                np.sin(2 * np.pi
                       * np.arange(1, _SPEC_BINS + 1)[:, None]
                       * j[None, :] / n))]), 2)
        row = got.loc[r.doc_id]
        assert row.dom_bin == int(np.argmax(mags == mags.max())) + 1
        assert abs(row.dom_mag - mags.max()) < 1e-9
        assert abs(row.sum_mag - round(float(mags.sum()), 2)) < 1e-9


def test_ssim_probe_rank_matches_direct_recompute(spark, sf_dir):
    """Top-10 SSIM scores must equal a direct byte-arithmetic SSIM
    against doc 0 computed without the wave/ppm machinery."""
    import numpy as np

    from mongo_cdc_spark.operators import multimodal
    from mongo_cdc_spark.operators.multimodal import (_IMG_BYTES,
                                                      _SSIM_C1,
                                                      _SSIM_C2)

    got = (multimodal.multimodal_ssim_probe_rank(spark, sf_dir)
           .toPandas())
    docs = (multimodal.load_table(spark, sf_dir, "documents")
            .filter("length(text) > 0")
            .select("doc_id", "text").toPandas()
            .set_index("doc_id"))

    def lum(doc_id):
        raw = docs.loc[doc_id].text.encode()
        body = (raw * (_IMG_BYTES // len(raw) + 1))[:_IMG_BYTES]
        a = np.frombuffer(body, dtype=np.uint8).astype(np.float64)
        return a[0::3] + a[1::3] + a[2::3]

    py = lum(0)
    my, syy = py.mean(), (py * py).mean()
    scores = {}
    for did in docs.index:
        if did == 0:
            continue
        y = lum(did)
        mx, sxx, sxy = y.mean(), (y * y).mean(), (y * py).mean()
        scores[did] = round(
            ((2 * mx * my + _SSIM_C1) * (2 * (sxy - mx * my) + _SSIM_C2))
            / ((mx * mx + my * my + _SSIM_C1)
               * ((sxx - mx * mx) + (syy - my * my) + _SSIM_C2)), 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got.doc_id, got.ssim)) == want
    assert (got.ssim <= 1.0).all() and (got.ssim > 0).all()


def test_audio_fingerprint_matches_python_retrieval(spark, sf_dir):
    """End-to-end independent replay: rebuild every clip from the
    document text, landmark it with numpy, score the probes and
    compare the full top-k table."""
    from collections import Counter, defaultdict

    import numpy as np

    from mongo_cdc_spark.operators.multimodal import (
        _AUD_SAMPLES, _FP_FLEN, _FP_FRAMES, _FP_PROBES, _FP_TOPK,
        _SPEC_BINS, multimodal_audio_fingerprint)

    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0).select("doc_id", "text").collect()
    j = np.arange(_FP_FLEN, dtype=np.float64)
    ks = np.arange(1, _SPEC_BINS + 1, dtype=np.float64)
    cosm = np.cos(2.0 * np.pi * ks[:, None] * j[None, :] / _FP_FLEN)
    sinm = np.sin(2.0 * np.pi * ks[:, None] * j[None, :] / _FP_FLEN)
    fps = defaultdict(list)
    for d in docs:
        raw = d.text.encode("utf-8")
        need = _AUD_SAMPLES * 2
        body = (raw * (need // len(raw) + 2))[:need]
        s = np.frombuffer(body, dtype="<i2").astype(np.float64) \
            .reshape(_FP_FRAMES, _FP_FLEN)
        doms = []
        for fr in range(_FP_FRAMES):
            mags = np.round(np.hypot(cosm @ s[fr], sinm @ s[fr]), 2)
            doms.append(int(np.argmax(mags == mags.max())) + 1)
        for fr in range(_FP_FRAMES - 1):
            fps[d.doc_id].append((fr, doms[fr] * 16 + doms[fr + 1]))
    inv = defaultdict(set)
    for did, hs in fps.items():
        for key in hs:
            inv[key].add(did)
    want = {}
    for p in range(_FP_PROBES):
        score = Counter()
        for key in fps[p]:
            for c in inv[key]:
                if c != p:
                    score[c] += 1
        top = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))
        want[p] = [(c, n, i + 1)
                   for i, (c, n) in enumerate(top[:_FP_TOPK])]
    got = multimodal_audio_fingerprint(spark, sf_dir).toPandas()
    have = defaultdict(list)
    for r in got.itertuples():
        have[int(r.probe_doc)].append(
            (int(r.cand_doc), int(r.n_matches), int(r.rank)))
    assert dict(have) == {p: v for p, v in want.items() if v}


def test_video_keyframe_matches_python_decode(spark, sf_dir):
    """Pure-Python clip rebuild + sharpness argmax for every doc."""
    from pyspark.sql import functions as F

    from mongo_cdc_spark.operators.multimodal import (
        _IMG_BYTES, _IMG_H, _IMG_W, _VID_FRAMES, _VID_STRIDE,
        multimodal_video_keyframe)

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0) & (F.col("doc_id") < 100)).select(
        "doc_id", "text").collect()
    want = {}
    for d in docs:
        raw = d.text.encode("utf-8")
        sharps = []
        for f in range(_VID_FRAMES):
            px = bytes((raw * ((_IMG_BYTES + _VID_FRAMES * _VID_STRIDE)
                               // len(raw) + 2))[
                f * _VID_STRIDE % len(raw):
                f * _VID_STRIDE % len(raw) + _IMG_BYTES])
            lum = [[sum(px[3 * (y * _IMG_W + x) + c] for c in range(3))
                    for x in range(_IMG_W)] for y in range(_IMG_H)]
            s = sum(abs(lum[y][x + 1] - lum[y][x])
                    for y in range(_IMG_H) for x in range(_IMG_W - 1))
            sharps.append(s)
        best = max(range(_VID_FRAMES),
                   key=lambda i: (sharps[i], -i))
        want[d.doc_id] = (best, sharps[best],
                          round(sum(sharps) / len(sharps), 2))
    got = multimodal_video_keyframe(spark, sf_dir).toPandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        b, s, m = want[r.doc_id]
        assert (int(r.keyframe_idx), int(r.key_sharpness)) == (b, s)
        assert abs(r.mean_sharpness - m) < 1e-6


def test_tga_decoder_flips_rows_and_swaps_bgr():
    """Hand-built 2x2 asymmetric image: decoding must both reverse
    the bottom-up rows and map BGR slots to RGB."""
    from mongo_cdc_spark.operators.multimodal import (
        decode_tga, encode_tga)

    # image-space target (top-down RGB):
    #   row0: (1,2,3) (4,5,6)     row1: (7,8,9) (10,11,12)
    # stored bottom-up + BGR: row1 first, channels reversed
    stored = bytes([9, 8, 7, 12, 11, 10,   # image row 1 as BGR
                    3, 2, 1, 6, 5, 4])     # image row 0 as BGR
    w, h, px = decode_tga(encode_tga(2, 2, stored))
    assert (w, h) == (2, 2)
    assert px == bytes(range(1, 13))

    # top-down origin bit set -> rows NOT reversed
    payload = bytearray(encode_tga(2, 2, stored))
    payload[17] = 0x20
    _, _, px2 = decode_tga(bytes(payload))
    assert px2 == bytes([7, 8, 9, 10, 11, 12, 1, 2, 3, 4, 5, 6])

    import pytest
    with pytest.raises(ValueError):
        decode_tga(encode_tga(2, 2, stored)[:10])
    rle = bytearray(encode_tga(2, 2, stored))
    rle[2] = 10   # RLE true-color type
    with pytest.raises(ValueError):
        decode_tga(bytes(rle))


def test_tga_payload_expression_matches_python_builder(spark, sf_dir):
    """The JVM-side header+cycled-body concat must produce byte-for-
    byte the payload tga_from_doc_bytes builds."""
    from pyspark.sql import functions as F

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.multimodal import (
        _IMG_BYTES, _IMG_H, _IMG_W, encode_tga, tga_from_doc_bytes)

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0).limit(20)
    body = F.expr(
        f"substring(repeat(text, cast(ceil({_IMG_BYTES} /"
        f" length(text)) as int) + 1), 1, {_IMG_BYTES})").cast("binary")
    header = F.lit(encode_tga(_IMG_W, _IMG_H, b"")[:18])
    got = {r["doc_id"]: bytes(r["img"]) for r in docs.select(
        "doc_id", F.concat(header, body).alias("img")).collect()}
    for r in docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == tga_from_doc_bytes(
            r["text"].encode("utf-8"))


def test_tga_decode_features_match_python_reference(spark, sf_dir):
    """Operator output vs a pure-Python decode of the same payloads."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.multimodal import (
        _IMG_H, _IMG_W, decode_tga, multimodal_tga_decode,
        tga_from_doc_bytes)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    got = {r["doc_id"]: r
           for r in multimodal_tga_decode(spark, sf_dir).collect()}
    half = (_IMG_H // 2) * _IMG_W * 3
    n_checked = 0
    for r in docs:
        if not r["text"]:
            continue
        w, h, px = decode_tga(
            tga_from_doc_bytes(r["text"].encode("utf-8")))
        g = got[r["doc_id"]]
        assert (g["width"], g["height"]) == (w, h) == (_IMG_W, _IMG_H)
        from decimal import ROUND_HALF_UP, Decimal

        def r4(x):   # Spark/DuckDB ROUND is HALF_UP, Python's is not
            return float(Decimal(repr(x)).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP))

        n_top = half // 3
        for i, col in enumerate(("mean_r_top", "mean_g_top",
                                 "mean_b_top")):
            want = r4(sum(px[i:half:3]) / n_top)
            assert abs(g[col] - want) < 1e-9, (r["doc_id"], col)
        assert abs(g["mean_r_full"]
                   - r4(sum(px[0::3]) / (w * h))) < 1e-9
        n_checked += 1
    assert n_checked == len(got)


def test_audio_zcr_matches_python_reference(spark, sf_dir):
    """Exact sign-flip counts through the real WAV round-trip."""
    import struct

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.multimodal import (
        _AUD_RATE, _AUD_SAMPLES, _ZCR_FRAME, _ZCR_HIGH, decode_wav,
        encode_wav, multimodal_audio_zcr)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    got = {r["doc_id"]: r
           for r in multimodal_audio_zcr(spark, sf_dir).collect()}
    nb = _AUD_SAMPLES * 2
    checked = 0
    for r in docs:
        if not r["text"]:
            continue
        # The operator's oracle SQL walks the text CHAR-indexed
        # (substr/ord) while this mirror walks it BYTE-indexed; the
        # two (and the +128 vs |128 spellings that preceded ADVICE
        # r10) coincide only while the fixture is pure ASCII — assert
        # that invariant so a future non-ASCII fixture fails loudly
        # here instead of silently diverging in the oracle.
        assert r["text"].isascii(), (
            f"doc {r['doc_id']}: ZCR mirrors assume ASCII text")
        doc = r["text"].encode("utf-8")
        pcm = bytearray((doc * (nb // len(doc) + 1))[:nb])
        # mirror the sign injection with the operator's exact
        # idempotent SET-BIT semantics (|=, not +=)
        for j in range(_AUD_SAMPLES):
            if pcm[2 * j] % 2 == 1:
                pcm[2 * j + 1] |= 128
        _, _, _, frames = decode_wav(encode_wav(_AUD_RATE, bytes(pcm)))
        s = struct.unpack(f"<{_AUD_SAMPLES}h", frames)
        cr = sum((s[i] < 0) != (s[i + 1] < 0)
                 for i in range(_AUD_SAMPLES - 1))
        neg = sum(1 for v in s if v < 0)
        hf = sum(1 for f in range(_AUD_SAMPLES // _ZCR_FRAME)
                 if sum((s[j] < 0) != (s[j + 1] < 0)
                        for j in range(f * _ZCR_FRAME,
                                       (f + 1) * _ZCR_FRAME - 1))
                 > _ZCR_HIGH)
        g = got[r["doc_id"]]
        assert g["n_crossings"] == cr
        assert abs(g["zcr_rate"] - cr / (_AUD_SAMPLES - 1)) < 1e-6
        assert abs(g["neg_fraction"] - neg / _AUD_SAMPLES) < 1e-6
        assert g["high_zcr_frames"] == hf
        checked += 1
    assert checked == len(got)


def test_otsu_matches_python_reference(spark, sf_dir):
    """Exhaustive 0..255 threshold search vs the operator's
    observed-levels argmax — they must agree, proving the
    observed-level restriction loses nothing."""
    from collections import Counter

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.multimodal import (
        decode_ppm, multimodal_image_otsu, ppm_from_doc_bytes)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    got = {r["doc_id"]: r
           for r in multimodal_image_otsu(spark, sf_dir).collect()}
    checked = 0
    for r in docs:
        if not r["text"]:
            continue
        w, h, px = decode_ppm(
            ppm_from_doc_bytes(r["text"].encode("utf-8")))
        grays = [(px[3 * p] + px[3 * p + 1] + px[3 * p + 2]) // 3
                 for p in range(w * h)]
        hist = Counter(grays)
        nt = len(grays)
        st = sum(grays)
        best = (-1.0, None)
        cn = cs = 0
        for g in range(256):      # exhaustive, includes unobserved
            cn += hist.get(g, 0)
            cs += g * hist.get(g, 0)
            if cn == 0 or cn == nt:
                score = 0.0
            else:
                score = (cs * nt - cn * st) ** 2 / (cn * (nt - cn))
            if score > best[0] and g in hist:
                best = (score, g, cn)
            elif best[1] is None and g in hist:
                best = (score, g, cn)
        score, t, cn_at = best
        gg = got[r["doc_id"]]
        assert gg["otsu_threshold"] == t, r["doc_id"]
        assert abs(gg["foreground_frac"] - (nt - cn_at) / nt) < 1e-6
        assert abs(gg["between_var"] - round(score / (nt * nt), 4)) \
            < 1e-6
        checked += 1
    assert checked == len(got)


def test_equalize_matches_pixelwise_python(spark, sf_dir):
    """Per-pixel histogram equalization through the real encode/decode
    round-trip must reproduce the operator's histogram-level stats —
    proving the remap is the true pixel transform, including the
    full-range-stretch property (min 0 / max 255 for >1 level)."""
    from collections import Counter

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.multimodal import (
        _IMG_BYTES, _IMG_H, _IMG_W, decode_ppm,
        multimodal_image_equalize)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    got = {r.doc_id: r for r in
           multimodal_image_equalize(spark, sf_dir).collect()}
    header = f"P6\n{_IMG_W} {_IMG_H}\n255\n".encode()
    checked = 0
    for r in docs:
        if not r.text:
            continue
        doc = r.text.encode("utf-8")
        body = (doc * (_IMG_BYTES // len(doc) + 1))[:_IMG_BYTES]
        w, h, px = decode_ppm(header + body)
        grays = [(px[3 * p] + px[3 * p + 1] + px[3 * p + 2]) // 3
                 for p in range(w * h)]
        hist = Counter(grays)
        npix = len(grays)
        cdf, acc = {}, 0
        for g_ in sorted(hist):
            acc += hist[g_]
            cdf[g_] = acc
        cmin = min(cdf.values())
        def remap(g_):
            if npix == cmin:
                return 0
            return (cdf[g_] - cmin) * 255 // (npix - cmin)
        eq = [remap(g_) for g_ in grays]
        g = got[r.doc_id]
        # Spark/DuckDB ROUND is half-up; Python round() is banker's
        # (and 34024/256 = 132.90625 really occurs) — quantize the
        # exact rational with HALF_UP instead
        from decimal import ROUND_HALF_UP, Decimal
        q = Decimal("0.0001")

        def r4x(num: int) -> float:
            return float((Decimal(num) / Decimal(npix))
                         .quantize(q, rounding=ROUND_HALF_UP))
        assert g.n_levels == len(hist)
        assert abs(g.mean_gray - r4x(sum(grays))) < 1e-9
        assert abs(g.mean_eq - r4x(sum(eq))) < 1e-9
        assert (g.min_eq, g.max_eq) == (min(eq), max(eq))
        if len(hist) > 1:
            assert (g.min_eq, g.max_eq) == (0, 255)
        checked += 1
    assert checked == len(got)
