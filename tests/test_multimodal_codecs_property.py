"""Property tests for the pure-stdlib media codecs in
operators/multimodal.py (PPM/BMP/TGA/WAV).

These are hand-rolled binary parsers on the engine's REAL decode path
(the mapInPandas feature extractors call them per payload), so they get
the classic codec treatment: for ANY pixels/samples, encode→decode is
the identity; header-grammar freedoms the spec allows (PPM comments and
whitespace runs, BMP top-down negative height, the TGA origin bit, a
TGA id field) decode to the same raster; malformed inputs raise
ValueError rather than returning garbage bytes. Pure Python — no Spark
session — so the whole file runs in seconds and exercises exactly the
per-task code 100 TB of payloads would hit.
"""

from __future__ import annotations

import struct

import pytest

from mongo_cdc_spark.operators.multimodal import (
    decode_bmp, decode_ppm, decode_tga, decode_wav,
    encode_bmp, encode_ppm, encode_tga, encode_wav,
)

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


def _rgb(w: int, h: int, seed: int) -> bytes:
    """Deterministic pseudo-random raster (any byte value 0..255)."""
    n = w * h * 3
    return bytes((seed * 2654435761 + i * 40503) % 256 for i in range(n))


if HAVE_HYPOTHESIS:
    _dims = st.tuples(st.integers(min_value=1, max_value=9),
                      st.integers(min_value=1, max_value=9),
                      st.integers(min_value=0, max_value=10**6))

    @settings(max_examples=50, deadline=None)
    @given(_dims)
    def test_ppm_roundtrip_property(whs):
        w, h, seed = whs
        px = _rgb(w, h, seed)
        assert decode_ppm(encode_ppm(w, h, px)) == (w, h, px)

    @settings(max_examples=50, deadline=None)
    @given(_dims)
    def test_bmp_roundtrip_property(whs):
        """Covers every row-padding class (w mod 4 in 0..3) and the
        BGR swap + bottom-up flip."""
        w, h, seed = whs
        px = _rgb(w, h, seed)
        assert decode_bmp(encode_bmp(w, h, px)) == (w, h, px)

    @settings(max_examples=50, deadline=None)
    @given(_dims)
    def test_tga_roundtrip_property(whs):
        """decode_tga returns top-down RGB; feed it the bottom-up BGR
        raster that encodes the same top-down RGB image."""
        w, h, seed = whs
        rgb_topdown = _rgb(w, h, seed)
        rows = [rgb_topdown[r * w * 3:(r + 1) * w * 3] for r in range(h)]
        bgr_bottomup = b"".join(
            b"".join(bytes((row[p + 2], row[p + 1], row[p]))
                     for p in range(0, w * 3, 3))
            for row in reversed(rows))
        assert decode_tga(encode_tga(w, h, bgr_bottomup)) == \
            (w, h, rgb_topdown)

    @settings(max_examples=50, deadline=None)
    @given(st.integers(min_value=1, max_value=192000),
           st.binary(max_size=256).filter(lambda b: len(b) % 2 == 0))
    def test_wav_roundtrip_property(rate, pcm):
        assert decode_wav(encode_wav(rate, pcm)) == (1, 2, rate, pcm)


def test_ppm_header_grammar_freedoms():
    """Comments and whitespace runs anywhere tokens may appear decode
    to the same raster as the canonical header."""
    w, h = 3, 2
    px = _rgb(w, h, 7)
    canonical = decode_ppm(encode_ppm(w, h, px))
    liberal = (b"P6 # trailing comment\n"
               b"# full-line comment\n"
               b"  3 \t\n# again\n 2\r\n  255\n" + px)
    assert decode_ppm(liberal) == canonical
    # maxval is followed by exactly ONE whitespace byte; a pixel body
    # whose first byte is whitespace-valued must survive that rule
    tricky_px = b"\n " + px[2:]
    assert decode_ppm(encode_ppm(w, h, tricky_px)) == (w, h, tricky_px)


def test_bmp_topdown_negative_height():
    """Negative biHeight means top-down row order per the DIB spec —
    same decoded raster as the bottom-up encoding of the same image."""
    w, h = 5, 3  # w=5 -> row stride padded 15 -> 16
    px = _rgb(w, h, 11)
    row_pad = (-w * 3) % 4
    body = b"".join(
        b"".join(bytes((px[(y * w + x) * 3 + 2],
                        px[(y * w + x) * 3 + 1],
                        px[(y * w + x) * 3]))
                 for x in range(w)) + b"\x00" * row_pad
        for y in range(h))  # natural top-down order
    pixel_offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pixel_offset + len(body),
                         0, 0, pixel_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    assert decode_bmp(header + info + body) == (w, h, px)
    assert decode_bmp(encode_bmp(w, h, px)) == (w, h, px)


def test_tga_origin_bit_and_id_field():
    """descriptor bit 5 set = top-down rows (no flip), and a non-zero
    id-length field skips the id bytes before the raster."""
    w, h = 4, 2
    rgb_topdown = _rgb(w, h, 13)
    bgr_topdown = b"".join(
        bytes((rgb_topdown[i + 2], rgb_topdown[i + 1], rgb_topdown[i]))
        for i in range(0, w * h * 3, 3))
    hdr = bytes([5, 0, 2]) + bytes(9) + bytes([
        w & 0xFF, w >> 8, h & 0xFF, h >> 8, 24, 0x20])
    payload = hdr + b"IDFLD" + bgr_topdown
    assert decode_tga(payload) == (w, h, rgb_topdown)


@pytest.mark.parametrize("mutate, exc_match", [
    (lambda b: b"P5" + b[2:], "magic"),                    # wrong magic
    (lambda b: b[:-1], "truncated pixel"),                 # short raster
    (lambda b: b.replace(b"255\n", b"999\n", 1), "maxval"),
])
def test_ppm_malformed_raises(mutate, exc_match):
    good = encode_ppm(2, 2, _rgb(2, 2, 3))
    with pytest.raises(ValueError, match=exc_match):
        decode_ppm(mutate(good))


def test_bmp_malformed_raises():
    good = encode_bmp(2, 2, _rgb(2, 2, 5))
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + good[2:])
    with pytest.raises(ValueError, match="unsupported BMP"):
        # flip bpp 24 -> 8 at offset 28
        decode_bmp(good[:28] + struct.pack("<H", 8) + good[30:])
    with pytest.raises(ValueError, match="truncated BMP"):
        decode_bmp(good[:-4])


def test_tga_malformed_raises():
    w, h = 2, 2
    good = encode_tga(w, h, bytes(w * h * 3))
    with pytest.raises(ValueError, match="type 2"):
        decode_tga(good[:2] + bytes([10]) + good[3:])  # RLE type
    with pytest.raises(ValueError, match="24-bit"):
        decode_tga(good[:16] + bytes([32]) + good[17:])
    with pytest.raises(ValueError, match="truncated TGA"):
        decode_tga(good[:-1])
    with pytest.raises(ValueError, match="short TGA"):
        decode_tga(good[:10])
