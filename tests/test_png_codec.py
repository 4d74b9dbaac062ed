"""Pure-stdlib PNG codec at the multimodal seam: real encode/decode.

Covers the roundtrip, every scanline filter type the decoder must
reverse, CRC tamper detection, and the deterministic text renderer that
feeds ``ext_multimodal_features``.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from etl_mini_dw_spark.functions.multimodal import (
    PNG_MAGIC,
    _png_chunk,
    decode_features,
    decode_png,
    encode_png_gray,
    render_text_png,
)


def _pixels(w: int, h: int) -> bytes:
    return bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))


def test_roundtrip_gray():
    px = _pixels(9, 5)  # non-square, odd stride
    png = encode_png_gray(px, 9, 5)
    info = decode_png(png)
    assert (info["width"], info["height"], info["channels"]) == (9, 5, 1)
    assert info["pixels"] == px


def _encode_with_filter(px: bytes, w: int, h: int, ftype: int) -> bytes:
    """Hand-build a grayscale PNG using one specific filter on every row."""
    rows = [px[y * w : (y + 1) * w] for y in range(h)]
    raw = bytearray()
    prev = bytes(w)
    for row in rows:
        raw.append(ftype)
        for i, v in enumerate(row):
            a = row[i - 1] if i else 0
            b = prev[i]
            c = prev[i - 1] if i else 0
            if ftype == 0:
                raw.append(v)
            elif ftype == 1:
                raw.append((v - a) & 0xFF)
            elif ftype == 2:
                raw.append((v - b) & 0xFF)
            elif ftype == 3:
                raw.append((v - ((a + b) >> 1)) & 0xFF)
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                raw.append((v - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decoder_reverses_every_filter(ftype):
    px = _pixels(8, 6)
    assert decode_png(_encode_with_filter(px, 8, 6, ftype))["pixels"] == px


def test_crc_tamper_detected():
    png = bytearray(encode_png_gray(_pixels(4, 4), 4, 4))
    png[40] ^= 0xFF  # flip a byte inside IDAT without fixing its CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))


def test_not_a_png_rejected():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"plain text payload")


def test_decode_features_uses_real_parser():
    png = render_text_png("hello multimodal")
    assert decode_features(png) == (16, 16, 1)
    # deterministic: same text, same bytes
    assert render_text_png("hello multimodal") == png
    assert render_text_png("different") != png


def test_extract_features_full_columns(spark, sf_dir):
    """The registered query projects the SQL-replayable columns; the full
    mapInPandas output (byte_len of the real PNG bytes, mean over ALL
    decoded pixels) is value-pinned here against an in-process
    render+decode of the same documents."""
    from etl_mini_dw_spark.functions.multimodal import extract_features
    from etl_mini_dw_spark.sources.tables import load_table

    got = {r["doc_id"]: r for r in extract_features(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(5).collect()
    assert docs
    for d in docs:
        png = render_text_png(d["text"])
        info = decode_png(png)
        r = got[d["doc_id"]]
        assert r["byte_len"] == len(png)
        assert r["mean_pixel"] == sum(info["pixels"]) / len(info["pixels"])
        assert r["row0_sum"] == sum(info["pixels"][: info["width"]])
        assert (r["width"], r["height"], r["channels"]) == (16, 16, 1)
