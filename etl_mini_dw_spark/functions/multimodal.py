"""Multimodal-column plumbing (extension; binary payloads + typed metadata).

Treats media as opaque ``binary`` columns with typed metadata — the
schema/partitioning/batching story a 100 TB multimodal pipeline needs.
The actual codec (image decode / resize / frame-sample) is STUBBED: the
container has no media libraries, so ``decode_features`` raises
``NotImplementedError`` at the codec seam and the shipped path uses a
deterministic fake extractor. Everything Spark-side is real:

- payloads as ``binary`` (here synthesized from document text — the
  bytes are opaque to the engine either way),
- metadata computed JVM-side (byte length, content hash) — oracle-checked,
- feature extraction as ``mapInPandas`` over Arrow record batches — the
  exact UDF signature, batch shape, and schema a real decoder plugs into,
  running distributed with no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import load_table

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, fake_width int, fake_height int, fake_channels int"
)


def with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthesized binary payload column (opaque bytes)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.col("source").alias("media_source"),
    )


def payload_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side metadata over the binary column (no UDF): length + hash."""
    p = with_payload(spark, sf_dir)
    return p.select(
        "doc_id",
        F.length("payload").cast("bigint").alias("byte_len"),
        F.md5("payload").alias("content_hash"),
        "media_source",
    )


PAYLOAD_METADATA_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS content_hash,
       source AS media_source
FROM documents
"""


try:  # the container has no media libs; a cluster with PIL activates this
    import io as _io

    from PIL import Image as _PILImage  # type: ignore

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def decode_features(payload: bytes) -> tuple[int, int, int]:
    """The real-codec seam: decodes (width, height, channels) via PIL when
    it is importable; otherwise raises — callers choose the deterministic
    fake for oracle-checked paths either way."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "use fake_decode_features (deterministic stand-in) instead"
        )
    img = _PILImage.open(_io.BytesIO(payload))
    return (img.width, img.height, len(img.getbands()))


def fake_decode_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in: pseudo width/height/channels from the bytes."""
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) % 1_000_003
    return (64 + h % 1024, 64 + (h // 1024) % 1024, 1 + h % 4)


def extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches (the UDF path).

    Per-partition batch iterator — the decoder runs where the data lives;
    at scale this is the only driver-free way to run a Python/native codec.
    """
    p = with_payload(spark, sf_dir)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(fake_decode_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["payload"].map(len),
                    "fake_width": feats.map(lambda t: t[0]),
                    "fake_height": feats.map(lambda t: t[1]),
                    "fake_channels": feats.map(lambda t: t[2]),
                }
            )

    return p.mapInPandas(_extract, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes bigint, frame_hash bigint"
N_FRAMES = 4


def sample_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one payload row fans out to N evenly-spaced
    "frames" (here: deterministic byte slices standing in for decoded video
    frames — ffmpeg plugs into the slice step on a real cluster).

    The Spark mechanics are the real thing: a mapInPandas generator that
    EXPANDS rows (1 → N) inside Arrow batches, which is how a video
    pipeline turns a 100 GB shard of clips into frame rows without any
    driver involvement or exploding JVM rows carrying the full payload.
    """
    p = with_payload(spark, sf_dir)

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_hash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                step = max(n // N_FRAMES, 1)
                for i in range(N_FRAMES):
                    chunk = payload[i * step : (i + 1) * step]
                    h = 0
                    for b in chunk[:32]:
                        h = (h * 131 + b) % 1_000_003
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_hash"].append(h)
            yield pd.DataFrame(out)

    return p.mapInPandas(_frames, FRAME_SCHEMA)
