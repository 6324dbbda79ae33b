"""Multimodal columns: opaque binary payloads with typed metadata, plus
decode / feature-extract / frame-sample plumbing.

SURVEY.md §2.11 + BASELINE.json north-star ("multimodal columns").

Model: one row = one entity; media lives in a BinaryType column next to
typed metadata columns (format, n_frames, …).  The fixtures carry no real
media, so payloads are derived deterministically from document text
(UTF-8 bytes) — the *Spark plumbing* (BinaryType schema, Arrow batch
shape through mapInPandas, partitioning, metadata joins) is real and
tested; the pixel/sample decoding itself is a clearly-marked STUB
(`_decode_image_stub`) because no image/audio libs exist in this
container.  Swapping the stub for PIL/librosa changes no plan shape.

Scale posture: media bytes never enter a shuffle — every operator either
processes them map-side (mapInPandas) or drops them before any groupBy/
join; only extracted features and metadata flow downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def _with_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthetic binary payload column (UTF-8 text bytes) and
    typed media metadata derived deterministically from the row."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("n_chars") % 30 + 1).cast("int").alias("n_frames"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
    )


@register(
    "mm01_binary_columns",
    oracle="""
        SELECT
            doc_id,
            octet_length(encode(text)) AS n_bytes,
            md5(text) AS content_md5,
            n_chars % 30 + 1 AS n_frames
        FROM documents
    """,
    doc="BinaryType column basics: byte length + content digest over the "
    "payload, typed frame-count metadata.  Binary stays map-side; only "
    "scalars emerge.",
)
def mm01_binary_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _with_binary(spark, sf_dir)
    return b.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.col("n_frames").cast("long").alias("n_frames"),
    )


@register(
    "mm02_frame_sample",
    oracle="""
        SELECT
            doc_id,
            unnest(generate_series(0, n_chars % 30, 5)) AS frame_idx
        FROM documents
    """,
    doc="Frame sampling: every 5th frame index per media row via the "
    "sequence() generator — pure Catalyst, no decode needed; the decode "
    "of *selected* frames happens later in mm03's batch kernel (sample-"
    "then-decode ordering is the 100 TB-friendly direction).",
)
def mm02_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _with_binary(spark, sf_dir)
    return b.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(5))).alias("frame_idx"),
    ).select("doc_id", F.col("frame_idx").cast("long").alias("frame_idx"))


def _decode_image_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB decoder — deterministic fake standing in for PIL/libav.

    A real deployment replaces this body with e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # real decode
        return img.width, img.height, np.asarray(img).mean()

    The fake derives (width, height, mean_intensity) from the payload
    bytes so the full pipeline stays testable and deterministic.
    """
    w = 16 + payload[0] % 64 if payload else 16
    h = 16 + payload[-1] % 64 if payload else 16
    mean = (sum(payload[:256]) / min(len(payload), 256)) if payload else 0.0
    return w, h, round(mean, 6)


def _decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        decoded = [_decode_image_stub(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "mean_intensity": [d[2] for d in decoded],
            }
        )


@register(
    "mm03_decode_features",
    oracle=None,  # decode is a stubbed media kernel — rows-only; the
    # Arrow plumbing (binary in, features out) is what's under test.
    doc="Media decode + feature extraction through mapInPandas: binary "
    "payloads enter the Python worker as Arrow batches, fixed-schema "
    "features (width/height/mean_intensity) come out; decode itself is "
    "the documented STUB (_decode_image_stub).",
)
def mm03_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _with_binary(spark, sf_dir)
    return b.select("doc_id", "media_type", "payload").mapInPandas(
        _decode_batch,
        schema="doc_id long, media_type string, width int, height int, mean_intensity double",
    )


@register(
    "mm04_media_stats",
    oracle="""
        SELECT
            CASE
                WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4'
            END AS media_type,
            count(*) AS n_media,
            CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
            max(n_chars % 30 + 1) AS max_frames
        FROM documents
        GROUP BY 1
    """,
    doc="Media catalog stats by type: counts, byte volumes, frame "
    "maxima — metadata-only aggregation (payload pruned before the "
    "shuffle; ReadSchema never includes it).",
)
def mm04_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _with_binary(spark, sf_dir)
    return b.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
        F.max("n_frames").cast("int").alias("max_frames"),
    )
