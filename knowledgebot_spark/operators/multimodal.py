"""Multimodal columns (north star): image/audio/video as opaque BinaryType
payloads with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is stubbed
(NotImplementedError) behind ``deterministic_fake`` — but everything
Spark-side is real and tested: the BinaryType schema, the mapInPandas batch
iteration, the output schema contract, and partition-preserving execution.
A production deploy swaps ``_decode_real`` for PIL/ffmpeg calls; the plan
shape does not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "asset_id long, media_type string, byte_len int, content_md5 string, "
    "width int, height int"
)


def to_media_assets(docs: DataFrame) -> DataFrame:
    """Model documents as binary media assets: payload = utf-8 bytes of the
    text (stands in for image/audio bytes), typed metadata columns."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.expr("CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END").alias(
            "media_type"
        ),
        F.col("text").cast("binary").alias("payload"),
    )


def _decode_real(payload: bytes, media_type: str) -> tuple[int, int]:
    raise NotImplementedError(
        "real media decode requires PIL/ffmpeg (not in this container); "
        "run with deterministic_fake=True for the test harness"
    )


def _decode_fake(asset_id: int) -> tuple[int, int]:
    # deterministic fake dimensions derived from the id
    return (asset_id * 37) % 640 + 1, (asset_id * 53) % 480 + 1


def decode_meta(assets: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Feature-extract over binary payloads with mapInPandas (Arrow batch
    in, Arrow batch out).  Hashing and byte-lengths are computed from the
    real payload bytes; width/height come from the (stubbed) decoder."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [
                _decode_fake(a) if deterministic_fake else _decode_real(p, m)
                for a, p, m in zip(pdf.asset_id, pdf.payload, pdf.media_type)
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf.asset_id,
                    "media_type": pdf.media_type,
                    "byte_len": [len(p) for p in pdf.payload],
                    "content_md5": [hashlib.md5(bytes(p)).hexdigest() for p in pdf.payload],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return assets.mapInPandas(batches, schema=DECODE_SCHEMA)


def audio_window_indices(assets: DataFrame) -> DataFrame:
    """Audio windowing plumbing: one row per 1-second analysis window with a
    50% hop, computed purely from typed metadata (sample_rate, n_samples) —
    the actual PCM decode is the stubbed seam.  sequence+posexplode keeps
    the fan-out JVM-side and partition-local (no shuffle: each asset's
    windows are derived from its own row), which is the shape a real
    feature-extraction pass over 100 TB of audio needs — the expensive part
    is per-window DSP in a later mapInPandas, and this plumbing hands it
    evenly-sized Arrow batches."""
    sr = "CASE asset_id % 3 WHEN 0 THEN 16000 WHEN 1 THEN 22050 ELSE 44100 END"
    with_meta = assets.select(
        "asset_id",
        F.expr(f"CAST({sr} AS INT)").alias("sample_rate"),
        F.expr(f"CAST((asset_id * 7919) % 200000 + {sr} AS BIGINT)").alias(
            "n_samples"
        ),
    )
    return with_meta.select(
        "asset_id",
        "sample_rate",
        "n_samples",
        F.posexplode(
            F.expr(
                "sequence(CAST(0 AS BIGINT), n_samples - sample_rate, "
                "CAST(sample_rate DIV 2 AS BIGINT))"
            )
        ).alias("window_no", "start_sample"),
    ).withColumn(
        "end_sample", F.col("start_sample") + F.col("sample_rate")
    )


def resize_targets(assets_meta: DataFrame, max_side: int = 224) -> DataFrame:
    """Aspect-preserving resize planning from decoded dimensions: target
    (w, h) scaled so the longer side equals ``max_side``.  floor(x + 0.5)
    instead of round() so both engines (and any future SIMD path) agree on
    .5 ties.  Pure JVM arithmetic — the actual pixel resample happens in
    the decode seam; planning targets relationally first lets a 100 TB
    pipeline group assets by target shape and hand the GPU/UDF stage
    uniform batches."""
    # greatest(..., 1) in the denominator: 0x0 metadata (corrupt decode) is
    # legal input and ANSI mode aborts on /0 — a degenerate asset plans to
    # the 1x1 floor instead of killing the job.
    scale = F.lit(float(max_side)) / F.greatest("width", "height", F.lit(1))
    # greatest(..., 1): extreme aspect ratios (e.g. 481x1) would otherwise
    # round the short side to 0 pixels
    tgt = lambda c: F.greatest(  # noqa: E731
        F.floor(F.col(c) * scale + F.lit(0.5)).cast("int"), F.lit(1)
    )
    return assets_meta.select(
        "asset_id",
        "width",
        "height",
        tgt("width").alias("target_w"),
        tgt("height").alias("target_h"),
    )


def frame_sample_indices(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video assets: one row per sampled frame
    index (the actual frame grab is the stubbed decode)."""
    with_dur = df.withColumn(
        "duration_ms", F.expr("CAST((asset_id * 997) % 10000 + 1000 AS BIGINT)")
    )
    return with_dur.select(
        "asset_id",
        "media_type",
        "duration_ms",
        F.posexplode(F.expr(f"sequence(CAST(0 AS BIGINT), duration_ms, CAST({every_ms} AS BIGINT))")).alias(
            "frame_no", "frame_ts_ms"
        ),
    )
