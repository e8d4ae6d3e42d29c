"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The actual media decode (PIL/librosa/ffmpeg) is NOT available in this
container, so the decode step is STUBBED: ``decode_image`` raises
NotImplementedError unless a decoder import succeeds, and the feature
extractors below compute deterministic byte-level features instead —
which keeps the Spark-side plumbing (schema, partition shape, UDF
signature, Arrow batch flow) real and testable. Swap ``_fake_decode``
for a real decoder on a cluster with the media libs installed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qsvspark.functions.dedup import hash60

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def media_hash(seed: int, rid: Column, tag: str, extra: Column | None = None) -> Column:
    """Cross-engine 60-bit hash for media synthesis: md5-60 over a
    '|'-joined key. DuckDB reproduces it exactly (see dedup.hash60), which
    is what makes the multimodal driver queries fully value-oracle-checked
    — the payload bytes, kinds, and metadata are all pure functions of
    media_id through this hash."""
    parts = [F.lit("mm"), F.lit(str(seed)), rid.cast("string"), F.lit(tag)]
    if extra is not None:
        parts.append(extra.cast("string"))
    return hash60(F.concat_ws("|", *parts))


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-random
    bytes (a pure function of media_id through the md5-60 hash family —
    same determinism trick as synth_tokens, but externally reproducible)."""
    rid = F.col("id")
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(media_hash(seed, rid, "kind"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.unhex(
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.lpad(
                    F.hex(F.pmod(media_hash(seed, rid, "b", i), F.lit(256))),
                    2, "0",
                ),
            ),
        )
    )
    meta = F.struct(
        (F.pmod(media_hash(seed, rid, "w"), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(media_hash(seed, rid, "h"), F.lit(1080)) + 1).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(media_hash(seed, rid, "nf"), F.lit(300)) + 1).cast("int").alias("n_frames"),
        F.lit("raw").alias("codec"),
    )
    return spark.range(n).select(
        rid.alias("media_id"), kinds.alias("kind"),
        payload.alias("payload"), meta.alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real image decode requires PIL, absent in this container."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs PIL — install pillow on the cluster; "
            "this sandbox uses byte-level fake features instead"
        ) from e


_FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, byte_mean double, "
    "byte_hist array<int>, aspect_ratio double"
)


def extract_features(df: DataFrame, hist_bins: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    The per-batch body is vectorized numpy over the byte buffers (a stand-
    in for the real decode+embed); partitioning, batch shape, and output
    schema are exactly what a real extractor would use."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            arrs = [np.frombuffer(p, dtype=np.uint8) if p is not None else np.array([], np.uint8)
                    for p in payloads]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(a) for a in arrs],
                    "byte_mean": [float(a.mean()) if len(a) else 0.0 for a in arrs],
                    "byte_hist": [
                        np.histogram(a, bins=hist_bins, range=(0, 256))[0].astype("int32").tolist()
                        if len(a) else [0] * hist_bins
                        for a in arrs
                    ],
                    # full precision — callers round; Python's half-even
                    # round() would diverge from engine HALF_UP rounding
                    "aspect_ratio": [
                        w / h if (w and h) else None
                        for w, h in zip(pdf["meta"].map(lambda m: m["width"] if m is not None else None),
                                        pdf["meta"].map(lambda m: m["height"] if m is not None else None))
                    ],
                }
            )
            yield out

    return df.mapInPandas(batches, schema=_FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling stand-in: slice the payload into n_frames
    chunks and keep every Nth — real plumbing (explode → one row per
    sampled frame), fake decode. Native expressions, no Python."""
    video = df.filter(F.col("kind") == "video")
    n_frames = F.col("meta.n_frames")
    frame_idx = F.filter(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: i % every_n == 0,
    )
    exploded = video.select(
        "media_id",
        F.explode(frame_idx).alias("frame_no"),
        F.length("payload").alias("__plen"),
        n_frames.alias("__nf"),
    )
    # deterministic fake frame fingerprint from (media_id, frame_no) —
    # md5-60 so an external engine can verify every fingerprint
    return exploded.select(
        "media_id", "frame_no",
        hash60(
            F.concat_ws(
                "|", F.lit("fp"), F.col("media_id").cast("string"),
                F.col("frame_no").cast("string"),
            )
        ).alias("frame_fingerprint"),
    )
