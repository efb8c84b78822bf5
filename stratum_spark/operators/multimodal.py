"""Multimodal column handling: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas functions over mapInPandas.

The image/audio decode libraries are not in this container, so the decode
kernels are STUBBED behind try-imports with a deterministic fake feature
extractor -- but the Spark-side plumbing is real and tested: schema
(binary + struct metadata), batch iteration shape, partition-preserving
mapInPandas, and the UDF signatures a real decoder would slot into.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        # double, not float32: the stub kernel stores exact integer byte
        # stats here, and a float32 sum loses integer exactness above 2^24
        # (~170 KB of average-valued payload bytes) -- downstream derived
        # stats (mean = sum/count) must round identically to the exact-int
        # oracle at ANY payload size, so the feature lane is 64-bit
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents: payload = utf8
    bytes of the text (an opaque blob as far as the pipeline cares)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            (F.pmod(F.col("doc_id"), F.lit(640)) + 1).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(480)) + 1).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.col("doc_id"), F.lit(90)) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


_HAS_PIL = False
try:  # pragma: no cover - library absent in this container
    import importlib.util as _ilu

    _HAS_PIL = _ilu.find_spec("PIL") is not None
except ImportError:  # pragma: no cover
    _HAS_PIL = False


def _decode_image(payload: bytes) -> list[float]:
    # availability checked explicitly (not via raising through an
    # ImportError handler) so a PIL-equipped environment takes the real
    # kernel path deliberately instead of crashing every batch
    if _HAS_PIL:  # pragma: no cover - library absent in this container
        raise NotImplementedError("real image decode not wired yet")
    # deterministic fake: exact integer byte stats (count, sum, max, min) --
    # integers stay exact through the float64 feature column (exact to
    # 2^53, far beyond any payload sum), so downstream derived stats
    # (e.g. mean = sum/count) are reproducible bit-for-bit across engines
    if payload is None or len(payload) == 0:
        return [0.0, 0.0, 0.0, 0.0]
    n = float(len(payload))
    s = float(sum(payload))
    mx, mn = float(max(payload)), float(min(payload))
    return [n, s, mx, mn]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out;
    one pandas call per batch (never per row). The stub kernel is
    deterministic so the operator is testable end-to-end."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: explode sampled frame indexes from
    metadata (decode stubbed; index math is the real, tested part)."""
    frames = F.filter(
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1),
        lambda i: i % every_n == 0,
    )
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(frames).alias("frame_idx"),
    )
