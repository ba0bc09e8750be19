"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata — the layout
public lakehouse pipelines use for training data:

    media(media_id long, kind string, content binary,
          meta struct<width int, height int, sample_rate int,
                      n_frames int, mime string>)

The Spark-side plumbing (schemas, Arrow-batched ``mapInPandas``
operators, partition sizing) is real and tested; the actual byte
decoding is STUBBED — this container has no image/audio libraries, so
``decode_image_batch`` raises ``NotImplementedError`` unless handed a
``decoder=`` callable, and ``fake_feature_extract`` provides a
deterministic stand-in (byte-histogram features) used by tests.

Scale notes: ``mapInPandas`` streams Arrow batches — peak memory is
one batch per core, not one partition; cap
``spark.sql.execution.arrow.maxRecordsPerBatch`` (or batch bytes) when
rows carry multi-MB blobs. Binary columns should be stored in their
own parquet files (column pruning keeps metadata-only queries from
reading bytes at all).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mime", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_DIM = 16  # byte-histogram buckets for the deterministic fake

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def media_metadata(df: DataFrame) -> DataFrame:
    """Metadata-only projection — never touches ``content`` bytes, so
    the parquet scan prunes the blob column entirely."""
    return df.select(
        "media_id", "kind", "meta.width", "meta.height", "meta.mime"
    )


def decode_image_batch(content: pd.Series, decoder: Callable | None = None):
    """Decode a batch of image blobs.

    STUB: real decoding needs an image library not present in this
    container; pass ``decoder=`` (e.g. ``PIL.Image.open`` wrapper) in a
    real deployment.
    """
    if decoder is None:
        raise NotImplementedError(
            "image decoding requires an image library (e.g. Pillow); "
            "pass decoder=..."
        )
    return content.map(decoder)


def resize_image_batch(
    content: pd.Series,
    width: int,
    height: int,
    resizer: Callable | None = None,
):
    """Resize a batch of image blobs to (width, height).

    STUB: real resizing needs an image library not present in this
    container; pass ``resizer=`` (e.g. a PIL thumbnail wrapper) in a
    real deployment. The batch shape is the contract: a Series of
    bytes in, a Series of bytes out, applied inside ``mapInPandas`` so
    Arrow amortizes the Python boundary per batch, not per image.
    """
    if resizer is None:
        raise NotImplementedError(
            "image resizing requires an image library (e.g. Pillow); "
            "pass resizer=..."
        )
    return content.map(lambda b: resizer(b, width, height))


def fake_feature_extract(content: pd.Series) -> pd.Series:
    """Deterministic stand-in for a learned feature extractor: a
    16-bucket normalized byte histogram. Shape-compatible with a real
    embedding so the downstream similarity operators run unchanged.

    Vectorized with numpy (frombuffer + bincount) — the point of the
    Arrow/pandas batch boundary is lost if the Python side then loops
    per byte; this is the pattern a real featurizer should follow
    (hand the whole buffer to native code)."""
    import numpy as np

    def hist(b: bytes | None) -> list[float]:
        if not b:
            return [0.0] * FEATURE_DIM
        arr = np.frombuffer(b, dtype=np.uint8) >> 4
        counts = np.bincount(arr, minlength=FEATURE_DIM)
        return (counts / float(len(b))).tolist()

    return content.map(hist)


def extract_features(df: DataFrame, batch_size: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    ``mapInPandas`` — the canonical shape for any real decoder: iterate
    batches, keep only needed columns, emit a narrow typed frame."""
    from city_payroll_data_pipeline_spark.session import ship_package

    ship_package(df.sparkSession)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "features": fake_feature_extract(pdf["content"]),
                }
            )

    return df.select("media_id", "kind", "content").mapInPandas(op, FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index (decode stubbed). Demonstrates the explode-based fan-out that
    keeps frame extraction parallel instead of per-video loops."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def synthesize_media(spark, docs: DataFrame, n_kinds: int = 3) -> DataFrame:
    """Build a deterministic media table from the documents table
    (text bytes as blob content) — test fixture for the plumbing."""
    kind = (
        F.when(F.col("doc_id") % n_kinds == 0, "image")
        .when(F.col("doc_id") % n_kinds == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 300 + 1).cast("int").alias("n_frames"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )
