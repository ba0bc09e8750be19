"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata — the layout
public lakehouse pipelines use for training data:

    media(media_id long, kind string, content binary,
          meta struct<width int, height int, sample_rate int,
                      n_frames int, mime string>)

The Spark-side plumbing (schemas, Arrow-batched ``mapInPandas``
operators, partition sizing) is real and tested. Byte decoding ships a
pure-numpy binary-netpbm (PGM/PPM) codec + nearest-neighbor resizer as
the default — fully functional without any image library; other
formats (JPEG/PNG/...) take an injected ``decoder=``/``resizer=``
callable (e.g. Pillow wrappers) in deployments that ship one.
``fake_feature_extract`` provides a deterministic stand-in for a
learned featurizer (byte-histogram features) used by tests.

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


def decode_ppm(b: bytes):
    """Pure-numpy decoder for binary netpbm images (P5 grayscale /
    P6 RGB) — the one raster format decodable without a codec library.
    Returns a ``uint8``/``uint16`` array shaped (h, w) or (h, w, 3).

    Header per the netpbm spec: magic, whitespace-separated width,
    height, maxval (with ``#`` comments legal anywhere in the header),
    one whitespace byte, then the raw sample plane (big-endian 2-byte
    samples when maxval > 255).
    """
    import numpy as np

    if not b or b[:2] not in (b"P5", b"P6"):
        raise ValueError(
            "not a binary PGM/PPM blob; pass decoder= for other formats"
        )
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        if i >= len(b):
            raise ValueError("truncated netpbm header")
        c = b[i : i + 1]
        if c == b"#":  # comment runs to end-of-line
            i = b.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(b) and not b[j : j + 1].isspace():
                j += 1
            fields.append(int(b[i:j]))
            i = j
    i += 1  # exactly one whitespace byte separates header from raster
    w, h, maxval = fields
    channels = 3 if b[:2] == b"P6" else 1
    dt = np.dtype(">u2") if maxval > 255 else np.uint8
    n = w * h * channels
    arr = np.frombuffer(b, dtype=dt, count=n, offset=i).astype(
        np.uint16 if maxval > 255 else np.uint8
    )
    return arr.reshape((h, w, 3)) if channels == 3 else arr.reshape((h, w))


def encode_ppm(arr) -> bytes:
    """Inverse of :func:`decode_ppm`: (h, w) → P5, (h, w, 3) → P6."""
    import numpy as np

    a = np.asarray(arr)
    magic = b"P6" if a.ndim == 3 else b"P5"
    maxval = 65535 if a.dtype.itemsize > 1 else 255
    h, w = a.shape[:2]
    raster = a.astype(">u2" if maxval > 255 else np.uint8).tobytes()
    return magic + b"\n%d %d\n%d\n" % (w, h, maxval) + raster


def resize_nearest(arr, width: int, height: int):
    """Nearest-neighbor resample to (height, width) via pure-numpy
    index gather — O(output pixels), no interpolation kernel."""
    import numpy as np

    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(height) * h) // height, h - 1)
    cols = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[rows][:, cols]


def decode_image_batch(content: pd.Series, decoder: Callable | None = None):
    """Decode a batch of image blobs to numpy arrays.

    Default decoder handles binary PGM/PPM (:func:`decode_ppm`) —
    fully functional without any codec library. For JPEG/PNG/etc pass
    ``decoder=`` (e.g. a ``PIL.Image.open`` wrapper) in a deployment
    that ships one; the batch contract is unchanged.
    """
    return content.map(decoder or decode_ppm)


def resize_image_batch(
    content: pd.Series,
    width: int,
    height: int,
    resizer: Callable | None = None,
):
    """Resize a batch of image blobs to (width, height), returning
    re-encoded blobs.

    Default path: PGM/PPM decode → nearest-neighbor resample →
    re-encode, all numpy. Pass ``resizer=(bytes, w, h) -> bytes`` to
    swap in a real codec. The batch shape is the contract: a Series of
    bytes in, a Series of bytes out, applied inside ``mapInPandas`` so
    Arrow amortizes the Python boundary per batch, not per image.
    """
    if resizer is None:
        resizer = lambda b, w, h: encode_ppm(  # noqa: E731
            resize_nearest(decode_ppm(b), w, h)
        )
    return content.map(lambda b: resizer(b, width, height))


AUDIO_FRAME = 256      # samples per analysis frame
AUDIO_SILENT_T = 100_000  # frame sum-of-squares below this = "silent"


def audio_frame_stats(pcm) -> tuple[int, int, int, int, int, int]:
    """Integer frame statistics of an 8-bit unsigned PCM buffer — the
    deterministic stand-in for a real audio featurizer (energy/VAD
    front end): samples are centred (s = byte − 128), framed at
    ``AUDIO_FRAME`` samples (last frame may be short), and reduced to
    (n_samples, n_frames, total_energy, max_frame_energy,
    n_silent_frames, peak_amp) where energy is the exact per-frame
    Σ s² and a frame is silent when its energy < ``AUDIO_SILENT_T``.
    All-integer, so an SQL oracle replays it bit-exactly. Vectorized
    (frombuffer + reduceat) — no per-sample Python. An empty buffer
    returns the natural zero tuple (0, 0, 0, 0, 0, 0) rather than
    tripping an opaque empty-reduction error (ADVICE r7)."""
    import numpy as np

    s = np.frombuffer(pcm, dtype=np.uint8).astype(np.int64) - 128
    n = len(s)
    if n == 0:
        return (0, 0, 0, 0, 0, 0)
    bounds = np.arange(0, n, AUDIO_FRAME)
    energy = np.add.reduceat(s * s, bounds)
    return (
        n,
        len(bounds),
        int(energy.sum()),
        int(energy.max()),
        int((energy < AUDIO_SILENT_T).sum()),
        int(np.abs(s).max()),
    )


def audio_frame_energies(pcm) -> list[tuple[int, int]]:
    """Per-frame exact integer energies of an 8-bit unsigned PCM
    buffer — the row-wise twin of :func:`audio_frame_stats` for
    consumers that need the frame SEQUENCE (VAD segmentation, onset
    detection) rather than the per-blob reduction: returns
    [(frame_idx, Σ s² over the frame), …] with the same centring,
    framing and integer math, so the same SQL oracle replays it.
    Vectorized (frombuffer + reduceat); empty buffer → []."""
    import numpy as np

    s = np.frombuffer(pcm, dtype=np.uint8).astype(np.int64) - 128
    n = len(s)
    if n == 0:
        return []
    bounds = np.arange(0, n, AUDIO_FRAME)
    energy = np.add.reduceat(s * s, bounds)
    return [(int(i), int(e)) for i, e in enumerate(energy)]


DHASH_GRID_W = 6   # horizontal diffs per row
DHASH_GRID_H = 10  # rows → 60 bits total, fits a signed bigint
DHASH_BITS = DHASH_GRID_W * DHASH_GRID_H


def dhash60(arr) -> int:
    """60-bit difference hash (dHash) of a grayscale image array: the
    standard perceptual image fingerprint — nearest-resize to a
    (DHASH_GRID_W+1) × DHASH_GRID_H grid, then bit (r, c) = 1 iff
    pixel(r, c) > pixel(r, c+1). Robust to re-encoding and uniform
    brightness shifts; near-duplicate images land within a small
    Hamming radius, so pairs come from the same pigeonhole block join
    as text SimHash (operators/dedup.py hamming_near_pairs). 60 bits
    (not the textbook 64) keeps the signature in a signed bigint and
    splits evenly into 4 blocks at hamming_max=3.

    Pure integer index math end to end (nearest-neighbor gather +
    comparisons), so an SQL oracle replays the hash bit-exactly."""
    import numpy as np

    small = resize_nearest(arr, DHASH_GRID_W + 1, DHASH_GRID_H)
    bits = (small[:, :-1].astype(np.int32) > small[:, 1:].astype(np.int32))
    weights = (
        np.int64(1) << np.arange(DHASH_BITS, dtype=np.int64)
    ).reshape(DHASH_GRID_H, DHASH_GRID_W)
    return int((bits * weights).sum(dtype=np.int64))


def dhash_batch(content: pd.Series, decoder: Callable | None = None) -> pd.Series:
    """Batch dHash over image blobs: decode (PGM/PPM by default, or an
    injected codec) → :func:`dhash60`. Series of bytes in, Series of
    int64 out — the mapInPandas batch contract."""
    return decode_image_batch(content, decoder).map(dhash60)


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
