"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched pandas iterators.

The container has no image/audio codecs, so the decode kernels are STUBS
(deterministic fakes clearly marked below); everything Spark-side — the
schema convention, partition-friendly mapInPandas plumbing, batch shapes,
and metadata extraction — is real and tested.

Schema convention for a multimodal asset column:
    content   binary        raw encoded bytes
    mm_meta   struct<mime: string, n_bytes: bigint, sha: string>

At 100 TB: binary payloads ride in parquet pages alongside metadata;
filters on ``mm_meta.*`` prune row groups without touching payload bytes
(column pruning keeps `content` unread until a kernel needs it).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MM_META_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
    ]
)


def attach_binary_metadata(
    df: DataFrame, content_col: str = "content", mime: str = "application/octet-stream"
) -> DataFrame:
    """Derive the typed metadata struct from a binary column — pure built-in
    functions (length/sha2 run JVM-side; no payload leaves the executor)."""
    c = F.col(content_col)
    return df.withColumn(
        "mm_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(c).cast("bigint").alias("n_bytes"),
            F.sha2(c, 256).alias("sha"),
        ),
    )


def text_as_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata shim: treat utf-8 encoded text as the opaque payload so the
    binary plumbing is exercisable without real media files."""
    return df.withColumn("content", F.encode(F.col(text_col), "UTF-8"))


def _spread(df: DataFrame) -> DataFrame:
    """Hash-spread rows across the cluster before a CPU-bound Python
    kernel (single-file parquet input = one partition = one core)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


# --------------------------------------------------------------------- kernels
def decode_image_stub(content: bytes) -> dict:
    """STUB — deterministic fake image decode.

    A real deployment replaces this with PIL/libvips inside the same
    mapInPandas kernel (the Spark plumbing is identical). The fake derives
    "width"/"height" from the payload bytes so tests are deterministic.
    """
    if content is None:
        raise NotImplementedError("no payload")
    n = len(content)
    return {"width": (n % 640) + 1, "height": (n % 480) + 1, "n_bytes": n}


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def extract_image_features(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; the kernel
    is vectorized per batch, never per-row over py4j. Only (id, content)
    columns are read — column pruning keeps everything else on disk.
    Repartitions first: corpora often arrive as few large files and the
    kernel is CPU-bound — without this it serializes on one core.
    """
    src = _spread(df).select(id_col, content_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[content_col].map(decode_image_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_bytes": [f["n_bytes"] for f in feats],
                }
            )

    return src.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_n_bytes: int = 1024, id_col: str = "doc_id"
) -> DataFrame:
    """Video-frame-sampling PLUMBING: emits (doc_id, frame_no, byte_offset)
    rows — one per sampled "frame" — without decoding (the real decoder
    slots into extract_image_features' kernel). Pure JVM-side sequence
    explode; scales linearly, no shuffle."""
    n_frames = (F.col("mm_meta.n_bytes") / every_n_bytes).cast("int")
    return (
        df.select(id_col, "mm_meta")
        .withColumn(
            "frame_no",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))),
        )
        .select(
            id_col,
            "frame_no",
            (F.col("frame_no") * every_n_bytes).cast("bigint").alias("byte_offset"),
        )
    )


def resize_image_stub(content: bytes, target_w: int, target_h: int) -> bytes:
    """STUB — deterministic fake resize.

    A real deployment decodes, resamples, and re-encodes here (PIL
    ``Image.resize`` inside the same kernel). The fake produces a payload
    whose length encodes the target box so output metadata is checkable:
    min(len, target_w*target_h) bytes sliced from the input.
    """
    if content is None:
        raise NotImplementedError("no payload")
    return bytes(content[: max(1, min(len(content), target_w * target_h))])


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Batch image resize over binary payloads via mapInPandas — the
    transform-and-rewrite shape (payload in, payload out) as opposed to
    extract_image_features' payload-in-scalars-out shape. Arrow moves the
    bytes both directions; nothing crosses py4j row-at-a-time."""
    src = _spread(df).select(id_col, content_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[content_col].map(
                lambda c: resize_image_stub(c, target_w, target_h)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "content": out,
                    "n_bytes": out.map(len),
                }
            )

    return src.mapInPandas(kernel, RESIZED_SCHEMA)


def decode_audio_stub(content: bytes, sample_rate: int = 16_000) -> dict:
    """STUB — deterministic fake audio decode (a real deployment uses
    soundfile/librosa in the same kernel). Derives duration and a fake
    loudness from the payload bytes."""
    if content is None:
        raise NotImplementedError("no payload")
    n = len(content)
    return {
        "duration_s": round(n / float(sample_rate), 6),
        "rms": round((sum(content[:256]) % 1000) / 1000.0, 6) if n else 0.0,
        "n_samples": n,
    }


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Arrow-batched audio feature extraction — same plumbing contract as
    extract_image_features with an audio-shaped kernel."""
    src = _spread(df).select(id_col, content_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[content_col].map(decode_audio_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "duration_s": [f["duration_s"] for f in feats],
                    "rms": [f["rms"] for f in feats],
                    "n_samples": [f["n_samples"] for f in feats],
                }
            )

    return src.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)
