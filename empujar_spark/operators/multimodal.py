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


from empujar_spark.operators.common import (  # noqa: E402
    HEAVY_KERNEL_BYTES,
    spread as _spread,
)


# --------------------------------------------------------------------- kernels
def _parse_image_dims(content: bytes) -> tuple[int, int] | None:
    """REAL header decode for the container formats parseable with the
    stdlib alone: PNG (IHDR), GIF (logical screen), BMP (BITMAPINFOHEADER)
    and JPEG (first SOF0/SOF2 marker walk). Returns (width, height) or
    None when the payload is not a recognized image container. Full PIXEL
    decode still needs a codec library (PIL/libvips — absence re-checked
    every round, latest r16: PIL/cv2/soundfile/librosa/av/torchaudio/
    imageio/skimage/pydub all unimportable in this container) — but
    width/height/metadata extraction, the common 100 TB curation filter,
    is done for real."""
    import struct

    if len(content) < 16:
        return None
    if content[:8] == b"\x89PNG\r\n\x1a\n" and content[12:16] == b"IHDR":
        if len(content) < 24:  # truncated mid-IHDR: corrupt, not a crash
            return None
        w, h = struct.unpack(">II", content[16:24])
        return (w, h)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", content[6:10])
        return (w, h)
    if content[:2] == b"BM" and len(content) >= 26:
        w, h = struct.unpack("<ii", content[18:26])
        return (abs(w), abs(h))  # height may be negative (top-down rows)
    if content[:2] == b"\xff\xd8":  # JPEG: walk markers to a frame header
        i = 2
        while i + 9 < len(content):
            if content[i] != 0xFF:
                return None
            marker = content[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOFn (baseline/prog)
                h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                return (w, h)
            i += 2 + seg_len
    return None


def _looks_textual(content: bytes) -> bool:
    """True when the payload head reads as TEXT: no control bytes outside
    tab/newline/CR in the first 64 bytes. A text document can start with
    an ASCII container magic ('BMW recalls…', 'GIF87a was released…',
    'RIFF….WAVE') — sniffing it as media would misparse the doc AND
    hash-mismatch the fallback-path SQL oracle (r5 ADVICE). Binary
    containers are the complement: their headers pack dimension/size
    fields whose low bytes (<0x20) land inside any 64-byte head — NOT a
    UTF-8-validity test, which zero-heavy GIF/BMP/WAV headers would
    pass. A textual-looking payload that somehow WERE a real container
    just takes the deterministic fallback — same class of stub as the
    absent pixel codecs."""
    head = content[:64]
    return all(b >= 0x20 or b in (9, 10, 13) for b in head)


def decode_image(content: bytes) -> dict:
    """Image decode kernel: REAL width/height for PNG/GIF/BMP/JPEG headers
    (stdlib parse, _parse_image_dims); for textual payloads (printable
    head, see _looks_textual) and unrecognized blobs — e.g. the synthetic
    testdata shims — a deterministic fake derived from the payload bytes,
    so tests and oracles are stable without codec libs. A real deployment
    swaps the fallback for PIL/libvips in this same kernel; the Spark
    plumbing above is unchanged either way."""
    if content is None:
        raise NotImplementedError("no payload")
    n = len(content)
    dims = None if _looks_textual(content) else _parse_image_dims(content)
    if dims is not None:
        return {"width": dims[0], "height": dims[1], "n_bytes": n}
    return {"width": (n % 640) + 1, "height": (n % 480) + 1, "n_bytes": n}


# Backwards-compatible name: earlier rounds exported the fake-only kernel.
decode_image_stub = decode_image


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
    n_frames = F.greatest(
        (F.col("mm_meta.n_bytes") / every_n_bytes).cast("int"), F.lit(1)
    )
    return (
        # zero-byte payloads have no frames to sample — emit NO rows
        # (the old greatest(n_frames-1, 0) floor emitted a phantom
        # frame_no=0 pointing into an empty blob); non-empty payloads
        # shorter than every_n_bytes still sample one frame at offset 0
        df.select(id_col, "mm_meta")
        .filter(F.col("mm_meta.n_bytes") > 0)
        .withColumn(
            "frame_no",
            F.explode(F.sequence(F.lit(0), n_frames - 1)),
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


def _decode_wav(content: bytes) -> dict | None:
    """REAL audio decode for RIFF/WAVE payloads via the stdlib ``wave``
    module: true sample count, duration and PCM RMS loudness (int16/int8/
    int32 frames, first channel). Returns None for non-WAV payloads.
    Compressed formats (mp3/flac/ogg) still need soundfile/librosa,
    absent in this environment."""
    import io
    import struct
    import wave

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(content)) as w:
            n = w.getnframes()
            rate = w.getframerate() or 1
            width = w.getsampwidth()
            frames = w.readframes(min(n, 65_536))  # bound kernel memory
    except (wave.Error, EOFError, struct.error):
        return None
    fmt = {1: "b", 2: "h", 4: "i"}.get(width)
    rms = 0.0
    if fmt and frames:
        vals = struct.unpack(f"<{len(frames) // width}{fmt}", frames)
        full = float(2 ** (8 * width - 1))
        rms = (sum(v * v for v in vals) / len(vals)) ** 0.5 / full
    return {
        "duration_s": round(n / float(rate), 6),
        "rms": round(rms, 6),
        "n_samples": n,
    }


def decode_audio(content: bytes, sample_rate: int = 16_000) -> dict:
    """Audio decode kernel: REAL duration/RMS/sample-count for WAV
    payloads (stdlib, _decode_wav); deterministic fake derived from the
    payload bytes otherwise (synthetic testdata blobs), keeping tests and
    oracles stable without codec libs. A real deployment swaps the
    fallback for soundfile/librosa in this same kernel."""
    if content is None:
        raise NotImplementedError("no payload")
    real = (
        _decode_wav(content)
        if len(content) >= 12 and not _looks_textual(content)
        else None
    )
    if real is not None:
        return real
    n = len(content)
    # Fallback values are UNROUNDED: a bare IEEE division produces the
    # bit-identical double in any engine, whereas round(n/16000, 6) lands
    # on a decimal tie for every odd n (n·625 ends in 5) where Python's
    # banker rounding and an engine's half-away rounding diverge — which
    # would make the SQL oracle hash-mismatch on half the corpus.
    return {
        "duration_s": n / float(sample_rate),
        "rms": (sum(content[:256]) % 1000) / 1000.0 if n else 0.0,
        "n_samples": n,
    }


# Backwards-compatible name: earlier rounds exported the fake-only kernel.
decode_audio_stub = decode_audio


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


def binary_simhash_pairs(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    k_bytes: int = 8,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 6,
) -> DataFrame:
    """Near-duplicate BINARY payloads — the media-file twin of the text
    SimHash pipeline: two images re-saved with different metadata, or two
    audio files differing in a header field, share most of their byte
    k-grams, so their byte-shingle SimHash fingerprints sit within a
    small Hamming distance. No codec needed: the operator reads raw
    bytes, which is exactly what makes it the FIRST dedup pass over an
    opaque media column at 100 TB (decode-based near-dup only runs on
    what survives this).

    Shingling happens in the HEX domain: window i covers bytes
    i..i+k_bytes-1 as hex chars 2i-1..2i+2·k_bytes-2 (byte-aligned steps
    only). Spark's hex() is byte-exact and the SQL twin mirrors it —
    DuckDB 1.0 cannot slice BLOBs, and a hex prefix-slice is the one
    byte-window spelling both engines evaluate identically.

    Plan shape: hex + shingle + distinct + md5 + fold is a per-row map
    (zero shuffle, the text simhash rule); signatures localCheckpoint
    (tiny: (id, int64) per payload) and go through the shared
    Hamming-LSH band join (_hamming_lsh_pairs) — candidates from band
    equality, never a cross join.

    Output: (id_a, id_b, hamming, n_bands_shared), ids ordered a < b.
    """
    from empujar_spark.operators.dedup import (
        _hamming_lsh_pairs,
        _md5_bucket,
        _simhash_fold,
    )

    span = 2 * k_bytes
    # Payloads below one window drop out HERE, on the cheap length
    # predicate — filtering later on size(__hs) would be pushed below the
    # projection and re-evaluate the whole gram+md5 array once more just
    # to test emptiness (measured 7.3s → 1.1s warm at sf0.1)
    hexed = (
        _spread(df, target_bytes=HEAVY_KERNEL_BYTES)
        .select(
            F.col(id_col).alias("doc_id"),
            F.hex(F.col(content_col)).alias("__hx"),
        )
        .filter(F.length(F.col("__hx")) >= span)
    )
    hx = F.col("__hx")
    grams = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1),
                (F.length(hx) / 2).cast("int") - F.lit(k_bytes - 1),
            ),
            lambda i: F.substring(hx, i * 2 - 1, F.lit(span)),
        )
    )
    hashed = hexed.select(
        "doc_id",
        F.transform(grams, lambda g: _md5_bucket(g, 0, 1 << bits)).alias(
            "__hs"
        ),
    )
    sig = hashed.select(
        "doc_id", _simhash_fold(F.col("__hs"), bits).alias("simhash")
    ).localCheckpoint(eager=True)
    return _hamming_lsh_pairs(sig, bits, bands, max_hamming)
