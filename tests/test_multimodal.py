"""Multimodal kernels: REAL stdlib decode for recognizable containers
(PNG/GIF/BMP/JPEG headers, RIFF/WAVE audio) + deterministic fallback for
opaque payloads, and the Arrow mapInPandas plumbing over mixed batches."""

import io
import struct
import wave

from empujar_spark.operators import multimodal as M


def _png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
        + b"\x00" * 8
    )


def _jpeg(w, h):
    # SOI, APP0 stub, SOF0 with dims, padding
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
        ">HH", h, w
    ) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\x00" * 8


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 8


def _bmp(w, h):
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, -h) + b"\x00" * 8


def _wav(n_frames=1600, rate=16_000, amp=8192):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(struct.pack(f"<{n_frames}h", *([amp] * n_frames)))
    return buf.getvalue()


def test_decode_image_real_headers():
    assert M.decode_image(_png(640, 480)) == {
        "width": 640, "height": 480, "n_bytes": len(_png(640, 480))
    }
    assert M.decode_image(_jpeg(1920, 1080))["width"] == 1920
    assert M.decode_image(_jpeg(1920, 1080))["height"] == 1080
    assert M.decode_image(_gif(12, 34))["width"] == 12
    # negative BMP height (top-down rows) normalizes to positive
    assert M.decode_image(_bmp(320, 200))["height"] == 200


def test_decode_image_opaque_fallback_deterministic():
    blob = b"not an image payload, just bytes"
    got = M.decode_image(blob)
    n = len(blob)
    assert got == {"width": (n % 640) + 1, "height": (n % 480) + 1, "n_bytes": n}


def test_decode_audio_real_wav():
    payload = _wav(n_frames=1600, rate=16_000, amp=8192)
    got = M.decode_audio(payload)
    assert got["n_samples"] == 1600
    assert got["duration_s"] == 0.1
    # constant-amplitude signal: rms = amp / 2^15 exactly
    assert abs(got["rms"] - 8192 / 32768.0) < 1e-6


def test_decode_audio_opaque_fallback():
    blob = b"opaque-audio-ish"
    got = M.decode_audio(blob)
    assert got["n_samples"] == len(blob)


def test_extract_image_features_mixed_batch(spark):
    """The mapInPandas kernel must handle real containers and opaque
    payloads side by side in one Arrow batch."""
    rows = [(1, _png(99, 77)), (2, b"opaque-bytes-payload")]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: (r["width"], r["height"])
           for r in M.extract_image_features(df).collect()}
    assert got[1] == (99, 77)
    n = len(b"opaque-bytes-payload")
    assert got[2] == ((n % 640) + 1, (n % 480) + 1)


def test_extract_audio_features_real_wav_on_spark(spark):
    rows = [(1, _wav(320, 16_000, 4096))]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    [r] = M.extract_audio_features(df).collect()
    assert r["n_samples"] == 320
    assert abs(r["rms"] - 4096 / 32768.0) < 1e-6


def test_textual_payload_with_container_magic_takes_fallback():
    """A TEXT document that happens to start with a container magic must
    take the deterministic fallback, not the header sniffer: misrouting
    would misparse the doc and hash-mismatch the fallback-path oracle of
    image_features/audio_features (r5 ADVICE)."""
    bmw = b"BM" + b"W recalls 90,000 vehicles over faulty sensor" * 3
    got = M.decode_image(bmw)
    n = len(bmw)
    assert got == {"width": (n % 640) + 1, "height": (n % 480) + 1, "n_bytes": n}

    gif_news = b"GIF87a was released in 1987 by CompuServe engineers..."
    n = len(gif_news)
    assert M.decode_image(gif_news)["width"] == (n % 640) + 1

    riff_text = b"RIFF....WAVE is the container layout used by PCM files"
    got = M.decode_audio(riff_text)
    n = len(riff_text)
    assert got["n_samples"] == n  # fallback shape, not wave parse
    assert got["duration_s"] == n / 16000.0

    # and real binary containers still take the REAL decode path
    import struct
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 8
    assert M.decode_image(gif) == {"width": 12, "height": 34, "n_bytes": len(gif)}


def test_binary_simhash_pairs_finds_byte_near_dups(spark):
    """Two payloads differing by a short suffix (re-encode/metadata-style
    delta) pair up; an unrelated payload doesn't; a payload below one
    byte window is excluded rather than hashing to a degenerate
    signature."""
    from empujar_spark.operators.multimodal import binary_simhash_pairs

    base = bytes(range(48)) * 3
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + b"\x99\x98"),
            (3, bytes([7] * 5) + bytes(range(200, 248)) * 2),
            (4, b"tiny"),
        ],
        "doc_id bigint, content binary",
    )
    pairs = {(r.id_a, r.id_b) for r in binary_simhash_pairs(df).collect()}
    assert (1, 2) in pairs
    assert all(4 not in p and 3 not in p for p in pairs)


def test_binary_simhash_identical_payloads_hamming_zero(spark):
    from empujar_spark.operators.multimodal import binary_simhash_pairs

    blob = bytes(range(64)) * 2
    df = spark.createDataFrame(
        [(1, blob), (2, blob)], "doc_id bigint, content binary"
    )
    rows = binary_simhash_pairs(df).collect()
    assert len(rows) == 1
    assert rows[0].hamming == 0
    # every band agrees on identical signatures
    assert rows[0].n_bands_shared == 4
