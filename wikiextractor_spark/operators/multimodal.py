"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata.

The container has no codec libraries, so the default *decode* kernels
are deterministic fakes — but every piece of Spark plumbing around
them is real and tested: binary schemas, Arrow-batched ``mapInPandas``
with bounded batch shapes, metadata projection, partition-friendly
layout.  ``decode_media(codec='auto')`` probes for PIL at call time
(executors re-probe in their own interpreter) and uses it for image
rows when importable, falling back to the fake kernel — so the code
needs no edits the day it runs somewhere with real codecs;
``codec='pil'`` makes a missing library a loud error instead of
silently-fake pixels.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("pixels", BinaryType()),  # decoded payload (fake)
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_fake_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build an opaque media column from text bytes (the test stand-in
    for real image/audio payloads) plus a media_type tag."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
    )


def _fake_decode_meta(payload: bytes, media_type: str) -> tuple[int, int, int, int]:
    """Deterministic fake decode: dimensions derived from a content
    hash.  A real deployment replaces this with PIL/libvips/ffmpeg —
    everything around it (schema, batching, partitioning) is the real
    production plumbing."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 + h[2] % 3
    n_frames = 1 if media_type != "video" else 8 + h[3] % 120
    return width, height, channels, n_frames


def decode_media_meta(df: DataFrame) -> DataFrame:
    """``mapInPandas`` metadata extraction over binary payloads —
    Arrow batches in, Arrow batches out, no row-at-a-time Python."""

    def _batches(iterator):
        for pdf in iterator:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["media"], pdf["media_type"]
            ):
                payload = bytes(payload) if payload is not None else b""
                w, h, c, nf = _fake_decode_meta(payload, mtype)
                rows.append((doc_id, mtype, len(payload), w, h, c, nf))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields]
            )

    return df.mapInPandas(_batches, schema=MEDIA_META_SCHEMA)


def _pil_available() -> bool:
    """Detect a real image decoder at CALL time (executors re-probe in
    their own interpreter) — the code needs no edits the day it runs
    in a container that has PIL."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _pil_decode_meta(payload: bytes) -> tuple[int, int, int, int] | None:
    """Real-image branch: PIL header probe (no full pixel decode).
    Returns None on undecodable payloads so callers can fall back."""
    import io

    import PIL.Image

    try:
        with PIL.Image.open(io.BytesIO(payload)) as im:
            channels = len(im.getbands())
            n_frames = int(getattr(im, "n_frames", 1))
            return im.width, im.height, channels, n_frames
    except Exception:
        return None


def decode_media(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode payloads to a pixel buffer.

    ``codec='fake'`` (default): deterministic md5-derived buffers —
    always available, and what the battery oracle reproduces.
    ``codec='auto'``: use PIL for image rows when importable in this
    interpreter, falling back to the fake kernel otherwise (and for
    non-image media).  ``codec='pil'``: require PIL — raises
    ``NotImplementedError`` when the library is absent (this
    container), so a mis-configured production job fails loudly
    instead of silently shipping fake pixels."""
    if codec not in ("fake", "auto", "pil"):
        raise NotImplementedError(
            f"codec {codec!r}: supported codecs are 'fake', 'auto', 'pil' "
            "(PIL-backed when importable; ffmpeg-class video decode is not "
            "wired in this environment — the Spark plumbing is "
            "production-shaped, swap the kernel only)."
        )
    if codec == "pil" and not _pil_available():
        raise NotImplementedError(
            "codec 'pil': PIL is not importable in this environment; "
            "install pillow or use codec='auto'/'fake'."
        )
    use_real = codec in ("auto", "pil") and _pil_available()

    def _batches(iterator):
        # executors RE-PROBE PIL in their own interpreter: the driver's
        # probe only gates the 'pil' strictness check, so a cluster
        # where workers lack the lib degrades per the codec contract
        # instead of assuming the driver's environment
        worker_real = use_real and _pil_available()
        for pdf in iterator:
            rows = [
                _decode_row(
                    doc_id,
                    bytes(payload) if payload is not None else b"",
                    mtype,
                    worker_real,
                )
                for doc_id, payload, mtype in zip(
                    pdf["doc_id"], pdf["media"], pdf["media_type"]
                )
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.mapInPandas(_batches, schema=DECODED_SCHEMA)


def _decode_row(
    doc_id: int, payload: bytes, mtype: str, use_real: bool,
) -> tuple:
    """One row of :func:`decode_media` — module-level so the PIL
    routing contract is testable without Spark workers (the probe test
    monkeypatches a PIL stub and drives this directly; a driver-side
    ``sys.modules`` patch can never reach a worker process)."""
    real = _pil_decode_meta(payload) if use_real and mtype == "image" else None
    if real is not None:
        import io as _io

        import PIL.Image as _img

        w, h, _, _ = real
        with _img.open(_io.BytesIO(payload)) as im:
            pixels = im.tobytes()[:16]
    else:
        w, h, _, _ = _fake_decode_meta(payload, mtype)
        pixels = (hashlib.md5(payload).digest() * 4)[:16]
    return (doc_id, mtype, pixels, w, h)


def media_stats(meta: DataFrame) -> DataFrame:
    """Typed-metadata rollup per media_type (native agg over the
    decoded metadata)."""
    return meta.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("width"), 4).alias("avg_width"),
        F.round(F.avg("height"), 4).alias("avg_height"),
        F.max("n_frames").alias("max_frames"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("pixels", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def resize_media(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize stub over decoded media: deterministic fake resample
    (content-hash tiled to the target size).  Real plumbing — schema,
    Arrow batching, partition preservation — with the resample kernel
    swappable for PIL/libvips."""

    def _batches(iterator):
        for pdf in iterator:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["media"], pdf["media_type"]
            ):
                payload = bytes(payload) if payload is not None else b""
                digest = hashlib.md5(payload).digest()
                n = max(1, (width * height) // 16)
                rows.append((doc_id, mtype, (digest * n)[: width * height // 8], width, height))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.mapInPandas(_batches, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stub for video payloads: emits ``n_frames``
    deterministic fake frames per video row (UDTF-shaped: one input
    row fans out to N output rows through mapInPandas)."""

    def _batches(iterator):
        for pdf in iterator:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["media"], pdf["media_type"]
            ):
                if mtype != "video":
                    continue
                payload = bytes(payload) if payload is not None else b""
                for k in range(n_frames):
                    frame = hashlib.md5(payload + k.to_bytes(4, "big")).digest()
                    rows.append((doc_id, k, frame))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return df.mapInPandas(_batches, schema=FRAMES_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def extract_features(df: DataFrame, dim: int = 64) -> DataFrame:
    """Feature-extraction stub over media payloads: a deterministic
    unit-norm ``float[dim]`` embedding per row, derived from the
    content hash (the fake stands in for a model forward pass — no
    inference runtime ships in this container).

    The Spark plumbing is the real deliverable and is exactly what a
    model-backed kernel needs: Arrow-batched ``mapInPandas`` (the
    model loads once per python worker, amortized over batches, NOT
    once per row), a typed ``array<float>`` output that feeds the
    similarity operators directly (``ann_topk``/``ann_topk_blas``/
    IVF), and numpy-vectorized normalization per batch.
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")

    def _batches(iterator):
        import numpy as np

        for pdf in iterator:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["media"], pdf["media_type"]
            ):
                payload = bytes(payload) if payload is not None else b""
                # expand the 16-byte digest into dim pseudo-random
                # floats (counter-mode md5), then L2-normalize
                need = (dim * 4 + 15) // 16
                buf = b"".join(
                    hashlib.md5(payload + k.to_bytes(4, "big")).digest()
                    for k in range(need)
                )
                v = np.frombuffer(buf[: dim * 4], dtype=np.uint32).astype(np.float64)
                v = (v / 2**32) * 2.0 - 1.0
                v = v / (np.linalg.norm(v) or 1.0)
                rows.append((doc_id, mtype, v.astype(np.float32).tolist()))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return df.mapInPandas(_batches, schema=FEATURES_SCHEMA)
