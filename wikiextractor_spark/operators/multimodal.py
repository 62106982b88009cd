"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata.

All three modalities are REAL: :func:`attach_fake_binary` synthesizes
valid container files entirely JVM-side — 24/32-bpp (and paletted
8-bpp) BMP images, RIFF/PCM WAV audio, and YUV4MPEG2 (Y4M, C420)
video, each assembled as native hex/`unhex` expressions, no Python in
the generator — and the default kernels are pure-Python *container
parsers* (:func:`_bmp_decode_meta` / :func:`_ppm_decode_meta` /
:func:`_wav_decode_meta` / :func:`_y4m_decode_meta`): dimensions,
sample rates, channel counts, and frame counts come from parsing real
bytes with ``struct``/numpy, not from a content hash.  The
deterministic md5 fake kernel remains only as the documented fallback
for payloads with no parseable container header.  Compressed-codec
decode (JPEG pixels, MP3 samples, H.264 frames) is where a library
would slot in: ``decode_media(codec='auto')`` probes for PIL at call
time (executors re-probe in their own interpreter) and prefers it for
image rows when importable; ``codec='pil'`` makes a missing library a
loud error instead of silently-degraded decode.

Metadata mapping per modality (MEDIA_META_SCHEMA is deliberately one
fixed shape so the rollups stay native aggs):

- image: width/height/channels from the pixel grid, n_frames = 1
- audio: width = sample_rate (Hz), height = bits per sample,
  channels = PCM channel count, n_frames = sample frames (one frame =
  one sample across channels — standard audio terminology)
- video: width/height = spatial dims, channels = 3 (YUV planes; 1 for
  Cmono), n_frames = container frame count
"""

from __future__ import annotations

import hashlib
import struct

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
        StructField("pixels", BinaryType()),  # decoded payload (truncated)
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


# grayscale palette for 8-bpp BMPs: 256 BGRA quads (i, i, i, 0)
_GRAY_PALETTE_HEX = "".join(f"{i:02x}{i:02x}{i:02x}00" for i in range(256))


def _le_hex(expr: str, nbytes: int) -> str:
    """SQL fragment: ``expr`` (a non-negative int) as little-endian hex
    of exactly ``nbytes`` bytes — the byte-swap BMP headers need."""
    h = f"lpad(hex({expr}), {2 * nbytes}, '0')"
    parts = ", ".join(
        f"substring({h}, {2 * i + 1}, 2)" for i in reversed(range(nbytes))
    )
    return f"concat({parts})"


def attach_fake_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build an opaque media column per doc (the test stand-in for a
    real payload store) plus a media_type tag.

    Every row gets a VALID container file: parameters (geometry, bit
    depth, sample rate, frame count) are md5-derived so a SQL oracle
    can restate them, but the payloads are structurally correct —

    - image: BMP — 14-byte file header, 40-byte BITMAPINFOHEADER,
      grayscale palette when 8-bpp, 4-byte-aligned pixel rows
    - audio: WAV — canonical 44-byte RIFF/fmt/data layout, PCM,
      1-2 channels × 8/16-bit × {8,16,22.05,44.1} kHz
    - video: Y4M (YUV4MPEG2) — ASCII stream header, ``FRAME\\n``
      markers, raw C420 planar frames (even spatial dims by
      construction)

    — all assembled entirely JVM-side as one hex string per row and
    `unhex`ed to binary (zero Python; the generator stays a narrow
    projection)."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("h"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
    )
    geom = (
        base.select(
            "*",
            # image geometry
            F.expr("4 + CAST(conv(substring(h, 1, 2), 16, 10) AS INT) % 60").alias("w"),
            F.expr("4 + CAST(conv(substring(h, 3, 2), 16, 10) AS INT) % 60").alias("ht"),
            F.expr(
                "element_at(array(8, 24, 32),"
                " CAST(conv(substring(h, 5, 2), 16, 10) AS INT) % 3 + 1)"
            ).alias("bpp"),
            # audio parameters
            F.expr(
                "element_at(array(8000, 16000, 22050, 44100),"
                " CAST(conv(substring(h, 1, 2), 16, 10) AS INT) % 4 + 1)"
            ).alias("sr"),
            F.expr("1 + CAST(conv(substring(h, 3, 2), 16, 10) AS INT) % 2").alias("nch"),
            F.expr(
                "element_at(array(8, 16),"
                " CAST(conv(substring(h, 5, 2), 16, 10) AS INT) % 2 + 1)"
            ).alias("bits"),
            F.expr("64 + CAST(conv(substring(h, 7, 4), 16, 10) AS INT) % 1937").alias("nsamp"),
            # video parameters (×2 keeps C420 subsampling legal)
            F.expr("(8 + CAST(conv(substring(h, 1, 2), 16, 10) AS INT) % 28) * 2").alias("vw"),
            F.expr("(8 + CAST(conv(substring(h, 3, 2), 16, 10) AS INT) % 28) * 2").alias("vh"),
            F.expr("2 + CAST(conv(substring(h, 5, 2), 16, 10) AS INT) % 7").alias("nfr"),
        )
        .select(
            "*",
            # BMP rows are padded to 4-byte boundaries
            F.expr("((w * (bpp DIV 8) + 3) DIV 4) * 4").alias("rowsize"),
            F.expr("IF(bpp = 8, 1024, 0)").alias("palette_bytes"),
            F.expr("nsamp * nch * (bits DIV 8)").alias("dsize"),
            F.expr("(vw * vh * 3) DIV 2").alias("fsize"),  # C420 frame
        )
        .select("*", F.expr("rowsize * ht").alias("img_size"))
    )
    bmp_hex = F.expr(
        "concat("
        "'424d', "  # 'BM'
        + _le_hex("54 + palette_bytes + img_size", 4)
        + ", '00000000', "  # reserved
        + _le_hex("54 + palette_bytes", 4)  # pixel-data offset
        + ", '28000000', "  # BITMAPINFOHEADER size = 40
        + _le_hex("w", 4)
        + ", "
        + _le_hex("ht", 4)
        + ", '0100', "  # planes = 1
        + _le_hex("bpp", 2)
        + ", '00000000', "  # BI_RGB (uncompressed)
        + _le_hex("img_size", 4)
        + ", '130b0000', '130b0000', "  # 2835 px/m (72 dpi)
        + _le_hex("IF(bpp = 8, 256, 0)", 4)  # palette entries
        + ", '00000000', "  # important colors
        f"IF(bpp = 8, '{_GRAY_PALETTE_HEX}', ''), "
        # pixel fill: the md5 hex (16 bytes) tiled to img_size bytes
        "substring(repeat(h, CAST(ceil(img_size / 16.0) AS INT)), 1, img_size * 2)"
        ")"
    )
    wav_hex = F.expr(
        "concat("
        "'52494646', "  # 'RIFF'
        + _le_hex("36 + dsize", 4)  # RIFF chunk size
        + ", '57415645', "  # 'WAVE'
        "'666d7420', '10000000', "  # 'fmt ' + chunk size 16
        "'0100', "  # PCM
        + _le_hex("nch", 2)
        + ", "
        + _le_hex("sr", 4)
        + ", "
        + _le_hex("sr * nch * (bits DIV 8)", 4)  # byte rate
        + ", "
        + _le_hex("nch * (bits DIV 8)", 2)  # block align
        + ", "
        + _le_hex("bits", 2)
        + ", '64617461', "  # 'data'
        + _le_hex("dsize", 4)
        # sample fill: the md5 hex tiled to dsize bytes
        + ", substring(repeat(h, CAST(ceil(dsize / 16.0) AS INT)), 1, dsize * 2)"
        ")"
    )
    y4m_hex = F.expr(
        "concat("
        # ASCII stream header, newline-terminated
        "hex(concat('YUV4MPEG2 W', CAST(vw AS STRING), ' H', CAST(vh AS STRING),"
        " ' F25:1 Ip A1:1 C420jpeg', chr(10))), "
        # nfr frames, each 'FRAME\\n' + md5-tiled C420 plane bytes
        "repeat(concat('4652414d450a',"
        " substring(repeat(h, CAST(ceil(fsize / 16.0) AS INT)), 1, fsize * 2)), nfr)"
        ")"
    )
    return geom.select(
        "doc_id",
        F.when(F.col("media_type") == "image", F.unhex(bmp_hex))
        .when(F.col("media_type") == "audio", F.unhex(wav_hex))
        .otherwise(F.unhex(y4m_hex))
        .alias("media"),
        "media_type",
    )


def _fake_decode_meta(payload: bytes, media_type: str) -> tuple[int, int, int, int]:
    """Deterministic fake decode: dimensions derived from a content
    hash.  The fallback for media with no parseable container header
    (compressed codecs — no ffmpeg-class library in this container) —
    everything around it (schema, batching, partitioning) is the real
    production plumbing."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 + h[2] % 3
    n_frames = 1 if media_type != "video" else 8 + h[3] % 120
    return width, height, channels, n_frames


def _bmp_decode_meta(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """REAL image decode, no codec library needed: parse the BMP file
    header + DIB header with `struct` and return
    (width, height, channels, n_frames, pixel_offset).  Returns None
    on anything that is not a structurally valid BMP so callers can
    fall back."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    file_size, _res, pix_offset = struct.unpack_from("<III", payload, 2)
    (dib_size,) = struct.unpack_from("<I", payload, 14)
    if dib_size < 40:  # BITMAPCOREHEADER etc. — not emitted here
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    if planes != 1 or bpp not in (1, 4, 8, 16, 24, 32):
        return None
    if width <= 0 or height == 0:
        return None
    height = abs(height)  # negative = top-down row order
    if pix_offset > len(payload) or file_size > len(payload):
        return None
    channels = bpp // 8 if bpp >= 24 else (3 if bpp == 16 else 1)
    return width, height, channels, 1, pix_offset


def _ppm_decode_meta(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """Netpbm binary header parse (P5 grayscale / P6 RGB): magic,
    then whitespace/comment-separated width, height, maxval, then one
    whitespace byte before pixel data.  Returns the same tuple shape
    as :func:`_bmp_decode_meta`, or None."""
    if len(payload) < 7 or payload[:1] != b"P" or payload[1:2] not in b"56":
        return None
    channels = 3 if payload[1:2] == b"6" else 1
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":  # comment runs to end of line
            nl = payload.find(b"\n", pos)
            if nl < 0:
                return None
            pos = nl + 1
        elif c.isdigit():
            end = pos
            while end < len(payload) and payload[end : end + 1].isdigit():
                end += 1
            fields.append(int(payload[pos:end]))
            pos = end
        else:
            return None
    if len(fields) < 3 or not payload[pos : pos + 1].isspace():
        return None
    width, height, maxval = fields
    if width <= 0 or height <= 0 or not 0 < maxval < 65536:
        return None
    return width, height, channels, 1, pos + 1


def _image_header_meta(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """The default image kernel: try each pure-Python header parser in
    turn (BMP, then PPM/PGM)."""
    return _bmp_decode_meta(payload) or _ppm_decode_meta(payload)


def _wav_decode_meta(
    payload: bytes,
) -> tuple[int, int, int, int, int, int] | None:
    """REAL audio decode, no codec library needed: walk the RIFF
    chunk list with `struct` and return (sample_rate, bits_per_sample,
    channels, n_sample_frames, data_offset, data_size).  Returns None
    on anything that is not a structurally valid PCM WAV so callers
    can fall back."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt = 12, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt " and csize >= 16 and body + 16 <= len(payload):
            audio_fmt, nch, sr = struct.unpack_from("<HHI", payload, body)
            (bits,) = struct.unpack_from("<H", payload, body + 14)
            if audio_fmt != 1 or nch < 1 or sr <= 0 or bits not in (8, 16, 24, 32):
                return None  # non-PCM or malformed: not decodable here
            fmt = (sr, bits, nch)
        elif cid == b"data":
            if fmt is None:
                return None  # data before fmt: malformed
            sr, bits, nch = fmt
            dsize = min(csize, len(payload) - body)
            frames = dsize // (nch * (bits // 8))
            return sr, bits, nch, frames, body, dsize
        pos = body + csize + (csize & 1)  # RIFF chunks are word-aligned
    return None


# Y4M colorspace token → (bytes per w*h pixels numerator/denominator,
# channel count); C420 stores w*h luma + 2 quarter-size chroma planes.
# EXACT tokens only: prefix matching would silently mis-size variants
# like C444alpha (4 planes, not 3) or the 10/12-bit C420p10 family
# (2 bytes/sample) — unknown tokens must reject so callers fall back
# instead of walking frame markers at the wrong stride.
_Y4M_COLORSPACE = {
    "420jpeg": (3, 2, 3),
    "420mpeg2": (3, 2, 3),
    "420paldv": (3, 2, 3),
    "420": (3, 2, 3),
    "411": (3, 2, 3),
    "422": (4, 2, 3),
    "444": (6, 2, 3),
    "444alpha": (8, 2, 4),
    "mono": (2, 2, 1),
}


def _y4m_decode_meta(
    payload: bytes,
) -> tuple[int, int, int, int, int, int] | None:
    """REAL video decode, no codec library needed: parse the YUV4MPEG2
    ASCII stream header, then walk the actual ``FRAME`` markers
    counting whole frames present in the payload.  Returns (width,
    height, channels, n_frames, first_frame_offset, frame_size) or
    None on anything that is not a structurally valid Y4M stream."""
    if not payload.startswith(b"YUV4MPEG2"):
        return None
    nl = payload.find(b"\n", 0, 4096)  # header is short by spec
    if nl < 0:
        return None
    w = h = None
    cs = "420"  # Y4M default when no C tag present
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        try:
            if t.startswith("W"):
                w = int(t[1:])
            elif t.startswith("H"):
                h = int(t[1:])
            elif t.startswith("C"):
                cs = t[1:]
        except ValueError:
            return None
    if not w or not h or w <= 0 or h <= 0:
        return None
    if cs not in _Y4M_COLORSPACE:
        return None  # unknown/10-bit variant: wrong stride if guessed
    num, den, channels = _Y4M_COLORSPACE[cs]
    frame_size = (w * h * num) // den
    pos, n, first_off = nl + 1, 0, None
    while pos < len(payload) and payload[pos : pos + 5] == b"FRAME":
        fnl = payload.find(b"\n", pos, pos + 4096)
        if fnl < 0:
            break
        data = fnl + 1
        if data + frame_size > len(payload):
            break  # truncated trailing frame: not counted
        if first_off is None:
            first_off = data
        n += 1
        pos = data + frame_size
    if n == 0:
        return None
    return w, h, channels, n, first_off, frame_size


def _container_meta(payload: bytes, mtype: str) -> tuple[int, int, int, int] | None:
    """Route to the modality's pure-Python container parser and map
    its fields onto the fixed (width, height, channels, n_frames)
    metadata shape (see module docstring for the mapping).  None when
    the payload has no parseable container header."""
    if mtype == "image":
        parsed = _image_header_meta(payload)
        if parsed is not None:
            w, h, c, nf, _off = parsed
            return w, h, c, nf
    elif mtype == "audio":
        parsed = _wav_decode_meta(payload)
        if parsed is not None:
            sr, bits, nch, frames, _off, _dsize = parsed
            return sr, bits, nch, frames
    elif mtype == "video":
        parsed = _y4m_decode_meta(payload)
        if parsed is not None:
            w, h, c, nf, _off, _fsize = parsed
            return w, h, c, nf
    return None


def decode_media_meta(df: DataFrame) -> DataFrame:
    """``mapInPandas`` metadata extraction over binary payloads —
    Arrow batches in, Arrow batches out, no row-at-a-time Python.
    All three modalities decode for REAL (BMP/PPM, WAV, Y4M container
    parse over the actual bytes); only undecodable payloads fall back
    to the deterministic fake kernel."""

    def _batches(iterator):
        for pdf in iterator:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["media"], pdf["media_type"]
            ):
                payload = bytes(payload) if payload is not None else b""
                parsed = _container_meta(payload, mtype)
                if parsed is not None:
                    w, h, c, nf = parsed
                else:
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

    Image rows with a parseable container header (BMP/PPM) decode for
    REAL under every codec: dimensions from the parsed header, pixel
    bytes from the file's actual pixel-data section.  The codecs
    differ on everything else: ``codec='fake'`` (default) falls back
    to deterministic md5-derived buffers; ``codec='auto'``
    additionally tries PIL first for image rows when importable in
    this interpreter (arbitrary formats, not just BMP/PPM);
    ``codec='pil'``: require PIL — raises ``NotImplementedError``
    when the library is absent (this container), so a mis-configured
    production job fails loudly instead of silently degrading."""
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
        return (doc_id, mtype, pixels, w, h)
    if mtype == "image":
        parsed = _image_header_meta(payload)
        if parsed is not None:
            # real decode: dims from the parsed header, pixels from
            # the file's actual pixel-data section (zero-padded if
            # short)
            w, h, _, _, off = parsed
            return (doc_id, mtype, payload[off : off + 16].ljust(16, b"\x00"), w, h)
    elif mtype == "audio":
        wav = _wav_decode_meta(payload)
        if wav is not None:
            # real decode: first PCM bytes from the actual data chunk;
            # the decoded buffer's logical shape is frames × channels
            _sr, _bits, nch, frames, off, _dsize = wav
            return (doc_id, mtype, payload[off : off + 16].ljust(16, b"\x00"), frames, nch)
    elif mtype == "video":
        y4m = _y4m_decode_meta(payload)
        if y4m is not None:
            # real decode: first bytes of the first frame's Y plane
            w, h, _, _, off, _fsize = y4m
            return (doc_id, mtype, payload[off : off + 16].ljust(16, b"\x00"), w, h)
    w, h, _, _ = _fake_decode_meta(payload, mtype)
    return (doc_id, mtype, (hashlib.md5(payload).digest() * 4)[:16], w, h)


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


def _bmp_pixel_array(payload: bytes):
    """Decode a synthesized-class BMP to an (h, w, channels) uint8
    numpy array — bottom-up row order flipped to top-down, row padding
    stripped, palette indices resolved through the color table for
    8-bpp.  Pure numpy (no codec library); returns None for anything
    :func:`_bmp_decode_meta` rejects or a bit depth below 8."""
    import numpy as np

    parsed = _bmp_decode_meta(payload)
    if parsed is None:
        return None
    w, h, channels, _nf, off = parsed
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if bpp < 8:
        return None
    bytes_pp = bpp // 8
    rowsize = ((w * bytes_pp + 3) // 4) * 4
    need = rowsize * h
    data = payload[off : off + need]
    if len(data) < need:
        return None
    arr = np.frombuffer(data, dtype=np.uint8).reshape(h, rowsize)
    arr = arr[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    (raw_height,) = struct.unpack_from("<i", payload, 22)
    if raw_height > 0:  # positive height = bottom-up storage
        arr = arr[::-1]
    if bpp == 8:
        # resolve palette indices to gray via the BGRA color table's
        # blue byte (the synthesized palettes are grayscale).  The
        # table sits between the DIB header and the pixel data and may
        # hold FEWER than 256 entries (legal when biClrUsed < 256) or
        # be absent in a malformed file — an out-of-table pixel index
        # means undecodable, never an IndexError out of the kernel
        (dib_size,) = struct.unpack_from("<I", payload, 14)
        palette = np.frombuffer(
            payload[14 + dib_size : off], dtype=np.uint8
        )
        n_entries = len(palette) // 4
        idx = arr[:, :, 0].astype(np.int64)
        if n_entries == 0 or int(idx.max(initial=0)) >= n_entries:
            return None
        arr = palette[idx * 4][:, :, None]
    return arr


def _wav_sample_array(payload: bytes):
    """Decode a PCM WAV to a mono uint8 sample vector — 16-bit samples
    down-shifted to their high byte (offset to unsigned), channels
    averaged.  Pure numpy; returns None for anything
    :func:`_wav_decode_meta` rejects or an exotic bit depth."""
    import numpy as np

    parsed = _wav_decode_meta(payload)
    if parsed is None:
        return None
    _sr, bits, nch, frames, off, _dsize = parsed
    if bits not in (8, 16) or frames == 0:
        return None
    n = frames * nch
    if bits == 8:  # 8-bit PCM is unsigned by spec
        samples = np.frombuffer(payload, np.uint8, n, off).astype(np.float64)
    else:
        samples = (
            np.frombuffer(payload, np.dtype("<i2"), n, off).astype(np.float64)
            / 256.0
            + 128.0
        )
    return samples.reshape(frames, nch).mean(axis=1).astype(np.uint8)


def _y4m_frame_offsets(payload: bytes) -> list[int] | None:
    """Byte offsets of every frame's plane data in a Y4M stream —
    walked marker by marker rather than assuming a fixed stride,
    because the spec allows per-frame parameters (``FRAMEI...\\n``)
    that make marker lines variable-length."""
    parsed = _y4m_decode_meta(payload)
    if parsed is None:
        return None
    _w, _h, _c, n, first_off, frame_size = parsed
    offsets = [first_off]
    pos = first_off + frame_size
    while len(offsets) < n:
        fnl = payload.find(b"\n", pos, pos + 4096)
        if fnl < 0:
            break
        offsets.append(fnl + 1)
        pos = fnl + 1 + frame_size
    return offsets if len(offsets) == n else None


def _y4m_luma_plane(payload: bytes, frame_idx: int = 0):
    """Extract one frame's Y (luma) plane from a Y4M stream as an
    (h, w) uint8 numpy array.  Pure numpy; returns None for anything
    :func:`_y4m_decode_meta` rejects or an out-of-range index."""
    import numpy as np

    parsed = _y4m_decode_meta(payload)
    if parsed is None:
        return None
    w, h, _c, n, _first_off, _frame_size = parsed
    if not 0 <= frame_idx < n:
        return None
    offsets = _y4m_frame_offsets(payload)
    if offsets is None:
        return None
    return np.frombuffer(payload, np.uint8, w * h, offsets[frame_idx]).reshape(h, w)


def resize_media(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize decoded media to a ``width`` × ``height`` byte buffer.

    All three modalities resample for REAL when the container parses:
    images nearest-neighbor over the actual (grayscale-collapsed)
    pixel array; audio nearest-neighbor over the actual mono PCM
    sample sequence (the 1-D analog of spatial resize — width×height
    evenly-spaced samples); video nearest-neighbor over the first
    frame's actual Y plane.  Undecodable payloads keep the
    deterministic content-hash fake.  The Spark plumbing — schema,
    Arrow batching, partition preservation — is identical for every
    kernel, so a PIL/libvips/ffmpeg resample drops in without
    touching the operator."""

    def _batches(iterator):
        import numpy as np

        for pdf in iterator:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["media"], pdf["media_type"]
            ):
                payload = bytes(payload) if payload is not None else b""
                pixels = None
                if mtype == "image":
                    arr = _bmp_pixel_array(payload)
                    if arr is not None:
                        # nearest-neighbor index maps + channel mean →
                        # one byte per target pixel, any input depth
                        src_h, src_w = arr.shape[:2]
                        ys = (np.arange(height) * src_h) // height
                        xs = (np.arange(width) * src_w) // width
                        gray = arr.mean(axis=2, dtype=np.float64).astype(np.uint8)
                        pixels = gray[np.ix_(ys, xs)].tobytes()
                elif mtype == "audio":
                    samples = _wav_sample_array(payload)
                    if samples is not None:
                        idx = (
                            np.arange(width * height) * len(samples)
                        ) // (width * height)
                        pixels = samples[idx].tobytes()
                elif mtype == "video":
                    luma = _y4m_luma_plane(payload)
                    if luma is not None:
                        src_h, src_w = luma.shape
                        ys = (np.arange(height) * src_h) // height
                        xs = (np.arange(width) * src_w) // width
                        pixels = luma[np.ix_(ys, xs)].tobytes()
                if pixels is None:
                    # fake kernel: content hash tiled to the same
                    # 1-byte-per-pixel buffer shape as the real path
                    digest = hashlib.md5(payload).digest()
                    n = (width * height + 15) // 16
                    pixels = (digest * n)[: width * height]
                rows.append((doc_id, mtype, pixels, width, height))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.mapInPandas(_batches, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling over video payloads (UDTF-shaped: one input row
    fans out to ``n_frames`` output rows through mapInPandas).

    Y4M payloads sample for REAL: ``n_frames`` evenly-spaced indices
    over the container's actual frame count, each emitting the
    frame's raw C420 plane bytes sliced straight out of the stream.
    Undecodable payloads emit deterministic fake frames so the fan-out
    shape is invariant (exactly ``n_frames`` rows per video row)."""

    def _batches(iterator):
        for pdf in iterator:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["media"], pdf["media_type"]
            ):
                if mtype != "video":
                    continue
                payload = bytes(payload) if payload is not None else b""
                parsed = _y4m_decode_meta(payload)
                offsets = _y4m_frame_offsets(payload) if parsed else None
                if parsed is not None and offsets is not None:
                    _w, _h, _c, total, _first_off, frame_size = parsed
                    for k in range(n_frames):
                        off = offsets[(k * total) // n_frames]
                        rows.append((doc_id, k, payload[off : off + frame_size]))
                else:
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
    """Feature extraction over media payloads: a deterministic
    unit-norm ``float[dim]`` embedding per row.

    All three modalities featurize from REAL decoded content when the
    container parses: images a 32-bin grayscale intensity histogram
    plus nearest-neighbor-sampled row/column mean profiles; audio a
    32-bin amplitude histogram plus 32 windowed RMS-energy values
    over the actual PCM samples; video the first frame's 32-bin luma
    histogram plus per-frame mean-luma profile (motion envelope),
    each tiled/truncated to ``dim`` — content-derived in the way a
    learned embedding is (identical content embeds identically;
    edits move the vector), while staying codec-library-free.
    Undecodable payloads keep the counter-mode-md5 fake (a model
    forward pass stands behind the same interface; no inference
    runtime ships in this container).

    The Spark plumbing is what a model-backed kernel needs:
    Arrow-batched ``mapInPandas`` (a model would load once per python
    worker, amortized over batches, NOT once per row), a typed
    ``array<float>`` output that feeds the similarity operators
    directly (``ann_topk``/``ann_topk_blas``/IVF), and
    numpy-vectorized math per row.
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")

    def _batches(iterator):
        import numpy as np

        def _fake(payload: bytes) -> "np.ndarray":
            # expand the 16-byte digest into dim pseudo-random
            # floats (counter-mode md5)
            need = (dim * 4 + 15) // 16
            buf = b"".join(
                hashlib.md5(payload + k.to_bytes(4, "big")).digest()
                for k in range(need)
            )
            v = np.frombuffer(buf[: dim * 4], dtype=np.uint32).astype(np.float64)
            return (v / 2**32) * 2.0 - 1.0

        def _tile(base: "np.ndarray") -> "np.ndarray":
            reps = (dim + len(base) - 1) // len(base)
            return np.tile(base, reps)[:dim]

        def _real_image(arr) -> "np.ndarray":
            gray = arr.mean(axis=2, dtype=np.float64)
            hist, _ = np.histogram(gray, bins=32, range=(0.0, 256.0))
            hist = hist / max(1, gray.size)
            h, w = gray.shape
            ys = (np.arange(16) * h) // 16
            xs = (np.arange(16) * w) // 16
            rows_prof = gray[ys].mean(axis=1) / 255.0
            cols_prof = gray[:, xs].mean(axis=0) / 255.0
            return _tile(np.concatenate([hist, rows_prof, cols_prof]))

        def _real_audio(samples) -> "np.ndarray":
            hist, _ = np.histogram(samples, bins=32, range=(0.0, 256.0))
            hist = hist / max(1, samples.size)
            # 32 windowed RMS values over the centered waveform: the
            # coarse energy envelope a spectral frontend would refine
            idx = (np.arange(33) * len(samples)) // 32
            centered = samples.astype(np.float64) - 128.0
            rms = np.array([
                np.sqrt(np.mean(centered[a:b] ** 2)) / 128.0 if b > a else 0.0
                for a, b in zip(idx[:-1], idx[1:])
            ])
            return _tile(np.concatenate([hist, rms]))

        def _real_video(payload: bytes) -> "np.ndarray | None":
            # parse the container ONCE and index planes by offset:
            # going through _y4m_luma_plane per sample would re-walk
            # every frame marker ~65 times per row
            parsed = _y4m_decode_meta(payload)
            offsets = _y4m_frame_offsets(payload) if parsed else None
            if parsed is None or offsets is None:
                return None
            w, h, _c, total, _off, _fs = parsed

            def plane(i: int):
                return np.frombuffer(payload, np.uint8, w * h, offsets[i])

            luma0 = plane(0)
            hist, _ = np.histogram(luma0, bins=32, range=(0.0, 256.0))
            hist = hist / max(1, luma0.size)
            # per-frame mean luma, nearest-neighbor-sampled to 32: a
            # coarse motion/brightness envelope across real frames
            means = np.array([
                float(plane((k * total) // 32).mean()) / 255.0
                for k in range(32)
            ])
            return _tile(np.concatenate([hist, means]))

        for pdf in iterator:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["media"], pdf["media_type"]
            ):
                payload = bytes(payload) if payload is not None else b""
                v = None
                if mtype == "image":
                    arr = _bmp_pixel_array(payload)
                    if arr is not None:
                        v = _real_image(arr)
                elif mtype == "audio":
                    samples = _wav_sample_array(payload)
                    if samples is not None and samples.size:
                        v = _real_audio(samples)
                elif mtype == "video":
                    v = _real_video(payload)
                if v is None:
                    v = _fake(payload)
                v = v / (np.linalg.norm(v) or 1.0)
                rows.append((doc_id, mtype, v.astype(np.float32).tolist()))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return df.mapInPandas(_batches, schema=FEATURES_SCHEMA)
