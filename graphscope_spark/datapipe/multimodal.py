"""Multimodal binary-column plumbing: decode / feature-extract over opaque
``binary`` payloads (image/audio/video) via Arrow-batched ``mapInPandas``.

Decode is dependency-free for the formats a header/raster parse can handle
(PPM/PGM ``P6``/``P5``, uncompressed 8/24/32-bit BMP, PCM WAV headers);
compressed codecs (jpeg/png/ogg/...) need libraries NOT in this container
and stay behind ``NotImplementedError``. The Spark-side plumbing is real
and tested either way: schema contracts, Arrow batch iteration,
partition-preserving mapInPandas, and typed metadata extraction (byte
length, digest, magic-byte sniff, decoded dimensions) that a production
pipeline runs before/after decode.

At 100 TB the pattern matters more than the stub: binary columns stream
through executors in Arrow batches (``maxRecordsPerBatch`` bounds memory for
multi-MB payloads), metadata extraction is vectorized NumPy/pandas, and the
expensive decode is per-partition so one Python worker amortizes codec
setup across a whole batch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
    ]
)

_MAGIC = [
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG", "png"),
    (b"RIFF", "riff"),
    (b"OggS", "ogg"),
    (b"P6", "ppm"),
    (b"P5", "pgm"),
    (b"BM", "bmp"),
]


def _sniff(b: bytes) -> str:
    for magic, kind in _MAGIC:
        if b.startswith(magic):
            return kind
    return "unknown"


def _pnm_header(b: bytes):
    """Parse a P5/P6 netpbm header: magic, whitespace/comment-separated
    width height maxval, single whitespace, then the raster. Returns
    (width, height, channels, maxval, raster_offset) or None."""
    if not (b.startswith(b"P6") or b.startswith(b"P5")):
        return None
    channels = 3 if b[:2] == b"P6" else 1
    fields, i, n = [], 2, len(b)
    while len(fields) < 3 and i < n:
        while i < n and b[i : i + 1].isspace():
            i += 1
        if i < n and b[i : i + 1] == b"#":  # comment to end of line
            while i < n and b[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < n and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            return None
        fields.append(b[i:j])
        i = j
    if len(fields) < 3 or i >= n:
        return None
    i += 1  # exactly one whitespace byte before the raster
    try:
        w, h, maxval = (int(f) for f in fields)
    except ValueError:
        return None
    return (w, h, channels, maxval, i)


def _bmp_header(b: bytes):
    """Parse a BITMAPINFOHEADER BMP. Returns (width, height, channels,
    maxval, raster_offset) or None; only uncompressed 8/24/32 bpp."""
    if not b.startswith(b"BM") or len(b) < 54:
        return None
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if comp != 0 or bpp not in (8, 24, 32):
        return None
    return (w, abs(h), bpp // 8, 255, off)


def _png_header(b: bytes):
    """Parse a PNG IHDR chunk (always first after the 8-byte signature).
    Returns (width, height, channels, maxval, None) — raster offset None
    because the IDAT stream is zlib-compressed (header-only metadata)."""
    if not b.startswith(b"\x89PNG\r\n\x1a\n") or len(b) < 26:
        return None
    if b[12:16] != b"IHDR":
        return None
    w = int.from_bytes(b[16:20], "big")
    h = int.from_bytes(b[20:24], "big")
    depth, color = b[24], b[25]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None or depth not in (1, 2, 4, 8, 16):
        return None
    return (w, h, channels, (1 << depth) - 1, None)


# SOF segment markers that carry frame dimensions (C0-CF minus DHT/JPG/DAC)
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def _jpeg_header(b: bytes):
    """Walk JPEG segments to the first SOFn frame header. Returns
    (width, height, channels, maxval, None) — entropy-coded data needs a
    codec, so the raster offset is None (header-only metadata)."""
    if not b.startswith(b"\xff\xd8") or len(b) < 4:
        return None
    i, n = 2, len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # standalone
            i += 2
            continue
        if i + 4 > n:
            return None
        seglen = int.from_bytes(b[i + 2 : i + 4], "big")
        if marker in _JPEG_SOF:
            if i + 10 > n or seglen < 8:
                return None
            precision = b[i + 4]
            h = int.from_bytes(b[i + 5 : i + 7], "big")
            w = int.from_bytes(b[i + 7 : i + 9], "big")
            ch = b[i + 9]
            return (w, h, ch, (1 << precision) - 1, None)
        i += 2 + seglen
    return None


def parse_image_header(payload: bytes):
    """Dependency-free header parse → dict(kind, width, height, channels,
    maxval) for PPM/PGM/BMP (raster-decodable) plus PNG/JPEG (header-only
    dimensions — the compressed raster still needs a codec library); None
    for anything else."""
    b = payload or b""
    for parser in (_pnm_header, _bmp_header, _png_header, _jpeg_header):
        got = parser(b)
        if got is not None:
            w, h, ch, maxval, _ = got
            return {
                "kind": _sniff(b),
                "width": w,
                "height": h,
                "channels": ch,
                "maxval": maxval,
            }
    return None


def decode_image(payload: bytes):
    """Decode PPM/PGM/BMP rasters to an (h, w, channels) uint8 numpy array
    without any imaging library. Compressed codecs (jpeg/png/...) raise
    ``NotImplementedError`` — those libraries are absent in this container;
    a production image column swaps this one function for PIL/turbojpeg
    while every Spark-side contract around it stays identical."""
    import numpy as np

    b = payload or b""
    got = _pnm_header(b)
    if got is not None:
        w, h, ch, maxval, off = got
        if maxval > 255:
            raise NotImplementedError("16-bit netpbm rasters not supported")
        need = w * h * ch
        raster = np.frombuffer(b, dtype=np.uint8, count=need, offset=off)
        return raster.reshape(h, w, ch)
    got = _bmp_header(b)
    if got is not None:
        w, h, ch, _, off = got
        stride = (w * ch + 3) // 4 * 4  # rows padded to 4 bytes
        rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
        img = rows.reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
        return img[::-1].copy()  # BMP stores rows bottom-up
    kind = _sniff(b)
    raise NotImplementedError(
        f"no dependency-free decoder for {kind!r} payloads in this environment"
    )


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(doc_id, n_bytes, digest, kind, width, height, channels) via
    mapInPandas. Digest is md5 hex — chosen because DuckDB reproduces it,
    making even the UDF path oracle-checkable. width/height/channels come
    from the dependency-free header decode (``parse_image_header``) and are
    NULL for payloads only a codec library could open."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            hdrs = payloads.map(parse_image_header)
            dim = lambda k: hdrs.map(  # noqa: E731
                lambda d: d[k] if d is not None else None
            ).astype("Int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(b if b is not None else b"").hexdigest()
                    ),
                    "kind": payloads.map(lambda b: _sniff(b or b"")),
                    "width": dim("width"),
                    "height": dim("height"),
                    "channels": dim("channels"),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame-sampling plumbing: emit (doc_id, frame_idx) rows for
    frames 0, every_n, 2·every_n, ... based on a deterministic fake frame
    count (payload_len // 1024 + 1) standing in for the codec's metadata
    probe. The explode + downstream partitioning is the real scale shape."""
    n_frames = (F.length(F.col(payload_col)) / F.lit(1024)).cast("long") + 1
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("bits_per_sample", T.LongType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def parse_wav_header(payload: bytes):
    """Parse a RIFF/WAVE header (PCM or IEEE-float) dependency-free →
    dict(kind, sample_rate, channels, bits_per_sample, n_samples) or None.
    Walks RIFF chunks to 'fmt ' and 'data' (handles odd-length padding and
    extra chunks like LIST/fact)."""
    b = payload or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, n = 12, len(b)
    fmt, data_len = None, None
    while i + 8 <= n:
        cid = b[i : i + 4]
        clen = int.from_bytes(b[i + 4 : i + 8], "little")
        body = b[i + 8 : i + 8 + clen]
        if cid == b"fmt " and clen >= 16:
            audio_fmt = int.from_bytes(body[0:2], "little")
            if audio_fmt not in (1, 3):  # PCM / IEEE float only
                return None
            fmt = {
                "channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "bits_per_sample": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or fmt["channels"] == 0 or fmt["bits_per_sample"] == 0:
        return None
    frame = fmt["channels"] * fmt["bits_per_sample"] // 8
    n_samples = (data_len // frame) if (data_len and frame) else 0
    return {"kind": "wav", **fmt, "n_samples": n_samples}


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(doc_id, n_bytes, digest, kind, sample_rate, channels,
    bits_per_sample, n_samples) — the audio twin of `extract_features`,
    same Arrow-batched mapInPandas shape; WAV fields are NULL for payloads
    that need a codec library (mp3/ogg/flac)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            hdrs = payloads.map(lambda b: parse_wav_header(b or b""))
            fld = lambda k: hdrs.map(  # noqa: E731
                lambda d: d[k] if d is not None else None
            ).astype("Int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(b if b is not None else b"").hexdigest()
                    ),
                    "kind": payloads.map(
                        lambda b: "wav"
                        if parse_wav_header(b or b"") is not None
                        else _sniff(b or b"")
                    ),
                    "sample_rate": fld("sample_rate"),
                    "channels": fld("channels"),
                    "bits_per_sample": fld("bits_per_sample"),
                    "n_samples": fld("n_samples"),
                }
            )

    return df.mapInPandas(batches, AUDIO_SCHEMA)
