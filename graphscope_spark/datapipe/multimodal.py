"""Multimodal binary-column plumbing: decode / feature-extract over opaque
``binary`` payloads (image/audio/video) via Arrow-batched ``mapInPandas``.

The decode libraries (PIL/ffmpeg/...) are NOT in this container, so the
actual codec step is stubbed behind ``NotImplementedError`` with a
deterministic fallback — but the Spark-side plumbing is real and tested:
schema contracts, Arrow batch iteration, partition-preserving mapInPandas,
and typed metadata extraction (byte length, digest, magic-byte sniff) that a
production pipeline runs before/after decode.

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
    ]
)

_MAGIC = [
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG", "png"),
    (b"RIFF", "riff"),
    (b"OggS", "ogg"),
]


def _sniff(b: bytes) -> str:
    for magic, kind in _MAGIC:
        if b.startswith(magic):
            return kind
    return "unknown"


def decode_image(payload: bytes) -> "object":
    """Real decode requires an imaging library not present in this container.
    Stubbed; the pipeline shape around it is fully exercised."""
    raise NotImplementedError("image codec not available in this environment")


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(doc_id, n_bytes, digest, kind) via mapInPandas. Digest is md5 hex —
    chosen because DuckDB reproduces it, making even the UDF path
    oracle-checkable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(b if b is not None else b"").hexdigest()
                    ),
                    "kind": payloads.map(lambda b: _sniff(b or b"")),
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
