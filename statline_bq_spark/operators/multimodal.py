"""Multimodal (image/audio/video) column plumbing (north star, BASELINE.json).

Media payloads are opaque ``binary`` columns with typed metadata riding
alongside — the pattern that scales: Spark shuffles/stores bytes without
interpreting them, and interpretation happens in Arrow-batched Python only
where genuinely needed.

What's real here: schemas, binary metadata extraction (pure JVM
expressions), partition-friendly bucketing, and the ``mapInPandas``
plumbing (signatures, batch shapes, output schemas) for decode /
feature-extract / frame-sample. The actual codec work is STUBBED — the
image/audio libraries are not available in this environment — behind
``decoder=`` hooks; ``deterministic_fake_decoder`` stands in so the
distributed plumbing is testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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

#: Canonical schema for a media table: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def binary_metadata(
    df: DataFrame, *, id_col: str, payload_col: str, n_buckets: int = 16
) -> DataFrame:
    """Pure-JVM metadata over a binary column: byte length, SHA-256 digest,
    and a stable storage bucket. No Python in the loop; at 100 TB this is a
    single narrow pass suitable as a pre-partitioning step
    (``write.partitionBy("bucket")``)."""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("digest"),
        F.pmod(F.col(id_col), F.lit(n_buckets)).alias("bucket"),
    )


def _make_fake_decoder() -> Callable[[bytes, int], list[float]]:
    def fake(payload: bytes, dim: int = 8) -> list[float]:
        h = hashlib.sha256(payload or b"").digest()
        return [h[i] / 255.0 for i in range(dim)]

    return fake


#: Stand-in for a real image/audio decoder: derives ``dim`` floats in
#: [0, 1) from the SHA-256 of the payload. Deterministic → testable.
#: Built as a closure instance so cloudpickle ships it BY VALUE to executor
#: Python workers — a plain module-level function would be pickled by
#: reference and require this package on every worker's PYTHONPATH.
deterministic_fake_decoder = _make_fake_decoder()


def extract_features(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    dim: int = 8,
    decoder: Callable[[bytes, int], list[float]] | None = None,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow-batched).

    ``decoder`` is the pluggable codec hook. Passing ``None`` raises
    ``NotImplementedError`` from inside the stub — a real deployment plugs
    e.g. a PIL/torchvision decode; tests plug
    ``deterministic_fake_decoder``. The Spark-side contract (schema,
    batching, partition behavior) is identical either way.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("feature", ArrayType(FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None:
                raise NotImplementedError(
                    "no media codec available in this environment; "
                    "pass decoder= (e.g. deterministic_fake_decoder)"
                )
            # NULL payload (failed fetch) → NULL feature: decoding b"" would
            # fabricate a real-looking vector for media that was never
            # retrieved, silently polluting downstream similarity searches
            feats = [
                None if p is None else decoder(bytes(p), dim)
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {"media_id": pdf[id_col].astype("int64"), "feature": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def _make_fake_resizer() -> Callable[[bytes, int, int], bytes]:
    def fake(payload: bytes, width: int, height: int) -> bytes:
        # Deterministic stand-in for a real image resample: cycle the source
        # bytes to exactly width*height output bytes (1 byte/px grayscale).
        n = width * height
        src = payload or b"\x00"
        reps = -(-n // len(src))
        return (src * reps)[:n]

    return fake


#: Stand-in for a real image resampler (PIL/libvips not in this
#: environment). Closure instance → cloudpickle ships it by value.
deterministic_fake_resizer = _make_fake_resizer()

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)


def resize(
    df: DataFrame,
    *,
    width: int,
    height: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize media payloads via ``mapInPandas`` (Arrow-batched).

    Same contract pattern as :func:`extract_features`: ``resizer`` is the
    pluggable codec hook (``None`` → ``NotImplementedError`` from inside the
    stub; tests plug ``deterministic_fake_resizer``). Output carries the
    new dimensions as typed metadata so downstream partitioning/filtering
    stays JVM-side.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if resizer is None:
                raise NotImplementedError(
                    "no image codec available in this environment; "
                    "pass resizer= (e.g. deterministic_fake_resizer)"
                )
            out = [
                resizer(bytes(p) if p is not None else b"", width, height)
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-sampling *plan*: one row per (media, frame_ts) to decode.

    The expansion is pure JVM (``sequence`` + ``explode``); the decode of
    each planned frame is the stubbed Python step. Separating plan from
    decode lets Spark repartition the frame workload independently of the
    source media layout — the key to balanced video processing.
    """
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
