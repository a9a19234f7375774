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

    # NULL-id rows are excluded (round 8, NULL-PK dirty class): the
    # feature row is keyed by media_id (MEDIA_SCHEMA declares it
    # non-null) — an id-less feature can't be joined back, and a NULL in
    # the pandas batch would coerce the int64 id column to float64,
    # corrupting 19-digit ids before the UDF even runs.
    return (
        df.filter(F.col(id_col).isNotNull())
        .select(id_col, payload_col)
        .mapInPandas(run, out_schema)
    )


def _parse_netpbm(b: bytes) -> tuple[int, int, bytes] | None:
    """Binary netpbm (P5 grayscale / P6 RGB, maxval <= 255) → (width,
    height, top-down grayscale bytes). Returns None on anything else —
    ASCII variants, 16-bit samples, truncated rasters."""
    if len(b) < 2 or b[:1] != b"P" or b[1:2] not in (b"5", b"6"):
        return None
    is_rgb = b[1:2] == b"6"
    # header tokenizer: whitespace-separated ints, '#' comments to EOL
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            nl = b.find(b"\n", pos)
            if nl < 0:
                return None
            pos = nl + 1
            continue
        start = pos
        while pos < len(b) and b[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            return None
        fields.append(int(b[start:pos]))
    w, h, maxval = fields
    if w <= 0 or h <= 0 or not 0 < maxval <= 255:
        return None
    # exactly one whitespace byte separates header from raster; a
    # non-whitespace byte here means a malformed header that would
    # otherwise silently shift the raster by one
    if not b[pos : pos + 1].isspace():
        return None
    pos += 1
    n = w * h
    if is_rgb:
        raster = b[pos : pos + 3 * n]
        if len(raster) < 3 * n:
            return None
        gray = bytes(
            min(
                255,
                (
                    299 * raster[3 * i]
                    + 587 * raster[3 * i + 1]
                    + 114 * raster[3 * i + 2]
                )
                # fold the maxval<255 rescale into the luma divide so a
                # full-bright maxval=100 pixel reads 255, not ~100
                * 255
                // (1000 * maxval),
            )
            for i in range(n)
        )
    else:
        raw = b[pos : pos + n]
        if len(raw) < n:
            return None
        gray = (
            raw
            if maxval == 255
            else bytes(min(255, v * 255 // maxval) for v in raw)
        )
    return w, h, gray


def _parse_bmp(b: bytes) -> tuple[int, int, bytes] | None:
    """Uncompressed BI_RGB BMP (24-bit true color or 8-bit paletted) →
    (width, height, top-down grayscale bytes). Returns None on other
    depths/compressions or malformed headers."""
    import struct

    if len(b) < 54 or b[:2] != b"BM":
        return None
    (pix_off,) = struct.unpack_from("<I", b, 10)
    (hdr_size,) = struct.unpack_from("<I", b, 14)
    if hdr_size < 40:
        return None
    w, h_signed = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    (compression,) = struct.unpack_from("<I", b, 30)
    if w <= 0 or h_signed == 0 or compression != 0:
        return None
    top_down = h_signed < 0
    h = abs(h_signed)
    if bpp == 24:
        stride = ((w * 3 + 3) // 4) * 4
        if len(b) < pix_off + stride * h:
            return None
        rows = []
        for r in range(h):
            src = r if top_down else h - 1 - r
            base = pix_off + src * stride
            rows.append(
                bytes(
                    (
                        299 * b[base + 3 * c + 2]  # BGR order
                        + 587 * b[base + 3 * c + 1]
                        + 114 * b[base + 3 * c]
                    )
                    // 1000
                    for c in range(w)
                )
            )
        return w, h, b"".join(rows)
    if bpp == 8:
        pal_off = 14 + hdr_size
        n_colors = struct.unpack_from("<I", b, 46)[0] or 256
        if len(b) < pal_off + 4 * n_colors:
            return None
        lut = bytes(
            (
                299 * b[pal_off + 4 * i + 2]
                + 587 * b[pal_off + 4 * i + 1]
                + 114 * b[pal_off + 4 * i]
            )
            // 1000
            for i in range(n_colors)
        )
        stride = ((w + 3) // 4) * 4
        if len(b) < pix_off + stride * h:
            return None
        rows = []
        for r in range(h):
            src = r if top_down else h - 1 - r
            base = pix_off + src * stride
            row = b[base : base + w]
            if max(row) >= n_colors:
                return None
            rows.append(bytes(lut[p] for p in row))
        return w, h, b"".join(rows)
    return None


def decode_image(payload: bytes) -> tuple[int, int, bytes] | None:
    """Dependency-free decode of PPM/PGM (binary) and BMP (uncompressed
    24/8-bit) payloads → (width, height, top-down grayscale bytes), or
    None when the payload is not a supported image. Pure stdlib, so the
    in-sandbox pipeline exercises real pixel bytes end-to-end instead of
    the metadata fallback (round-8 directive; real deployments still plug
    PIL/libvips via the same hook)."""
    return _parse_netpbm(payload) or _parse_bmp(payload)


def _make_image_decoder() -> Callable[[bytes, int], list[float] | None]:
    def dec(payload: bytes, dim: int = 8) -> list[float] | None:
        img = decode_image(payload or b"")
        if img is None:
            return None  # undecodable → NULL feature, like a NULL payload
        _w, _h, gray = img
        n = len(gray)
        out = []
        for k in range(dim):
            lo, hi = (k * n) // dim, ((k + 1) * n) // dim
            seg = gray[lo:hi]
            out.append(sum(seg) / (255.0 * len(seg)) if seg else 0.0)
        return out

    return dec


#: REAL in-sandbox codec hook: decodes PPM/PGM/BMP payloads and emits
#: ``dim`` mean-intensity bands in [0, 1] (an actual, if minimal, image
#: feature). Same ``(payload, dim) -> list[float] | None`` contract as
#: :data:`deterministic_fake_decoder`; undecodable bytes yield NULL
#: features rather than poisoning downstream similarity search. Closure
#: instance so cloudpickle ships it by value to executor workers.
image_decoder = _make_image_decoder()


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

    # NULL-id rows excluded — same id contract as extract_features
    return (
        df.filter(F.col(id_col).isNotNull())
        .select(id_col, payload_col)
        .mapInPandas(run, RESIZED_SCHEMA)
    )


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
