"""Sequence packing & mixture resampling (north-star training-pipeline ops).

Two operators a 100 TB pretraining pipeline runs after cleaning/dedup:

- :func:`pack_sequences` — "concatenate-then-chunk" packing: lay every
  document of a stream end-to-end in a deterministic order and cut the
  token stream every ``capacity`` tokens (GPT-style pretraining batches).
  Each document's byte position in the virtual concatenation is an
  exclusive prefix sum of token counts; the sequence id is
  ``floor(offset / capacity)``.
- :func:`mixture_sample` — deterministic temperature resampling of a
  multi-source corpus: downsample over-represented sources so the kept
  distribution follows ``n_s**alpha`` (alpha<1 flattens), keeping the
  smallest source intact. Membership is content-hashed (md5), so a row's
  fate is stable under re-runs, repartitioning, and appends — the same
  policy as :mod:`.sampling`'s ``hash_split``.

Scale design — the prefix sum is the interesting part. A naive
``sum() OVER (PARTITION BY stream ORDER BY doc)`` puts an entire stream
(possibly the whole corpus) into ONE task: a scale-killer. Instead the
offsets come from a two-level scan, every stage bounded:

1. block a stream into fixed-size ranges of the order key (``block_size``
   docs max per block);
2. cumulative sum WITHIN each block — window partitions are ≤ block_size
   rows, parallel across blocks;
3. per-block totals (one row per block) get their own running sum — a
   window over #blocks rows (millions of docs → thousands of rows), then
   broadcast-joined back.

The result is identical to the single-window form (the oracle uses the
plain window), but no task ever sees more than ``block_size`` rows or
#blocks summary rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _block_prefix_offsets(
    df: DataFrame,
    stream_key: str,
    order_key: str,
    weight_col: str,
    *,
    block_size: int,
    out_col: str,
) -> DataFrame:
    """Exclusive prefix sum of ``weight_col`` per stream in ``order_key``
    order, via the two-level block scan described in the module docstring.

    Requires ``order_key`` to be a numeric, per-stream-unique column (the
    deterministic concatenation order). Adds ``out_col``; preserves all
    input columns. A NULL weight contributes ZERO to the stream (the row
    keeps a well-defined offset): without the coalesce, the row's own
    ``prefix + within - weight`` arithmetic goes NULL and poisons every
    derived position for that row.
    """
    # (SQL-text construction, round 12 driver-floor batching: identical
    # window specs, coalesce/cast trees and null-safe join, one py4j
    # round trip per expression)
    w0 = f"coalesce(`{weight_col}`, 0)"
    df = df.selectExpr(
        "*", f"CAST(`{order_key}` / {int(block_size)} AS bigint) AS _pk_blk"
    )
    # (2) within-block running sum — bounded partitions, parallel.
    df = df.selectExpr(
        "*",
        f"sum({w0}) OVER (PARTITION BY `{stream_key}`, _pk_blk"
        f" ORDER BY `{order_key}`"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _pk_within",
    )
    # (3) block totals (#blocks rows) → exclusive running sum over blocks.
    totals = df.groupBy(stream_key, "_pk_blk").agg(
        F.expr(f"sum({w0}) AS _pk_tot")
    )
    prefix = totals.selectExpr(
        f"`{stream_key}`",
        "_pk_blk",
        f"coalesce(sum(_pk_tot) OVER (PARTITION BY `{stream_key}`"
        " ORDER BY _pk_blk"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        " AS _pk_prefix",
    )
    # null-safe on the stream key: a NULL stream is a stream like any other
    # (the windows above already treat it as one partition); a plain
    # equi-join would silently drop its rows here
    prefix = prefix.withColumnRenamed(stream_key, "_pk_sk").withColumnRenamed(
        "_pk_blk", "_pk_pblk"
    )
    out = df.join(
        F.broadcast(prefix),
        F.col(stream_key).eqNullSafe(F.col("_pk_sk"))
        & (F.col("_pk_blk") == F.col("_pk_pblk")),
    ).selectExpr(
        "*",
        f"CAST(_pk_prefix + _pk_within - {w0} AS bigint) AS `{out_col}`",
    )
    return out.drop("_pk_blk", "_pk_pblk", "_pk_within", "_pk_prefix", "_pk_sk")


def pack_sequences(
    df: DataFrame,
    stream_key: str,
    order_key: str,
    token_col: str,
    capacity: int,
    *,
    block_size: int = 4096,
    offset_alias: str = "start_offset",
    seq_alias: str = "seq_id",
    spans_alias: str = "n_seqs_spanned",
) -> DataFrame:
    """Assign each document a position in the concatenate-then-chunk token
    stream of its ``stream_key`` (e.g. language), ordered by ``order_key``.

    Emits, per input row: ``start_offset`` (tokens before this doc in the
    stream), ``seq_id`` (= start_offset // capacity — the training sequence
    this doc starts in) and ``n_seqs_spanned`` (how many capacity-sized
    sequences the doc crosses; 1 = fits inside one).

    Documents ARE split across sequence boundaries — that is the point of
    this packing style (zero padding waste); consumers that need intact
    documents should filter ``n_seqs_spanned = 1`` or re-chunk with
    :func:`..functions.text.chunk_expr`.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    # NULL-order-key rows are excluded (round 8, NULL-PK dirty class): the
    # stream position is defined by the order key, and a NULL key's place
    # in the concatenation is engine-defined (Spark sorts NULL first,
    # ANSI-default engines last) — an id-less doc has no stable offset.
    df = df.filter(F.col(order_key).isNotNull())
    out = _block_prefix_offsets(
        df,
        stream_key,
        order_key,
        token_col,
        block_size=block_size,
        out_col=offset_alias,
    )
    start = f"`{offset_alias}`"
    end_incl = f"{start} + greatest(`{token_col}`, 1) - 1"
    return out.selectExpr(
        "*",
        f"CAST(floor({start} / {int(capacity)}) AS bigint)"
        f" AS `{seq_alias}`",
    ).selectExpr(
        "*",
        f"CAST(floor(({end_incl}) / {int(capacity)})"
        f" - floor({start} / {int(capacity)}) + 1 AS bigint)"
        f" AS `{spans_alias}`",
    )


def _md5_uniform(key: Column, *, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1) from the first 4 hex chars of
    md5(salt || key) — 65,536 distinct levels, reproducible in any engine
    with an md5 function (the DuckDB oracle re-derives it from hex chars).
    """
    raw = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 4),
        16,
        10,
    ).cast("double")
    return raw / F.lit(65536.0)


def mixture_sample(
    df: DataFrame,
    source_col: str,
    key: str | Column,
    *,
    alpha: float = 0.5,
    salt: str = "mix",
    rate_alias: str = "keep_rate",
    keep_alias: str = "keep",
) -> DataFrame:
    """Temperature-resample a multi-source corpus: mark each row keep/drop
    so kept counts follow ``n_s ** alpha`` (renormalized to keep the
    smallest source whole). ``alpha=1`` keeps everything; ``alpha=0``
    equalizes sources to the smallest one's size.

    keep_rate(s) = (n_min / n_s) ** (1 - alpha)  — 1.0 for the smallest
    source, shrinking as a source grows. A row is kept when its md5-hash
    uniform < keep_rate. Both the rate arithmetic (exact-integer division,
    one ``pow``) and the hash threshold are bit-deterministic, so the
    selection — not just the counts — is reproducible across engines.

    Scale: one count-per-source aggregate (#sources rows, broadcast back);
    the corpus itself is never shuffled — keep/drop is a map-side filter.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    key_col = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_mx_n"))
    n_min = counts.agg(F.min("_mx_n").alias("_mx_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        source_col,
        F.pow(
            F.col("_mx_min").cast("double") / F.col("_mx_n").cast("double"),
            F.lit(1.0 - alpha),
        ).alias(rate_alias),
    )
    # null-safe join: groupBy treats a NULL source as its own group, so the
    # rates side HAS a NULL-source row — joining on plain equality would
    # silently drop every NULL-source document instead of sampling that
    # group like any other
    joined = df.join(
        F.broadcast(rates.withColumnRenamed(source_col, "_mx_src")),
        F.col(source_col).eqNullSafe(F.col("_mx_src")),
    ).drop("_mx_src")
    return joined.withColumn(
        keep_alias, _md5_uniform(key_col, salt=salt) < F.col(rate_alias)
    )
