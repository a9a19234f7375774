"""Gopher-style quality-filter cascade with a per-rule funnel report.

Shared core for the batch query (``workload.q_gopher_quality_funnel``) and
the streaming monitor (``streaming.monitors.funnel_monitor``): the funnel
is split by algebra like the other monitors — every rule outcome is a
per-ROW flag, so the stage counters (docs entering / dropped / surviving
each rule) are plain conditional sums, and per-micro-batch counter rows
merge by addition to exactly the one-pass result.

Determinism: every rule compares integers or exact integer-division
doubles (the alpha-share rule is a cross-multiplied integer compare), so
Spark and DuckDB agree bit-for-bit — the funnel is fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from statline_bq_spark.functions.text import ascii_fold
from statline_bq_spark.functions.text import tokens as _tokens

#: Rule names in cascade order (rule i only sees rule i-1's survivors).
RULES = (
    "too_short",
    "mean_word_len_lo",
    "mean_word_len_hi",
    "low_alpha_share",
    "few_stopwords",
)


def funnel_counters(df: DataFrame, text_col: str = "text") -> DataFrame:
    """ONE-ROW DataFrame of additive stage counters: s0 (docs in), then
    per rule i: d{i} (dropped by rule i) and s{i} (survivors after it).
    Counter rows from any slicing of the input sum to the whole-corpus
    counters — the associativity the streaming monitor rides on."""
    # The tokenization is projected ONCE in its own select (round 11):
    # inlining `toks` into every feature made the single Project evaluate
    # split(trim(text)) six times per row, and safe_size's NULL-guard CASE
    # around each filter(...) ran the interpreted token filters TWICE each
    # (isnotnull(filter(...)) + size(filter(...))). With `_toks` as a real
    # column (CollapseProject keeps it: non-cheap expr, multiple refs) and
    # the NULL test moved onto the cheap attribute — filter(x) is NULL iff
    # x is NULL, so the guard is equivalent — each regex/filter pass runs
    # exactly once per row: measured 0.64s → 0.34s on the sf0.1 feature
    # projection, identical counters.
    tk = F.col("_toks")
    feat = df.select(
        F.col(text_col).alias("_text"), _tokens(text_col).alias("_toks")
    ).select(
        # NULL-guarded sizes, not bare F.size: legacy (ANSI-off) sessions
        # return -1 for a NULL array, which would count NULL-text docs as
        # length--1 survivors instead of rule-0 drops (round-9 ANSI-off
        # sweep). safe_size semantics, on the attribute.
        F.when(tk.isNotNull(), F.size(tk)).alias("n_tok"),
        F.length(F.regexp_replace("_text", r"\s", "")).alias("n_chr"),
        F.when(
            tk.isNotNull(),
            F.size(F.filter(tk, lambda t: t.rlike("^[A-Za-z]+[.,!?;:]?$"))),
        ).alias("n_alpha"),
        F.when(
            tk.isNotNull(),
            F.size(
                # ascii_fold, not lower(): full Unicode lowering is
                # engine-divergent exactly at tokens that fold INTO the
                # ASCII stopword list ('İN' — round-10 locale fixture;
                # see text.py)
                F.filter(
                    tk,
                    lambda t: ascii_fold(t).isin(
                        "the", "a", "of", "and", "to", "in"
                    ),
                )
            ),
        ).alias("n_stop"),
    )
    mean_wl = F.col("n_chr") / F.col("n_tok")
    flags = [
        F.col("n_tok") < 15,
        mean_wl < 3.0,
        mean_wl > 10.0,
        F.col("n_alpha") * 10 < F.col("n_tok") * 8,
        F.col("n_stop") < 2,
    ]
    aggs = [F.count(F.lit(1)).alias("s0")]
    alive = F.lit(True)
    for i, f in enumerate(flags, start=1):
        aggs.append(F.sum((alive & f).cast("bigint")).alias(f"d{i}"))
        alive = alive & ~f
        aggs.append(F.sum(alive.cast("bigint")).alias(f"s{i}"))
    return feat.agg(*aggs)


def report_from_counters(counters: DataFrame) -> DataFrame:
    """Merge counter rows (sum — associative) and unpivot into the 5-row
    (stage, rule, n_in, n_dropped, n_out) funnel report."""
    cols = ["s0"] + [c for i in range(1, 6) for c in (f"d{i}", f"s{i}")]
    merged = counters.agg(
        *[F.coalesce(F.sum(c), F.lit(0)).cast("bigint").alias(c) for c in cols]
    )
    stack_args = ", ".join(
        f"{i}, '{RULES[i - 1]}', s{i - 1}, d{i}, s{i}" for i in range(1, 6)
    )
    return merged.selectExpr(
        f"stack(5, {stack_args}) AS (stage, rule, n_in, n_dropped, n_out)"
    )


def funnel_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass funnel report over a batch DataFrame."""
    return report_from_counters(funnel_counters(df, text_col))
