"""Python UDTF/UDAF surface (SURVEY.md §2.C "UDF/UDAF/UDTF" — the
reference has no user-facing UDTF/UDAF; Spark 4 adds Arrow-optimized
Python table functions and grouped aggregates, and this module exercises
both contracts: a training-data chunker UDTF and a rank-statistic UDAF).

A UDTF is the right shape when one input row fans out to a variable number
of output rows with per-row Python logic. It is still the SLOW path — the
chunker here has a pure-JVM twin (``posexplode`` over ``slice`` of
``split``), and a 100 TB pipeline should prefer that; the UDTF exists to
(a) cover the API surface end-to-end and (b) host logic that genuinely
can't be expressed as JVM expressions (e.g. a real tokenizer).

Everything is built inside factory functions so cloudpickle ships the UDTF
class BY VALUE to executor Python workers — a module-level class would
pickle by reference and break under a driver session that doesn't ship
this package.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

#: step = chunk_size - overlap; starts are 0, step, 2*step, ... while
#: start < max(1, n_tokens - overlap). Mirrored exactly by the DuckDB
#: oracle in workload.py.
CHUNK_SIZE = 32
CHUNK_OVERLAP = 8

CHUNK_SCHEMA = "chunk_idx int, chunk string, n_tokens int"


def make_chunk_udtf(chunk_size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP):
    """Build the chunking UDTF class (closure-scoped → pickled by value)."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap

    @udtf(returnType=CHUNK_SCHEMA, useArrow=True)
    class ChunkText:
        def eval(self, text: str):
            # NULL text chunks to NOTHING (same as the JVM twin, where
            # posexplode over a NULL sequence emits no rows); empty /
            # whitespace-only text mirrors the repo-wide tokenization
            # convention split(trim(text), '\\s+') — a single '' token —
            # NOT str.split()'s [] (which would fabricate a 0-token chunk
            # and diverge from the twin and the oracle).
            if text is None:
                return
            import re

            # re.ASCII pins \s to [ \t\n\r\f\v]: Python's default \s is
            # Unicode-aware (splits on NBSP U+00A0 etc.) while the JVM
            # twin's Java regex and the oracle's RE2 are ASCII-only — a
            # NBSP-joined token must stay ONE token in all three. Same
            # contract for the edge trim: Spark/DuckDB trim() strip the
            # ASCII space only, so strip(" ") — not str.strip(), which
            # eats Unicode whitespace. Pinned by the dirty sweep's
            # invisible-whitespace document.
            words = re.split(r"\s+", text.strip(" "), flags=re.ASCII)
            n = len(words)
            limit = max(1, n - overlap)
            idx = 0
            for start in range(0, limit, step):
                piece = words[start : start + chunk_size]
                yield idx, " ".join(piece), len(piece)
                idx += 1

    return ChunkText


def make_median_udaf():
    """Grouped-aggregate Pandas UDF (the UDAF surface, §2.C): exact median
    of a numeric column per group, computed in numpy over the whole group's
    Arrow batch.

    A grouped-agg pandas_udf is the right UDAF shape when the aggregate
    genuinely needs the full group vector (rank statistics, trimmed means);
    for algebraic aggregates prefer built-ins — they keep map-side partial
    aggregation, which a grouped-agg UDF gives up (the whole group must
    co-locate). Median of integer-valued doubles is cross-engine exact:
    odd n picks an element, even n is (a+b)/2 — both reproducible.

    Closure-built so cloudpickle ships it by value (vanilla driver
    sessions don't have this package on executor PYTHONPATH).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        # observed values only: Arrow nulls arrive as NaN in the float64
        # view, and np.median would propagate them — SQL aggregates (the
        # oracle's median()) skip NULLs, so the UDAF must too. An all-null
        # group has no median.
        a = v.dropna().to_numpy(dtype="float64")
        a = a[~np.isnan(a)]
        if len(a) == 0:
            return None
        return float(np.median(a))

    return median_udaf


def make_count_udaf():
    """Companion grouped-agg count — Spark refuses to mix a grouped-agg
    pandas UDF with JVM aggregates in one ``agg`` (INVALID_PANDAS_UDF_
    PLACEMENT), so a UDAF-only aggregation needs its counts as UDAFs too."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        return int(len(v))

    return count_udaf


def register_chunk_udtf(
    spark: SparkSession,
    name: str = "chunk_text",
    *,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> None:
    """Register the chunker for SQL ``LATERAL chunk_text(text)`` use."""
    spark.udtf.register(name, make_chunk_udtf(chunk_size, overlap))
