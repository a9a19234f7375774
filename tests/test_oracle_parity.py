"""The local mirror of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet, compare row count, column names, and order-insensitive values.

This is deliberately strict (exact value equality after canonicalization) —
if this passes, the driver's value-hash comparison passes.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pytest

from statline_bq_spark.io import TABLES, table_path
from statline_bq_spark.workload import ORACLES, QUERIES

from tests.conftest import SF_ORACLE


def _canon(v):
    """Canonicalize a cell value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _row_key(row):
    """Null-safe total order: NULLs last, values compared as strings (values
    were already canonicalized, so str() is deterministic across engines)."""
    return tuple((v is None, str(v)) for v in row)


def _normalize(columns, rows):
    """Sort columns by name (driver semantics), then rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    data = sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows), key=_row_key
    )
    return cols, data


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_ORACLE, t)}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_ORACLE)
    srows = sdf.collect()
    scols = sdf.columns

    cur = duck.execute(ORACLES[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    s_cols, s_data = _normalize(scols, [tuple(r) for r in srows])
    d_cols, d_data = _normalize(dcols, drows)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_data) == len(d_data), (
        f"{name}: row count {len(s_data)} vs {len(d_data)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_data, d_data) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Hash-based ops without SQL oracles must still execute and have a
    stable schema."""
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.columns
    df.collect()  # must not raise


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_spark_output_types_hashable(spark, name):
    """The driver's value-hasher handles only atomic top-level columns: a
    raw ``array``/``map``/``struct`` output raises ``TypeError: unhashable
    type: 'list'`` driver-side even when the oracle agrees perfectly (the
    round-3 ``matryoshka_embeddings`` failure). Gate: every oracle-backed
    query must reduce complex values to scalars or strings (``concat_ws``
    over scaled-integer components is the deterministic pattern)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    schema = QUERIES[name](spark, SF_ORACLE).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: non-atomic output columns {bad} — stringify for the driver"
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_hashable(duck, name):
    """The driver hashes TYPED values: DuckDB ``sum(INTEGER)`` returns
    HUGEINT (int128), which Spark can never emit, so an uncast integer sum
    in an oracle's output guarantees a hash mismatch even when every value
    is identical (round-1 ``json_props_sum`` failure). Gate: no oracle
    output column may be HUGEINT — wrap in CAST(... AS BIGINT)."""
    cur = duck.execute(ORACLES[name])
    bad = [
        d[0]
        for d in cur.description
        if str(d[1]).upper().startswith(("HUGEINT", "INT128", "UHUGEINT"))
    ]
    assert not bad, f"{name}: HUGEINT output columns {bad} — CAST AS BIGINT"
