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


def _duck_output_types(duck, sql):
    """Real DuckDB output types for a query. The DB-API ``description``
    collapses every numeric to the useless ``'NUMBER'``; ``DESCRIBE`` is the
    only way to see HUGEINT vs BIGINT vs DOUBLE vs DECIMAL."""
    # Newline before the closing paren: if the oracle's last line ends in a
    # `-- comment`, a paren on the same line would land inside the comment
    # and DuckDB would see unterminated input (round-4 regression).
    rows = duck.execute(f"DESCRIBE ({sql.rstrip().rstrip(';')}\n)").fetchall()
    return {r[0]: r[1] for r in rows}


def _duck_type_class(type_name: str) -> str:
    """Canonical comparison class for a DuckDB output type."""
    t = str(type_name).upper()
    if t.startswith(("HUGEINT", "INT128", "UHUGEINT")):
        return "hugeint"  # never driver-safe; dedicated gate below
    if t.startswith(("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "INT", "UINTEGER", "UBIGINT", "USMALLINT", "UTINYINT", "NUMBER")):
        return "int"
    if t.startswith(("DOUBLE", "FLOAT", "REAL")):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith(("VARCHAR", "STRING", "TEXT")):
        return "str"
    if t.startswith("BOOL"):
        return "bool"
    if t.startswith("DATE"):
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return f"other:{t}"


def _spark_type_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    return f"other:{dt.simpleString()}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_schema_zips_with_oracle(spark, duck, name):
    """Driver-hash pre-flight (round-3 directive): the Spark output schema
    and the DuckDB oracle's result schema must agree column-by-column after
    type canonicalization (all int widths are driver-equivalent; decimal vs
    float is NOT — the engines fetch ``decimal.Decimal`` vs ``float``,
    which hash differently). Value-level parity can pass at sf0.01 while a
    type split still flips the driver's hash — this catches that without
    spending a window slot."""
    scols = {
        f.name: _spark_type_class(f.dataType)
        for f in QUERIES[name](spark, SF_ORACLE).schema.fields
    }
    dcols = {
        c: _duck_type_class(t)
        for c, t in _duck_output_types(duck, ORACLES[name]).items()
    }
    assert sorted(scols) == sorted(dcols), (
        f"{name}: column names {sorted(scols)} vs {sorted(dcols)}"
    )
    diffs = {
        c: (scols[c], dcols[c]) for c in scols if scols[c] != dcols[c]
    }
    assert not diffs, f"{name}: type-class mismatches {diffs}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_hashable(duck, name):
    """The driver hashes TYPED values: DuckDB ``sum(INTEGER)`` returns
    HUGEINT (int128), which Spark can never emit, so an uncast integer sum
    in an oracle's output guarantees a hash mismatch even when every value
    is identical (round-1 ``json_props_sum`` failure). Gate: no oracle
    output column may be HUGEINT — wrap in CAST(... AS BIGINT)."""
    bad = [
        c
        for c, t in _duck_output_types(duck, ORACLES[name]).items()
        if str(t).upper().startswith(("HUGEINT", "INT128", "UHUGEINT"))
    ]
    assert not bad, f"{name}: HUGEINT output columns {bad} — CAST AS BIGINT"
