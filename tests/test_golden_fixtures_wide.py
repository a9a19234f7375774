"""Golden-fixture end-to-end on the WIDEST reference dataset: 84799NED
(`/root/reference/tests/data/84799NED/cbs.v3.*.parquet`) — 17,341 rows x
118 columns (91 Long + 20 Double + 5 String topics per its DataProperties).

The 83583NED module proves the operators on a small wide fact; this one
proves the width-scaling paths: a metadata-DRIVEN unpivot of all 111
numeric topic columns (the measure list comes from DataProperties, never
from a discovery pass — SURVEY.md §7's pivot-cardinality risk), decimal
rounding across every Double topic, and a code decode against a dimension
as large as the fact (17,341 rows — region codes, not a tiny code list).

All checks compare against DuckDB reading the same parquet; sums stay in
DECIMAL end-to-end so no float-ordering tolerance is needed.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from pyspark.sql import functions as F

from statline_bq_spark.operators.pivot import wide_to_long
from statline_bq_spark.operators.star import decode_codes

GOLD = "/root/reference/tests/data/84799NED"
DSID = "84799NED"


def gold_path(table: str) -> str:
    return os.path.join(GOLD, f"cbs.v3.{DSID}_{table}.parquet")


pytestmark = pytest.mark.skipif(
    not os.path.exists(gold_path("TypedDataSet")),
    reason="reference golden fixtures not present",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["TypedDataSet", "DataProperties", "WijkenEnBuurten"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{gold_path(t)}')"
        )
    yield con
    con.close()


def _numeric_topics(spark) -> list[str]:
    """Measure list FROM the metadata table (Q11 schema-as-data), not from
    sniffing the fact's dtypes."""
    props = spark.read.parquet(gold_path("DataProperties"))
    rows = (
        props.filter(
            (F.col("odata_type") == "Cbs.OData.Topic")
            & F.col("Datatype").isin("Long", "Double")
        )
        .select("Key")
        .collect()
    )
    return [r.Key for r in rows]


def test_metadata_driven_unpivot_all_numeric_topics(spark, duck):
    """Unpivot 111 numeric topic columns in one pass and aggregate per
    measure; DECIMAL sums make the comparison exact."""
    measures = _numeric_topics(spark)
    assert len(measures) == 111
    fact = spark.read.parquet(gold_path("TypedDataSet"))
    long = wide_to_long(fact, ["ID"], measures)
    got = {
        r.measure: (r.n_vals, r.total)
        for r in long.groupBy("measure")
        .agg(
            F.count("value").alias("n_vals"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("total"),
        )
        .collect()
    }
    assert len(got) == 111
    want_rows = duck.execute(
        "SELECT Key FROM DataProperties WHERE odata_type = 'Cbs.OData.Topic'"
        " AND Datatype IN ('Long', 'Double')"
    ).fetchall()
    for (key,) in want_rows:
        n, tot = duck.execute(
            f'SELECT count("{key}"), sum(CAST("{key}" AS DECIMAL(25,6)))'
            " FROM TypedDataSet"
        ).fetchone()
        g_n, g_tot = got[key]
        assert g_n == n, key
        assert (g_tot is None) == (tot is None) and (
            tot is None or g_tot == tot
        ), key


def test_metadata_rounding_across_all_double_topics(spark, duck):
    """Q12 at width: every Double topic rounded per its DataProperties
    Decimals declaration, aggregated per measure in exact DECIMAL."""
    props = spark.read.parquet(gold_path("DataProperties"))
    meta = props.filter(
        (F.col("odata_type") == "Cbs.OData.Topic")
        & (F.col("Datatype") == "Double")
    ).select(
        F.col("Key").alias("measure"),
        F.col("Decimals").cast("int").alias("decimals"),
    )
    doubles = [r.measure for r in meta.select("measure").collect()]
    assert len(doubles) == 20
    fact = spark.read.parquet(gold_path("TypedDataSet"))
    long = wide_to_long(fact, ["ID"], doubles)
    joined = long.join(F.broadcast(meta), "measure")
    rounded = F.when(
        F.col("decimals") == 0, F.round(F.col("value").cast("double"), 0)
    ).otherwise(F.round(F.col("value").cast("double"), 1))
    got = {
        r.measure: (r.n_vals, r.total)
        for r in joined.select("measure", rounded.alias("_r"))
        .groupBy("measure")
        .agg(
            F.count("_r").alias("n_vals"),
            F.sum(F.col("_r").cast("decimal(25,6)")).alias("total"),
        )
        .collect()
    }
    for key in doubles:
        n, tot = duck.execute(
            f"""
            SELECT count(r), sum(CAST(r AS DECIMAL(25,6))) FROM (
              SELECT CASE WHEN p.Decimals = 0
                       THEN round(CAST(f."{key}" AS DOUBLE), 0)
                       ELSE round(CAST(f."{key}" AS DOUBLE), 1) END AS r
              FROM TypedDataSet f
              JOIN DataProperties p ON p.Key = '{key}'
            ) t
            """
        ).fetchone()
        g_n, g_tot = got[key]
        assert g_n == n, key
        assert (g_tot is None) == (tot is None) and (
            tot is None or g_tot == tot
        ), key


def test_decode_against_fact_sized_dimension(spark, duck):
    """Q3 where the 'code list' is as large as the fact (17,341 region
    codes): the decode joins WijkenEnBuurten and rolls up inhabitants per
    municipality — exact integer sums."""
    fact = spark.read.parquet(gold_path("TypedDataSet")).select(
        "WijkenEnBuurten", "AantalInwoners_5"
    )
    dim = spark.read.parquet(gold_path("WijkenEnBuurten"))
    decoded = decode_codes(
        fact,
        dim,
        "WijkenEnBuurten",
        "Key",
        {"Municipality": "municipality"},
    )
    got = sorted(
        (r.municipality, r.n_regions, r.inhabitants)
        for r in decoded.groupBy("municipality")
        .agg(
            F.count(F.lit(1)).alias("n_regions"),
            F.sum("AantalInwoners_5").cast("bigint").alias("inhabitants"),
        )
        .collect()
    )
    want = sorted(
        (m, n, tot)
        for m, n, tot in duck.execute(
            """
            SELECT d.Municipality, count(*),
                   CAST(sum(f.AantalInwoners_5) AS BIGINT)
            FROM TypedDataSet f JOIN WijkenEnBuurten d
              ON f.WijkenEnBuurten = d.Key
            GROUP BY d.Municipality
            """
        ).fetchall()
    )
    assert len(got) > 300  # hundreds of municipalities
    assert got == want
