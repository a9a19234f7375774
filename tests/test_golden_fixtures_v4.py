"""OData v4 (long/EAV format) surface against the reference's 83765NED
golden fixtures (`/root/reference/tests/data/83765NED/cbs.v4.*.parquet`).

The v4 main fact (`Observations`, 1.5M rows) is excluded from the
reference repo as a large blob (`.MISSING_LARGE_BLOBS`), so these tests
synthesize a DETERMINISTIC Observations table from the real MeasureCodes ×
WijkenEnBuurtenCodes fixtures (the reference documents the v4 row shape in
`main.py:506-526`: one row per dimension-combination × measure with a
DOUBLE Value), write it to parquet, and run the published v4 query surface
with BOTH engines reading identical files:

- EAV long → wide pivot (Q7 in v4 terms: Observations → one column per
  Measure),
- measure decode + Decimals-driven rounding (MeasureCodes is the v4
  DataProperties, SURVEY.md §1.1),
- string-keyed hierarchy closure over MeasureGroups / {Dimension}Groups
  (ParentId VARCHAR — v4 ids are strings, unlike v3's int CategoryGroups).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from pyspark.sql import functions as F

from statline_bq_spark.operators.hierarchy import hierarchy_closure
from statline_bq_spark.operators.pivot import long_to_wide

GOLD = "/root/reference/tests/data/83765NED"
DSID = "83765NED"


def gold_path(table: str) -> str:
    return os.path.join(GOLD, f"cbs.v4.{DSID}_{table}.parquet")


pytestmark = pytest.mark.skipif(
    not os.path.exists(gold_path("MeasureCodes")),
    reason="reference v4 golden fixtures not present",
)

#: Measures pivoted in the wide test (first few of the 103 real ones).
PIVOT_MEASURES = ["T001036", "3000", "4000", "10680"]


@pytest.fixture(scope="module")
def obs_path(spark, tmp_path_factory):
    """Deterministic synthetic Observations: 40 real region codes × all 103
    real measures, Value = f(region Index, measure Index) — shaped exactly
    like the reference's documented v4 EAV rows."""
    out = str(tmp_path_factory.mktemp("v4") / "observations.parquet")
    codes = (
        spark.read.parquet(gold_path("WijkenEnBuurtenCodes"))
        .orderBy("Index")
        .limit(40)
        .select(
            F.col("Identifier").alias("WijkenEnBuurten"),
            F.col("Index").alias("_ri"),
        )
    )
    measures = spark.read.parquet(gold_path("MeasureCodes")).select(
        F.col("Identifier").alias("Measure"), F.col("Index").alias("_mi")
    )
    obs = (
        codes.crossJoin(measures)
        .select(
            (F.col("_ri") * 1000 + F.col("_mi")).cast("long").alias("Id"),
            "Measure",
            "WijkenEnBuurten",
            F.lit(None).cast("string").alias("ValueAttribute"),
            (
                F.round(
                    (F.col("_ri") * 7 + F.col("_mi") * 13) % 1000
                    + F.col("_mi") / 8.0,
                    3,
                )
            ).alias("Value"),
        )
    )
    obs.coalesce(1).write.mode("overwrite").parquet(out)
    return out


@pytest.fixture(scope="module")
def duck(obs_path):
    con = duckdb.connect()
    for t in [
        "MeasureCodes",
        "MeasureGroups",
        "Dimensions",
        "WijkenEnBuurtenCodes",
        "WijkenEnBuurtenGroups",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{gold_path(t)}')"
        )
    con.execute(
        f"CREATE VIEW Observations AS SELECT * FROM read_parquet('{obs_path}/*.parquet')"
    )
    yield con
    con.close()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_v4_eav_pivot_to_wide(spark, duck, obs_path):
    """The v4 published-surface pivot: long Observations → one column per
    measure (reference main.py:511 documents the EAV layout downstream
    users un-pivot). Explicit value list ⇒ no discovery pass."""
    obs = spark.read.parquet(obs_path)
    wide = long_to_wide(
        obs.filter(F.col("Measure").isin(PIVOT_MEASURES)),
        ["WijkenEnBuurten"],
        "Measure",
        F.min("Value"),
        PIVOT_MEASURES,
    )
    got = _rows(wide)
    dq = '"'
    pivots = ", ".join(
        f"min(Value) FILTER (Measure = '{m}') AS {dq}{m}{dq}"
        for m in PIVOT_MEASURES
    )
    in_list = ", ".join(f"'{m}'" for m in PIVOT_MEASURES)
    want = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
            SELECT WijkenEnBuurten, {pivots}
            FROM Observations
            WHERE Measure IN ({in_list})
            GROUP BY WijkenEnBuurten
            """
        ).fetchall()
    )
    assert len(got) == 40
    assert got == want


def test_v4_measure_decode_and_decimals_rounding(spark, duck, obs_path):
    """MeasureCodes is the v4 DataProperties: decode Measure → Title/Unit
    and round Value per the measure's Decimals column (Q3 + Q12 in v4)."""
    obs = spark.read.parquet(obs_path)
    mc = spark.read.parquet(gold_path("MeasureCodes")).select(
        F.col("Identifier").alias("Measure"),
        "Title",
        "Unit",
        F.col("Decimals").cast("int").alias("decimals"),
    )
    joined = obs.join(F.broadcast(mc), "Measure")
    rounded = (
        F.when(F.col("decimals") == 0, F.round("Value", 0))
        .when(F.col("decimals") == 1, F.round("Value", 1))
        .otherwise(F.round("Value", 2))
    )
    got = _rows(
        joined.select(
            "Id", "Measure", "Title", "Unit", "decimals",
            rounded.alias("value_rounded"),
        )
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            """
            SELECT o.Id, o.Measure, m.Title, m.Unit,
                   CAST(m.Decimals AS INT),
                   CASE WHEN m.Decimals = 0 THEN round(o.Value, 0)
                        WHEN m.Decimals = 1 THEN round(o.Value, 1)
                        ELSE round(o.Value, 2) END
            FROM Observations o JOIN MeasureCodes m
              ON o.Measure = m.Identifier
            """
        ).fetchall()
    )
    assert len(got) == 40 * 103
    assert got == want


@pytest.mark.parametrize(
    "table", ["MeasureGroups", "WijkenEnBuurtenGroups"]
)
def test_v4_group_hierarchy_closure(spark, duck, table):
    """v4 group hierarchies use VARCHAR ids (unlike v3's int
    CategoryGroups): the iterative closure must handle string keys and
    match DuckDB's recursive CTE on the real fixture."""
    g = spark.read.parquet(gold_path(table))
    edges = g.filter(F.col("ParentId").isNotNull()).select(
        F.col("Id").alias("child"), F.col("ParentId").alias("parent")
    )
    got = _rows(hierarchy_closure(edges))
    want = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
            WITH RECURSIVE cl(child, ancestor, depth) AS (
              SELECT Id, ParentId, 1 FROM {table} WHERE ParentId IS NOT NULL
              UNION ALL
              SELECT cl.child, g.ParentId, cl.depth + 1
              FROM cl JOIN {table} g ON cl.ancestor = g.Id
              WHERE g.ParentId IS NOT NULL
            )
            SELECT child, ancestor, depth FROM cl
            """
        ).fetchall()
    )
    assert got == want
    assert len(got) >= edges.count()


def test_v4_region_code_decode_scale(spark, duck, obs_path):
    """Dimension decode against the LARGE v4 code list (16,667 region
    codes — the realistic dim size): broadcast decode of the synthetic
    observations against the full fixture."""
    obs = spark.read.parquet(obs_path)
    codes = spark.read.parquet(gold_path("WijkenEnBuurtenCodes")).select(
        F.col("Identifier").alias("WijkenEnBuurten"),
        F.col("Title").alias("region_title"),
        "DimensionGroupId",
    )
    got = _rows(
        obs.join(F.broadcast(codes), "WijkenEnBuurten")
        .groupBy("region_title", "DimensionGroupId")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.sum("Value"), 3).alias("total_value"),
        )
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            """
            SELECT c.Title, c.DimensionGroupId, count(*),
                   round(sum(o.Value), 3)
            FROM Observations o
            JOIN WijkenEnBuurtenCodes c ON o.WijkenEnBuurten = c.Identifier
            GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert len(got) == 40
    assert got == want
