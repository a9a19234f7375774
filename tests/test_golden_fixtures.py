"""End-to-end against the reference's OWN golden fixtures
(`/root/reference/tests/data/83583NED/cbs.v3.*.parquet`) — the offline
rendition of the reference's tier-4 strategy
(`/root/reference/tests/test_statline_bq.py:151-219`): where the reference
downloads live and byte-compares to the committed golden parquet, we read
the committed golden parquet through the Spark operators and check every
result against DuckDB running on the same files.

This closes the loop SURVEY.md §5 calls out: the decode / hierarchy /
pivot / metadata-rounding operators run on REAL CBS-shaped data (wide
fact 7,440×5, code dims 6-124 rows, parent-pointer CategoryGroups), not
just the driver's synthetic tables.
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from pyspark.sql import functions as F

from statline_bq_spark.functions.cleaning import rename_dotted_columns
from statline_bq_spark.operators.hierarchy import hierarchy_closure
from statline_bq_spark.operators.pivot import wide_to_long
from statline_bq_spark.operators.star import decode_codes
from statline_bq_spark.pipeline import process_dataset

GOLD = "/root/reference/tests/data/83583NED"
DSID = "83583NED"


def gold_path(table: str) -> str:
    return os.path.join(GOLD, f"cbs.v3.{DSID}_{table}.parquet")


pytestmark = pytest.mark.skipif(
    not os.path.exists(gold_path("TypedDataSet")),
    reason="reference golden fixtures not present",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in [
        "TypedDataSet",
        "Bedrijfsgrootte",
        "BedrijfstakkenBranchesSBI2008",
        "Perioden",
        "CategoryGroups",
        "DataProperties",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{gold_path(t)}')"
        )
    yield con
    con.close()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pipeline_relands_golden_dataset_losslessly(spark, tmp_path):
    """The full S10-S15 pipeline over the real dataset: land every golden
    table under the dated snapshot layout and verify the landed parquet is
    row-identical to the source fixture (the reference asserts
    `truth_table.equals(g_table)` after its GCS round-trip)."""
    tables = {
        t: (lambda p=gold_path(t): spark.read.parquet(p))
        for t in [
            "TypedDataSet",
            "Bedrijfsgrootte",
            "BedrijfstakkenBranchesSBI2008",
            "Perioden",
            "CategoryGroups",
            "DataProperties",
        ]
    }
    with open(os.path.join(GOLD, f"cbs.v3.{DSID}_Metadata.json")) as f:
        metadata = json.load(f)
    res = process_dataset(
        spark,
        DSID,
        tables,
        metadata,
        storage_root=str(tmp_path),
        endpoint="local",
        load_date="20240101",
    )
    assert not res.skipped
    assert res.row_counts[f"cbs.v3.{DSID}_TypedDataSet"] == 7440
    con = duckdb.connect()
    for t in tables:
        landed = res.files[f"cbs.v3.{DSID}_{t}"]
        src_rows = con.execute(
            f"SELECT * FROM read_parquet('{gold_path(t)}') ORDER BY ALL"
        ).fetchall()
        out_rows = con.execute(
            f"SELECT * FROM read_parquet('{landed}/*.parquet') ORDER BY ALL"
        ).fetchall()
        assert out_rows == src_rows, f"{t}: landed rows differ from golden"
    # metadata side-file round-trips byte-for-byte at the JSON level
    meta_file = os.path.join(
        str(tmp_path), "cbs", "v3", DSID, f"cbs.v3.{DSID}_Metadata.json"
    )
    with open(meta_file) as f:
        assert json.load(f) == metadata


def test_dimension_decode_on_golden_fact(spark, duck):
    """Q3 on real data: decode all three dimension code columns of the wide
    fact against their code tables; DuckDB computes the same 3-way join."""
    fact = spark.read.parquet(gold_path("TypedDataSet"))
    out = fact
    for dim_table, col in [
        ("Bedrijfsgrootte", "Bedrijfsgrootte"),
        ("BedrijfstakkenBranchesSBI2008", "BedrijfstakkenBranchesSBI2008"),
        ("Perioden", "Perioden"),
    ]:
        dim = spark.read.parquet(gold_path(dim_table)).select("Key", "Title")
        out = decode_codes(out, dim, col, "Key", {"Title": f"{col}_label"})
    got = _rows(
        out.select(
            "ID",
            "Bedrijfsgrootte_label",
            "BedrijfstakkenBranchesSBI2008_label",
            "Perioden_label",
        )
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            """
            SELECT f.ID, g.Title, b.Title, p.Title
            FROM TypedDataSet f
            JOIN Bedrijfsgrootte g ON f.Bedrijfsgrootte = g.Key
            JOIN BedrijfstakkenBranchesSBI2008 b
              ON f.BedrijfstakkenBranchesSBI2008 = b.Key
            JOIN Perioden p ON f.Perioden = p.Key
            """
        ).fetchall()
    )
    assert len(got) == 7440
    assert got == want


def test_hierarchy_closure_on_golden_category_groups(spark, duck):
    """Q4 on the real parent-pointer hierarchy: iterative closure equals
    DuckDB's recursive CTE on CategoryGroups(ID, ParentID)."""
    cg = spark.read.parquet(gold_path("CategoryGroups"))
    edges = cg.filter(F.col("ParentID").isNotNull()).select(
        F.col("ID").cast("long").alias("child"),
        F.col("ParentID").cast("long").alias("parent"),
    )
    got = _rows(hierarchy_closure(edges))
    want = sorted(
        tuple(r)
        for r in duck.execute(
            """
            WITH RECURSIVE cl(child, ancestor, depth) AS (
              SELECT CAST(ID AS BIGINT), CAST(ParentID AS BIGINT), 1
              FROM CategoryGroups WHERE ParentID IS NOT NULL
              UNION ALL
              SELECT cl.child, CAST(cg.ParentID AS BIGINT), cl.depth + 1
              FROM cl JOIN CategoryGroups cg ON cl.ancestor = cg.ID
              WHERE cg.ParentID IS NOT NULL
            )
            SELECT child, ancestor, depth FROM cl
            """
        ).fetchall()
    )
    assert got == want
    assert len(got) >= edges.count()


def test_metadata_driven_rounding_on_golden_measure(spark, duck):
    """Q12 on real data: DataProperties' Decimals drives the measure
    rounding (the fixture's topic declares Decimals=0 for the jobs
    measure). Unpivot the fact's measures, join the (broadcast) metadata,
    round per Decimals — vs DuckDB doing the same from the same files."""
    props = rename_dotted_columns(
        spark.read.parquet(gold_path("DataProperties"))
    )
    meta = props.filter(F.col("odata_type") == "Cbs.OData.Topic").select(
        F.col("Key").alias("measure"), F.col("Decimals").cast("int").alias("decimals")
    )
    fact = spark.read.parquet(gold_path("TypedDataSet"))
    long = wide_to_long(
        fact, ["ID"], ["BanenVanWerknemersInDecember_1"]
    )
    joined = long.join(F.broadcast(meta), "measure")
    value_rounded = (
        F.when(F.col("decimals") == 0, F.round(F.col("value").cast("double"), 0))
        .when(F.col("decimals") == 1, F.round(F.col("value").cast("double"), 1))
        .otherwise(F.round(F.col("value").cast("double"), 2))
    )
    got = _rows(
        joined.select("ID", "measure", value_rounded.alias("value_rounded"),
                      "decimals")
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            """
            SELECT f.ID, p.Key,
                   CASE WHEN p.Decimals = 0
                          THEN round(CAST(f.BanenVanWerknemersInDecember_1 AS DOUBLE), 0)
                        WHEN p.Decimals = 1
                          THEN round(CAST(f.BanenVanWerknemersInDecember_1 AS DOUBLE), 1)
                        ELSE round(CAST(f.BanenVanWerknemersInDecember_1 AS DOUBLE), 2)
                   END,
                   CAST(p.Decimals AS INT)
            FROM TypedDataSet f
            JOIN DataProperties p ON p.odata_type = 'Cbs.OData.Topic'
              AND p.Key = 'BanenVanWerknemersInDecember_1'
            """
        ).fetchall()
    )
    assert len(got) == 7440
    assert got == want


def test_col_descriptions_side_file_roundtrip(spark, tmp_path):
    """S23 on the real ColDescriptions JSON: write + read back through the
    metadata side-file helpers preserves every column description."""
    from statline_bq_spark.sources import metadata as md

    with open(os.path.join(GOLD, f"cbs.v3.{DSID}_ColDescriptions.json")) as f:
        cds = json.load(f)
    md.write_metadata(
        cds, str(tmp_path), "cbs", "v3", DSID, suffix="ColDescriptions"
    )
    out = md.read_metadata(
        os.path.join(tmp_path, f"cbs.v3.{DSID}_ColDescriptions.json")
    )
    assert out == cds
