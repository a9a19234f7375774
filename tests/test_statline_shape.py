"""Integration test on a CBS/StatLine-SHAPED dataset (the reference's own
domain): a v3 wide `TypedDataSet` with dimension code tables, a
`CategoryGroups` hierarchy, and a `DataProperties` schema table — exercising
the published query surface (SURVEY.md §2.B) end to end on the shape it was
specified for, with golden-style inline expectations (the reference's test
strategy, SURVEY.md §5 tier 4).

Fixture mirrors `tests/data/83583NED` of the reference: fact columns
(dimension keys + one topic per measure), code tables (Key, Title), a
ParentID'd group hierarchy, and DataProperties carrying (Key, Datatype,
Decimals, Unit).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from statline_bq_spark.operators.hierarchy import hierarchy_closure
from statline_bq_spark.operators.pivot import long_to_wide, wide_to_long
from statline_bq_spark.operators.star import decode_codes


@pytest.fixture(scope="module")
def cbs(spark):
    """A miniature v3 dataset: 2 dims × 2 periods, 2 topic columns."""
    fact = spark.createDataFrame(
        [
            ("T001", "2020JJ00", 10.0, 1234.567),
            ("T001", "2021JJ00", 11.0, 1250.0),
            ("A045", "2020JJ00", 3.5, 400.25),
            ("A045", "2021JJ00", None, 410.75),
        ],
        "BedrijfstakkenBranchesSBI2008 string, Perioden string, "
        "BanenVanWerknemers_1 double, Loonsom_2 double",
    )
    sbi = spark.createDataFrame(
        [("T001", "A-U Alle economische activiteiten", 1),
         ("A045", "F Bouwnijverheid", 2)],
        "Key string, Title string, CategoryGroupID int",
    )
    perioden = spark.createDataFrame(
        [("2020JJ00", "2020", "Definitief"), ("2021JJ00", "2021", "Voorlopig")],
        "Key string, Title string, Status string",
    )
    groups = spark.createDataFrame(
        [(1, "SBI2008", "Totaal", None), (2, "SBI2008", "Nijverheid", 1)],
        "ID int, DimensionKey string, Title string, ParentID int",
    )
    props = spark.createDataFrame(
        [("BanenVanWerknemers_1", "Double", 1, "x 1000"),
         ("Loonsom_2", "Double", 2, "mln euro")],
        "Key string, Datatype string, Decimals int, Unit string",
    )
    return {"fact": fact, "sbi": sbi, "perioden": perioden,
            "groups": groups, "props": props}


def test_code_decode_q3(spark, cbs):
    """Q1/Q3: decode dimension keys to titles via broadcast code joins."""
    out = decode_codes(
        cbs["fact"],
        cbs["sbi"],
        "BedrijfstakkenBranchesSBI2008",
        "Key",
        {"Title": "BedrijfstakkenBranchesSBI2008_Title"},
    )
    out = decode_codes(
        out,
        cbs["perioden"],
        "Perioden",
        "Key",
        {"Title": "Perioden_Title"},
    )
    rows = {
        (r["BedrijfstakkenBranchesSBI2008_Title"], r["Perioden_Title"])
        for r in out.collect()
    }
    assert ("F Bouwnijverheid", "2021") in rows
    assert len(rows) == 4


def test_default_selection_filter_q5(spark, cbs):
    """Q5: the DefaultSelection-style slice (dim eq AND period eq)."""
    out = cbs["fact"].filter(
        (F.col("BedrijfstakkenBranchesSBI2008") == "T001")
        & (F.col("Perioden") == "2021JJ00")
    )
    assert [r.BanenVanWerknemers_1 for r in out.collect()] == [11.0]


def test_wide_long_pivot_roundtrip_q7_q8(spark, cbs):
    """Q8 then Q7: wide→long (Observations shape) →wide reproduces the
    original fact exactly, nulls included."""
    measures = ("BanenVanWerknemers_1", "Loonsom_2")
    dims = ["BedrijfstakkenBranchesSBI2008", "Perioden"]
    long = wide_to_long(cbs["fact"], dims, measures)
    # v4 Observations shape: one row per (dims × measure)
    assert long.columns == [*dims, "measure", "value"]
    wide = long_to_wide(
        long, dims, "measure", F.first("value"), measures
    )
    orig = {tuple(r) for r in cbs["fact"].collect()}
    back = {
        tuple(r)
        for r in wide.select(*dims, *measures).collect()
    }
    assert back == orig


def test_category_group_rollup_q4(spark, cbs):
    """Q4: member → group → parent-group closure over ParentID."""
    sbi, groups = cbs["sbi"], cbs["groups"]
    edges = (
        sbi.join(groups, sbi["CategoryGroupID"] == groups["ID"])
        .select(sbi["Key"].alias("child"), groups["Title"].alias("parent"))
        .unionByName(
            groups.alias("c")
            .join(groups.alias("p"), F.col("c.ParentID") == F.col("p.ID"))
            .select(
                F.col("c.Title").alias("child"), F.col("p.Title").alias("parent")
            )
        )
    )
    closure = {
        (r.child, r.ancestor, r.depth) for r in hierarchy_closure(edges).collect()
    }
    assert ("A045", "Nijverheid", 1) in closure
    assert ("A045", "Totaal", 2) in closure       # transitive
    assert ("Nijverheid", "Totaal", 1) in closure


def test_decimals_formatting_q12(spark, cbs):
    """Q12: DataProperties.Decimals drives per-measure rounding."""
    long = wide_to_long(
        cbs["fact"],
        ["BedrijfstakkenBranchesSBI2008", "Perioden"],
        ("BanenVanWerknemers_1", "Loonsom_2"),
    )
    joined = long.join(
        F.broadcast(cbs["props"]), long["measure"] == cbs["props"]["Key"]
    )
    out = joined.select(
        "measure",
        "BedrijfstakkenBranchesSBI2008",
        "Perioden",
        F.when(F.col("Decimals") == 1, F.round("value", 1))
        .otherwise(F.round("value", 2))
        .alias("v"),
        "Unit",
    )
    got = {
        (r.measure, r.BedrijfstakkenBranchesSBI2008, r.Perioden): (r.v, r.Unit)
        for r in out.collect()
    }
    assert got[("Loonsom_2", "T001", "2020JJ00")] == (1234.57, "mln euro")
    assert got[("BanenVanWerknemers_1", "T001", "2020JJ00")] == (10.0, "x 1000")
