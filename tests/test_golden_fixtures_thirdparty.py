"""Golden-fixture end-to-end on the reference's THIRD-PARTY dataset:
45012NED (`/root/reference/tests/data/45012NED/iv3.v3.*.parquet`) — the
LARGEST committed golden fact (435,456 rows, BASELINE.md) and the only
fixture exercising the non-CBS source path (`source="iv3"`, reference
`main.py:531-534`: third-party providers are always OData v3 and name
files `iv3.v3.{id}_{table}`).

Covers what the other golden modules don't: the third-party naming scheme
through the full landing pipeline, and a four-dimension star decode at
435k-row scale checked against DuckDB on the same files.
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from pyspark.sql import functions as F

from statline_bq_spark.operators.star import star_join
from statline_bq_spark.pipeline import process_dataset

GOLD = "/root/reference/tests/data/45012NED"
DSID = "45012NED"
DIMS = ["Categorie", "Provincies", "Verslagsoort", "FunctieKostenplaatsBalanspost"]


def gold_path(table: str) -> str:
    return os.path.join(GOLD, f"iv3.v3.{DSID}_{table}.parquet")


pytestmark = pytest.mark.skipif(
    not os.path.exists(gold_path("TypedDataSet")),
    reason="reference golden fixtures not present",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["TypedDataSet", *DIMS]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{gold_path(t)}')"
        )
    yield con
    con.close()


def test_thirdparty_pipeline_lands_with_iv3_naming(spark, tmp_path):
    """S10/S15/S25 with source='iv3': the landed layout and side files must
    carry the third-party prefix, and the largest golden fact must land
    losslessly."""
    tables = {
        t: (lambda p=gold_path(t): spark.read.parquet(p))
        for t in ["TypedDataSet", *DIMS]
    }
    with open(os.path.join(GOLD, f"iv3.v3.{DSID}_Metadata.json")) as f:
        metadata = json.load(f)
    res = process_dataset(
        spark,
        DSID,
        tables,
        metadata,
        storage_root=str(tmp_path),
        source="iv3",
        endpoint="local",
        load_date="20240101",
    )
    assert not res.skipped
    assert res.row_counts[f"iv3.v3.{DSID}_TypedDataSet"] == 435456
    assert set(res.files) == {f"iv3.v3.{DSID}_{t}" for t in tables}
    landed = res.files[f"iv3.v3.{DSID}_TypedDataSet"]
    assert f"{os.sep}iv3{os.sep}v3{os.sep}{DSID}{os.sep}20240101" in landed
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{landed}/*.parquet')"
    ).fetchone()[0]
    assert n == 435456
    meta_file = os.path.join(
        str(tmp_path), "iv3", "v3", DSID, f"iv3.v3.{DSID}_Metadata.json"
    )
    with open(meta_file) as f:
        assert json.load(f) == metadata


def test_four_dimension_star_decode_at_435k(spark, duck):
    """Q1/Q2 on the largest golden fact: join all four dimension code
    tables (broadcast — 6 to 108 rows each) and aggregate the first
    measure per (province, report-kind) title pair, DECIMAL-exact."""
    fact = spark.read.parquet(gold_path("TypedDataSet"))
    dims = {t: spark.read.parquet(gold_path(t)) for t in DIMS}
    joined = star_join(
        fact,
        [
            (dims["Provincies"], fact["Provincies"] == dims["Provincies"]["Key"]),
            (
                dims["Verslagsoort"],
                fact["Verslagsoort"] == dims["Verslagsoort"]["Key"],
            ),
        ],
    )
    got = sorted(
        (r.province, r.report_kind, r.n_rows, r.total)
        for r in joined.groupBy(
            dims["Provincies"]["Title"].alias("province"),
            dims["Verslagsoort"]["Title"].alias("report_kind"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.col("k_1stePlaatsing_1").cast("decimal(25,6)")
            ).alias("total"),
        )
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            """
            SELECT p.Title, v.Title, count(*),
                   sum(CAST(f.k_1stePlaatsing_1 AS DECIMAL(25,6)))
            FROM TypedDataSet f
            JOIN Provincies p ON f.Provincies = p.Key
            JOIN Verslagsoort v ON f.Verslagsoort = v.Key
            GROUP BY p.Title, v.Title
            """
        ).fetchall()
    )
    assert len(got) == 12 * 6
    assert got == want
