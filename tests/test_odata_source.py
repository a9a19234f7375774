"""Tests for the custom Python Data Source (cbs_odata): partition planning,
schema enforcement, and `$filter` pushdown — offline (ndjson page files),
plus unit-level checks of the URL planning for live mode."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan
from pyspark.sql.types import StructType

from statline_bq_spark.sources.odata_source import ODataDataSource, ODataReader

SCHEMA_DDL = "Id INT, Region STRING, Value DOUBLE"


@pytest.fixture()
def pages(tmp_path):
    """Three ndjson pages, 4+4+2 rows (the reference's page spill shape)."""
    rows = [
        {"Id": i, "Region": "NL" if i % 2 == 0 else "BE", "Value": i * 1.5}
        for i in range(10)
    ]
    for p in range(3):
        chunk = rows[p * 4 : p * 4 + 4]
        with open(tmp_path / f"page-{p}.ndjson", "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r) + "\n")
    return str(tmp_path)


def test_offline_scan_partitions_and_rows(spark, pages):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ODataDataSource)
    df = (
        spark.read.format("cbs_odata")
        .schema(SCHEMA_DDL)
        .option("path", pages)
        .load()
    )
    assert df.count() == 10
    # one input partition per page file
    assert df.rdd.getNumPartitions() == 3
    assert df.schema.simpleString() == "struct<Id:int,Region:string,Value:double>"
    total = df.agg(F.sum("Value")).collect()[0][0]
    assert total == sum(i * 1.5 for i in range(10))


def test_offline_filter_pushdown_semantics(spark, pages):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ODataDataSource)
    df = (
        spark.read.format("cbs_odata")
        .schema(SCHEMA_DDL)
        .option("path", pages)
        .load()
        .filter(F.col("Region") == "NL")
    )
    assert df.count() == 5
    assert {r.Id % 2 for r in df.collect()} == {0}


def test_push_filters_unit():
    schema = StructType.fromDDL(SCHEMA_DDL)
    reader = ODataReader(schema, {"path": "https://example.test/T1/TypedDataSet",
                                  "n_records": 25000, "odata_version": "v3"})
    eq = EqualTo(("Region",), "NL")
    gt = GreaterThan(("Value",), 3.0)
    remaining = list(reader.pushFilters([eq, gt]))
    # equality consumed, range predicate handed back to Spark
    assert remaining == [gt]
    assert reader.pushed == [eq]
    parts = reader.partitions()
    # 25k rows / 10k v3 page size -> 3 pages, each carrying the $filter
    assert len(parts) == 3
    assert all("$filter=(Region eq 'NL')" in p.url for p in parts)
    assert parts[1].url.endswith("$skip=10000")


def test_quote_escaping_in_filter():
    schema = StructType.fromDDL(SCHEMA_DDL)
    reader = ODataReader(schema, {"path": "https://example.test/T1",
                                  "n_records": 1, "odata_version": "v3"})
    list(reader.pushFilters([EqualTo(("Region",), "'s-Hertogenbosch")]))
    [part] = reader.partitions()
    assert "(Region eq '''s-Hertogenbosch')" in part.url


def test_streaming_incremental_pages(spark, pages, tmp_path_factory):
    """New page files are picked up incrementally: run a stream over the
    spool dir, add a page, run again — only the new rows arrive."""
    import json as _json

    spark.dataSource.register(ODataDataSource)
    ckpt = str(tmp_path_factory.mktemp("odata_ckpt"))
    out = str(tmp_path_factory.mktemp("odata_out"))

    def run_batch():
        stream = (
            spark.readStream.format("cbs_odata")
            .schema(SCHEMA_DDL)
            .option("path", pages)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        return [r.Id for r in rows]

    first = run_batch()
    assert sorted(first) == list(range(10))

    with open(f"{pages}/page-3.ndjson", "w") as fh:
        for i in range(10, 13):
            fh.write(_json.dumps({"Id": i, "Region": "NL", "Value": 0.0}) + "\n")
    # same checkpoint -> the second run appends ONLY the new page's rows:
    # exactly 13 rows total, no re-ingested duplicates
    second = run_batch()
    assert sorted(second) == list(range(13))


def test_e2e_odata_stream_pipeline_to_parquet(spark, pages, tmp_path_factory):
    """Per-round freshness check of the FULL streaming ELT loop (the
    reference's pipeline shape end-to-end): cbs_odata DSv2 stream source →
    per-batch cleanse transform (identifier normalization + load-date
    stamp, S11/S12/S15) → date-partitioned parquet sink, availableNow.
    The two halves are unit-tested separately; this pins their
    composition — a schema or offset-contract drift between the stream
    reader and the foreachBatch writer would pass both unit suites and
    still break the loop."""
    from statline_bq_spark.functions.cleaning import clean_python_name
    from statline_bq_spark.streaming.ingest import snapshot_with_load_date

    spark.dataSource.register(ODataDataSource)
    ckpt = str(tmp_path_factory.mktemp("odata_e2e_ckpt"))
    out = str(tmp_path_factory.mktemp("odata_e2e_out"))

    def write_batch(batch, batch_id):
        cleaned = snapshot_with_load_date(
            batch.withColumn(
                "Region", F.lower(clean_python_name("Region"))
            ),
            "20240101",
        )
        cleaned.write.mode("append").partitionBy("load_date").parquet(out)

    stream = (
        spark.readStream.format("cbs_odata")
        .schema(SCHEMA_DDL)
        .option("path", pages)
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    rows = got.collect()
    assert sorted(r.Id for r in rows) == list(range(10))
    # partition-column type inference reads the dir value back as int
    assert {str(r.load_date) for r in rows} == {"20240101"}
    # cleanse applied in-stream: python-safe identifiers, lowercased
    assert {r.Region for r in rows} == {"nl", "be"}
    # the dated partition actually materialized on disk (S15 layout)
    import os as _os

    assert any("load_date=20240101" in d for d in _os.listdir(out))
