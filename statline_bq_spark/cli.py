"""S26: the batch CLI — the reference's ``statline-bq`` console script
(``/root/reference/statline_bq/cli.py:36-87``, registered in
``pyproject.toml:40-41``) rebuilt over the Spark pipeline.

Option surface mirrors the reference one-to-one: ``--dataset-id``,
``--source``, ``--third-party/--no-third-party``, ``--gcp-env`` (spelled
``--env`` here, with the reference spelling kept as an alias), and
``--force/--no-force``; dataset ids fall back to the config's
``datasets = [...]`` list when ``--dataset-id`` is absent
(``cli.py:49-66``), and the resolved target is echoed before the loop
(``cli.py:70-78``).

Two deviations, both sandbox/Spark-shaped:

- ``--config`` / ``--endpoint`` are explicit instead of a hardwired
  ``config.toml`` + GCS/BQ pair — the storage root abstracts gs:// via the
  Hadoop connector (SURVEY.md §2.A S16).
- ``--tables-from DIR`` lands a dataset from local parquet files instead of
  the CBS OData feed, so the CLI works offline (the live path reuses
  ``sources.odata`` and needs network).
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable, Mapping

import click
from pyspark.sql import DataFrame, SparkSession

from statline_bq_spark import config as cfg
from statline_bq_spark import pipeline
from statline_bq_spark.session import get_spark


def parquet_dir_loader(
    spark: SparkSession, tables_dir: str, dataset_id: str
) -> tuple[Mapping[str, Callable[[], DataFrame]], dict]:
    """Offline dataset loader: every ``*.parquet`` in ``tables_dir`` becomes
    a table (name = file stem, with any ``{source}.{vN}.{id}_`` prefix
    stripped, matching the reference's table file naming). Metadata comes
    from a ``*_Metadata.json`` side file when present."""
    import json

    tables: dict[str, Callable[[], DataFrame]] = {}
    for path in sorted(glob.glob(os.path.join(tables_dir, "*.parquet"))):
        stem = os.path.splitext(os.path.basename(path))[0]
        name = stem.rsplit("_", 1)[-1] if f"{dataset_id}_" in stem else stem
        tables[name] = lambda p=path: spark.read.parquet(p)
    metadata: dict = {"Identifier": dataset_id}
    for mpath in glob.glob(os.path.join(tables_dir, "*_Metadata.json")):
        with open(mpath, encoding="utf-8") as f:
            metadata = json.load(f)
        break
    return tables, metadata


def odata_loader(
    spark: SparkSession, dataset_id: str, source: str, third_party: bool
) -> tuple[Mapping[str, Callable[[], DataFrame]], dict]:
    """Live CBS OData loader (needs network): version sniff → table URL
    discovery → paged parallel fetch, via ``sources.odata``."""
    from statline_bq_spark.sources import odata

    version = odata.sniff_version(dataset_id, third_party=third_party)
    urls = odata.discover_table_urls(dataset_id, version, third_party=third_party)
    tables = {
        name: (lambda u=u, v=version: odata.fetch_pages_to_df(spark, u, v))
        for name, u in urls.items()
    }
    return tables, {"Identifier": dataset_id}


@click.command()
@click.option(
    "--dataset-id",
    help="A valid CBS dataset id to process. If not provided, ids are taken "
    "from the config's `datasets` list.",
)
@click.option("--source", default="cbs", help="Dataset source. Defaults to `cbs`.")
@click.option(
    "--third-party/--no-third-party",
    default=False,
    help="Dataset is not originally from CBS (uses the dataderden base url).",
)
@click.option(
    "--env",
    "--gcp-env",
    "env",
    type=click.Choice(cfg.VALID_ENVS, case_sensitive=False),
    default="dev",
    help="Which environment target from the config to use.",
)
@click.option(
    "--force/--no-force",
    default=False,
    help="Process even when the dataset's 'Modified' metadata is unchanged.",
)
@click.option(
    "--config",
    "config_path",
    default="config.toml",
    show_default=True,
    help="TOML config with env targets and the datasets list.",
)
@click.option(
    "--endpoint",
    type=click.Choice(["local", "catalog"]),
    default="local",
    help="Land files only (`local`) or also register catalog tables.",
)
@click.option(
    "--tables-from",
    "tables_from",
    default=None,
    help="Offline mode: land the dataset from *.parquet files in this "
    "directory instead of fetching from the CBS OData feed.",
)
def upload_datasets(
    dataset_id: str | None,
    source: str,
    third_party: bool,
    env: str,
    force: bool,
    config_path: str,
    endpoint: str,
    tables_from: str | None,
) -> None:
    """Process CBS datasets into the configured storage root (and catalog).

    Single dataset: pass ``--dataset-id``. Batch: list ids under
    ``datasets = [...]`` in the config file.
    """
    config = cfg.load_config(config_path)
    env = env.lower()
    target = cfg.resolve_target(config, env, source)

    if dataset_id:
        datasets = [dataset_id]
    else:
        datasets = list(config.datasets)
        if not datasets:
            click.echo(
                "No dataset ids were provided. Pass --dataset-id or add a "
                "`datasets = [...]` list to the config."
            )
            return

    click.echo("The following datasets will be processed into:")
    click.echo("")
    click.echo(f"Storage root: {target.storage_root}")
    click.echo(f"Catalog:      {target.catalog_prefix or '(none)'}")
    click.echo("")
    for i, ds in enumerate(datasets):
        click.echo(f"{i + 1}. {ds}")
    click.echo("")

    spark = get_spark()
    loaded: dict[str, tuple[Mapping[str, Callable[[], DataFrame]], dict]] = {}
    for ds in datasets:
        if tables_from:
            loaded[ds] = parquet_dir_loader(spark, tables_from, ds)
        else:
            loaded[ds] = odata_loader(spark, ds, source, third_party)

    results = pipeline.run_datasets(
        spark,
        loaded,
        storage_root=target.storage_root,
        source=source,
        endpoint=endpoint,
        force=force,
    )
    for r in results:
        status = "skipped (unchanged)" if r.skipped else f"landed {len(r.files)} files"
        click.echo(f"{r.dataset_id}: {status}")
    click.echo("Finished processing datasets.")


if __name__ == "__main__":
    upload_datasets()


@click.command()
@click.argument("name")
@click.option(
    "--sf-dir",
    default="/root/testdata/sf0.01",
    show_default=True,
    help="Directory with the parquet tables to query.",
)
@click.option(
    "--limit", default=20, show_default=True, help="Rows to print."
)
@click.option(
    "--count-only",
    is_flag=True,
    help="Print only the result row count (no table).",
)
def run_query(name: str, sf_dir: str, limit: int, count_only: bool) -> None:
    """Run one named query from the engine's workload surface.

    NAME is a key of ``workload.QUERIES`` (the same registry the driver
    and the oracle suite use) — `list` prints every name. The engine
    session applies the same confs the tests run with (AQE, UTC).
    """
    import difflib

    from statline_bq_spark import workload

    if name == "list":
        for qname in workload.QUERIES:
            mark = "" if qname in workload.ORACLES else "  [rows-only]"
            click.echo(f"{qname}{mark}")
        return
    if name not in workload.QUERIES:
        close = difflib.get_close_matches(name, workload.QUERIES, n=5)
        hint = f" Did you mean: {', '.join(close)}?" if close else ""
        raise click.BadParameter(f"unknown query {name!r}.{hint}")
    spark = get_spark("statline-bq-spark-query")
    df = workload.QUERIES[name](spark, sf_dir)
    if count_only:
        click.echo(str(df.count()))
    else:
        df.show(limit, truncate=False)
