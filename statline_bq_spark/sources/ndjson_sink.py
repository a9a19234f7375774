"""Custom Python Data Source WRITER: an ndjson sink.

The reference's interchange format is ndjson — every OData page is dumped
as one ndjson file before conversion (reference ``utils.py:228-264``).
This sink closes the loop on the DSv2 surface: where
``sources/odata_source.py`` demonstrates the Python Data Source READ path
(partition planning + filter pushdown), this demonstrates the WRITE path
(``DataSourceWriter``): each Spark task serializes its partition to one
``part-<taskid>.ndjson`` file and returns a commit message with its row
count; the driver-side ``commit`` records a manifest, giving the sink
all-or-nothing visibility (readers only trust files listed in the
manifest, so a failed job leaves no half-visible output).

Usage::

    df.write.format("ndjson_sink").option("path", out_dir).mode("append").save()

Scale: one file per partition, no driver materialization; the manifest is
a single small JSON written at commit. Value rendering matches the
reference's ``json.dumps`` of parsed OData values (strings/numbers/bools/
nulls); timestamps render ISO, binary renders base64.
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST = "_MANIFEST.json"


def _default(o):
    if isinstance(o, (datetime.datetime, datetime.date)):
        return o.isoformat()
    if isinstance(o, (bytes, bytearray)):
        return base64.b64encode(bytes(o)).decode("ascii")
    if isinstance(o, decimal.Decimal):
        return str(o)
    raise TypeError(f"not JSON serializable: {type(o)}")


@dataclass
class _Commit(WriterCommitMessage):
    file: str
    rows: int


class NdjsonWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ndjson_sink requires option 'path'")
        self.run_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"part-{self.run_id}-{pid:05d}.ndjson"
        full = os.path.join(self.path, name)
        n = 0
        with open(full, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(recursive=True), default=_default))
                f.write("\n")
                n += 1
        return _Commit(file=name, rows=n)

    def commit(self, messages):
        manifest = {
            "files": sorted(m.file for m in messages if m is not None),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        with open(os.path.join(self.path, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)

    def abort(self, messages):
        for m in messages or []:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.file))
                except OSError:
                    pass


class NdjsonSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ndjson_sink"

    def schema(self) -> StructType | str:
        # writer-only source; schema comes from the DataFrame being written
        return "placeholder string"

    def writer(self, schema: StructType, overwrite: bool) -> NdjsonWriter:
        return NdjsonWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(NdjsonSinkDataSource)


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)
