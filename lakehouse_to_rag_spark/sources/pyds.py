"""Custom Python Data Source (Spark 4 DataSource API).

The reference's raw ingest (S2, airflow/dags/etl.py:53-82) is an
imperative loop: list objects, download each, ``json.loads``, tag
``source`` with the object name. ``sources/raw_json.py`` maps that to
``spark.read.json``; this module shows the third door Spark 4 opens —
a first-class *pluggable* source implementing the same contract, so
``spark.read.format("json_docs").load(path)`` works anywhere a format
string is accepted (including SQL `CREATE TABLE ... USING`).

Scale shape: ``partitions()`` returns one InputPartition per object,
so reads parallelize across executors exactly like a native file
source; each task parses only its object. A real deployment would
batch small objects into splits (like Spark's own FilePartition
packing) — the partition-per-object shape keeps the example honest
while the listing happens once on the driver, which is also how
InMemoryFileIndex works.

This is plumbing the reference cannot express at all (its ingest is
bound to one process's loop); register with
``spark.dataSource.register(JsonDocsDataSource)``.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from lakehouse_to_rag_spark.sources.raw_json import raw_schema


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonDocsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        path = options.get("path")
        if not path:
            raise ValueError("json_docs: 'path' option (file or glob) is required")
        pattern = path if any(ch in path for ch in "*?[") else os.path.join(path, "*.json")
        self.files = sorted(glob.glob(pattern))

    def partitions(self):
        # one partition per object -> file-parallel scan on executors
        return [_FilePartition(p) for p in self.files]

    def read(self, partition: _FilePartition):
        names = [f.name for f in self.schema_.fields]
        with open(partition.path) as fh:
            obj = json.load(fh)
        row = []
        for n in names:
            if n == "source":
                row.append(os.path.basename(partition.path))
            else:
                row.append(obj.get(n))
        yield tuple(row)


class JsonDocsDataSource(DataSource):
    """``format("json_docs")``: one JSON object per file, ``source``
    tagged with the object basename (reference etl.py:74 parity)."""

    @classmethod
    def name(cls) -> str:
        return "json_docs"

    def schema(self) -> StructType:
        s = raw_schema()
        return s.add("source", "string")

    def reader(self, schema: StructType) -> JsonDocsReader:
        return JsonDocsReader(schema, self.options)
