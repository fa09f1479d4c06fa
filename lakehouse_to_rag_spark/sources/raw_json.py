"""Raw-layer ingest: JSON objects -> typed DataFrame.

Reference behavior (airflow/dags/etl.py:53-82 + minio_service.py:51-56):
download every ``*.json`` object from the ``raw`` bucket one at a time,
``json.loads`` each, tag ``source`` with the object name, and build a
columnar batch via ``pa.Table.from_pylist``.

Spark-native shape: one declarative ``spark.read.json`` over the object
listing glob — the S3A/posix listing, download parallelism, and JSON
parsing all happen distributed, with an explicit schema (schema-on-write
discipline; the reference infers). ``source`` comes from
``input_file_name()`` normalized to the object basename for parity with
the reference's ``object_name`` tag (etl.py:74).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Effective raw schema (SURVEY.md §1.3): fixed crawl metadata plus one
# nullable string per configured CSS selector (reference
# scraper.py:132-153, 244-250). Selector keys are configurable; these
# are the sample-config defaults.
DEFAULT_SELECTOR_FIELDS = ["title", "content", "author", "language"]


def raw_schema(selector_fields: list[str] | None = None) -> StructType:
    fields = [
        StructField("url", StringType()),
        StructField("scraped_at", DoubleType()),
        StructField("status_code", LongType()),
    ]
    for key in selector_fields or DEFAULT_SELECTOR_FIELDS:
        fields.append(StructField(key, StringType()))
    return StructType(fields)


def read_raw_json(
    spark: SparkSession,
    path_glob: str,
    selector_fields: list[str] | None = None,
) -> DataFrame:
    """Distributed ingest of raw scraped JSON objects.

    ``path_glob`` e.g. ``s3a://raw/*.json`` or ``/tmp/raw/*.json``.
    """
    df = spark.read.schema(raw_schema(selector_fields)).json(path_glob)
    # object basename == reference's `source = object_name`
    return df.withColumn(
        "source", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
