"""Shared scheme-record I/O for the append-only bucketed ingest
ledgers (curation.admit_batch's fingerprint table, dedup.
admit_media_batch's signature table).

A ledger directory carries a tiny ``_scheme`` parquet recording how
its rows were bucketed (and, for the media ledger, banded). The
record is load-bearing: reads prune to the batch's own buckets, so a
ledger read under the WRONG scheme would silently miss duplicates.
Two crash classes threaten it (r13 self-review):

- death BETWEEN the data write and the scheme write (bootstrap /
  migration) — handled by the callers' migrate paths, which treat a
  scheme-less table as pre-scheme and re-derive it atomically;
- death MID scheme write — previously left a half-written ``_scheme``
  directory that *exists* but cannot be read, bricking every
  subsequent batch with an AnalysisException. Fixed here twice over:
  ``write_scheme`` stages to a ``_scheme__tmp_*`` sibling and
  ``os.rename``s into place (atomic on POSIX, so the torn state can
  no longer be created), and ``read_scheme`` treats an unreadable
  record as ABSENT, routing the caller into the same migrate
  self-heal as the other crash class instead of raising forever.

Underscore-prefixed names are hidden from Spark/Hadoop file listings,
so neither ``_scheme`` nor a stale ``_scheme__tmp_*`` remnant ever
pollutes a data read; remnants are swept opportunistically on the
next successful write and dropped wholesale by the migrate/compaction
directory swaps. Single-writer contract throughout (the ledgers'
documented ingest-loop discipline).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def write_scheme(
    spark: SparkSession, table_path: str, fields: dict[str, int]
) -> None:
    """Atomically record ``fields`` (int-valued) as the one-row
    ``{table_path}/_scheme`` parquet: stage under ``_scheme__tmp_*``,
    then rename into place so no reader can ever observe a
    half-written record."""
    from lakehouse_to_rag_spark.sources.lakehouse import write_layer

    # sweep stale staging remnants from earlier crashed writes
    for name in os.listdir(table_path):
        if name.startswith("_scheme__tmp_"):
            shutil.rmtree(os.path.join(table_path, name), ignore_errors=True)
    tmp = os.path.join(table_path, f"_scheme__tmp_{uuid.uuid4().hex[:8]}")
    schema = ", ".join(f"{k} int" for k in fields)
    write_layer(
        spark.createDataFrame([tuple(fields.values())], schema),
        tmp,
        fmt="parquet",
    )
    final = os.path.join(table_path, "_scheme")
    if os.path.exists(final):
        # a corrupt remnant from the pre-atomic era (or a healed
        # migration re-recording): replace under the single-writer
        # contract — rename onto a non-empty dir would ENOTEMPTY
        shutil.rmtree(final)
    os.rename(tmp, final)


def read_scheme(
    spark: SparkSession, table_path: str, keys: tuple[str, ...]
) -> dict[str, int] | None:
    """The ledger's scheme record as ``{key: int}``, or None when the
    record is absent OR unreadable (a torn pre-atomic write, an empty
    directory, garbage bytes) — both route the caller into its
    migrate self-heal, which re-derives data + scheme in one atomic
    swap. Returning None for transient read failures is also correct,
    merely paying one unnecessary O(cumulative) migration."""
    from lakehouse_to_rag_spark.sources.lakehouse import read_layer

    sdir = os.path.join(table_path, "_scheme")
    if not os.path.exists(sdir):
        return None
    try:
        row = read_layer(spark, sdir, fmt="parquet").collect()[0]
        return {k: int(row[k]) for k in keys}
    except Exception:
        return None
