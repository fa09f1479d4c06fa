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


def migrate_ledger(
    spark: SparkSession,
    path: str,
    rebucket,
    scheme_fields: dict[str, int],
) -> None:
    """One-time migration of a ledger to its bucket-partitioned
    append-only layout: read the existing table, rewrite it through
    ``rebucket`` (a callable DataFrame -> rows carrying a ``bucket``
    column — the caller's distinct + banding/bucketing projection,
    which also heals a crashed bootstrap's partial rows), record the
    scheme, and swap atomically via the two-rename discipline
    (``_recover_dir_swap``'s ``__upsert_``/``__old_`` remnant
    classes). O(cumulative) once; every subsequent batch reads only
    its colliding buckets."""
    from lakehouse_to_rag_spark.sources.lakehouse import write_layer

    rows = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}__upsert_{uuid.uuid4().hex[:8]}"
    write_layer(
        rebucket(rows), tmp, partition_by=["bucket"], fmt="parquet"
    )
    write_scheme(spark, tmp, scheme_fields)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def compact_ledger(spark: SparkSession, path: str, split_col: str) -> int:
    """Compact a bucketed ledger through the shared
    ``_compact_index_layout`` swap, ``_scheme`` carried verbatim.
    Single-writer contract: run with the ingest loop QUIESCED.
    Returns the data file count written."""
    from lakehouse_to_rag_spark.operators.similarity import (
        _compact_index_layout,
    )

    return _compact_index_layout(
        spark, path, "bucket",
        carry_dirs=("_scheme",), rewrite_dirs=(), split_col=split_col,
    )


def compact_if_deep(
    spark: SparkSession, path: str, threshold: int, split_col: str
) -> None:
    """The admit loops' in-band compaction trigger: a partitioned
    append writes one file per TOUCHED bucket per batch, so the
    trigger is the MAX per-bucket file count exceeding
    ``threshold``."""
    import pathlib

    per_bucket = [
        len(list(d.glob("*.parquet")))
        for d in pathlib.Path(path).glob("bucket=*")
    ]
    if per_bucket and max(per_bucket) > threshold:
        compact_ledger(spark, path, split_col)


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
    from lakehouse_to_rag_spark.sources.tables import tiny_df

    write_layer(
        tiny_df(spark, [tuple(fields.values())], schema),
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
