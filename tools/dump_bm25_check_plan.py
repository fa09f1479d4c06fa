#!/usr/bin/env python
"""Dump the physical plan of append_to_bm25_index's fail-closed
membership check (the r14 `_ids` sidecar change) — the gated entry
bm25_served_incremental collects eagerly into a tiny_df, so its
registry-level explain cannot show the check; this reproduces the
exact check DataFrame the append builds.

Usage: python tools/dump_bm25_check_plan.py <outfile>
Builds the even-id half index into a throwaway staging dir (exactly
the bm25_served_incremental bootstrap) and dumps the plan of the
membership semi-join for the odd-id batch as the append performs it:
pre-r14 this scans the full bucket-partitioned posting layout; r14
reads the O(n_docs) `_ids` sidecar when it covers the index.
"""

from __future__ import annotations

import os
import shutil
import sys
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_to_rag_spark.session import get_spark  # noqa: E402


def main() -> None:
    outfile = sys.argv[1]
    spark = get_spark("bm25-check-plan")
    spark.sparkContext.setLogLevel("ERROR")
    from lakehouse_to_rag_spark.sources.lakehouse import read_layer

    from lakehouse_to_rag_spark.operators.retrieval import (  # noqa: E402
        write_bm25_index,
    )

    d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    staging = f"/tmp/bm25_checkplan_{uuid.uuid4().hex[:8]}"
    try:
        write_bm25_index(d.filter("doc_id % 2 = 0"), staging)
        new_ids = d.filter("doc_id % 2 = 1").select(
            F.col("doc_id").alias("id")
        ).distinct()
        stats = read_layer(spark, f"{staging}/_stats").collect()[0]
        ids_dir = os.path.join(staging, "_ids")
        membership = None
        if os.path.isdir(ids_dir):
            side = read_layer(spark, ids_dir)
            if side.count() >= int(stats["n_docs"]):
                membership = side
        if membership is None:
            membership = read_layer(spark, staging).select("id")
        check = membership.join(
            F.broadcast(new_ids), "id", "left_semi"
        ).select(F.countDistinct("id").alias("n"))
        txt = check._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        Path(outfile).write_text(txt)
        print(f"wrote {outfile}")
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
