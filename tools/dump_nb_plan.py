#!/usr/bin/env python
"""Dump the NB-quality stage's plan in the pretrain_corpus_full shape
(train = even-id filter of the apply corpus) with and without the r14
``train_within_apply`` path — the capstone's own explain hides this
stage inside the ``selected`` lazy checkpoint, so the stage is dumped
standalone. The flag=False branch is byte-identical to the pre-r14
code (the default path was not touched), so flag=False IS the before
plan.

Usage: python tools/dump_nb_plan.py <before_out> <after_out>
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_to_rag_spark.session import get_spark  # noqa: E402


def main() -> None:
    before_out, after_out = sys.argv[1], sys.argv[2]
    spark = get_spark("nb-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    from lakehouse_to_rag_spark.operators.text_analysis import (
        nb_quality_scores,
    )

    d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text", "source"
    )
    train = d.filter(F.col("doc_id") % 2 == 0).withColumn(
        "is_hq", F.col("source").isin(*[f"src{i}" for i in range(10)])
    )

    def fmt(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    Path(before_out).write_text(
        fmt(nb_quality_scores(train, d, train_within_apply=False))
    )
    Path(after_out).write_text(
        fmt(nb_quality_scores(train, d, train_within_apply=True))
    )
    print(f"wrote {before_out} and {after_out}")
    spark.stop()


if __name__ == "__main__":
    main()
