#!/usr/bin/env python
"""Dump .explain('formatted') for registry entries to plans/<dir>/.

Usage: python tools/dump_plans.py <out_dir> <suffix> <entry> [entry ...]
Writes plans/<out_dir>/<entry>_<suffix>.txt for each entry. Entries
whose registry callable performs side effects (staging builds) still
expose the composed plan of the DataFrame they return; entries that
collect eagerly and return a tiny_df are dumped via their inner plan
hook when one is registered below.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_to_rag_spark.plans.registry import QUERIES  # noqa: E402
from lakehouse_to_rag_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _fmt(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(__file__).resolve().parent.parent / "plans" / out_dir
    out.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        (out / f"{name}_{suffix}.txt").write_text(_fmt(df))
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
