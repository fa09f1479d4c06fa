#!/usr/bin/env python
"""Registry-wide physical-plan sweep: scan / exchange / codegen counts.

Plan shapes are the thing that breaks silently: a refactor that makes a
query re-read its input table or add an exchange still passes every
value test, and at bench scale the wall-clock delta can hide in noise —
but at 100 TB an extra fact-table scan is hours. This sweep prints one
line per registry query with the counts that matter; the curated
regression bounds live in tests/test_plan_shapes.py.

Usage: python tools/plan_sweep.py [sf_dir]   (plans only, no execution)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_to_rag_spark.plans.registry import QUERIES  # noqa: E402
from lakehouse_to_rag_spark.session import get_spark  # noqa: E402


def plan_counts(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "scans": plan.count("FileScan"),
        "exchanges": plan.count("Exchange"),
        "sorts": plan.count("Sort "),
        "windows": plan.count("Window"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in sorted(QUERIES):
        try:
            c = plan_counts(QUERIES[name](spark, sf_dir))
        except Exception as e:  # streaming-only or env-gated entries
            print(f"{name}: SKIP ({type(e).__name__})")
            continue
        rows.append((name, c))
        print(
            f"{name}: scans={c['scans']} exchanges={c['exchanges']} "
            f"sorts={c['sorts']} windows={c['windows']} "
            f"bhj={c['bhj']} smj={c['smj']}"
        )
    total_scans = sum(c["scans"] for _, c in rows)
    total_ex = sum(c["exchanges"] for _, c in rows)
    print(f"# {len(rows)} queries, {total_scans} scans, {total_ex} exchanges")
    spark.stop()


if __name__ == "__main__":
    main()
