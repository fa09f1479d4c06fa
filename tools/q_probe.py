#!/usr/bin/env python
"""Isolate one registry entry: dump .explain('formatted') and time it
with the noop sink (guide §1.4) — min of N runs, labeled jobs.

Usage: python tools/q_probe.py <entry> [sf_dir] [--plan-only] [--runs N]
       [--out plans/r13/<entry>_before.txt]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_to_rag_spark.plans.registry import QUERIES  # noqa: E402
from lakehouse_to_rag_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    plan_only = "--plan-only" in sys.argv
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]

    spark = get_spark("q-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the Python worker pool + Arrow path (bench.py's discipline)
    spark.range(100_000).mapInPandas(lambda it: it, schema="id long").count()

    df = QUERIES[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    if out:
        Path(out).write_text(plan)
        print(f"# plan -> {out}", file=sys.stderr)
    else:
        print(plan)
    if not plan_only:
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} noop run {i}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(
            f"{name}: noop min={min(times):.3f}s "
            f"runs={[round(t, 3) for t in times]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
