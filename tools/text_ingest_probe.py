#!/usr/bin/env python
"""Long-run streaming TEXT-ingest probe (r13 — the media probe's twin
for ``stream_text_dedup_sink``).

Question: does the bucketed fingerprint ledger keep per-trigger wall
~flat over a realistic ingest lifetime, where a flat layout's
full-ledger anti-join read grows with cumulative admissions?

Method mirrors tools/media_ingest_probe.py:
  1. pre-populate a fingerprint ledger with SEED_FPS synthetic md5s
     (md5 of the id — probe docs almost surely don't collide) — the
     "months of prior ingest" state that makes read-side costs
     visible at probe scale;
  2. run the REAL streaming sink (``stream_text_dedup_sink``,
     maxFilesPerTrigger=1, availableNow) over N_TRIGGERS source files
     of DOCS_PER_TRIGGER fresh documents each — each micro-batch one
     full admit turn (normalize+md5, bucket-pruned anti-join, append);
  3. per-trigger wall from the query's recentProgress
     (durationMs.triggerExecution);
  4. A/B against a ledger bootstrapped with n_buckets=1 — the SAME
     code path with bucket pruning disabled (every fingerprint hashes
     to bucket 0, every trigger anti-joins the whole ledger),
     isolating the pruning as the only variable.

Usage: python tools/text_ingest_probe.py [N_TRIGGERS] [SEED_FPS]
Prints one markdown-ready table; record the numbers in SCALE.md.
"""

from __future__ import annotations

import json
import math
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _seed_ledger(spark, path: str, n_fps: int, n_buckets: int) -> None:
    from pyspark.sql import functions as F

    from lakehouse_to_rag_spark.operators.curation import (
        _fp_bucketed,
        _write_fp_scheme,
    )
    from lakehouse_to_rag_spark.sources.lakehouse import write_layer

    fps = spark.range(1, n_fps + 1).select(
        F.md5(F.col("id").cast("string")).alias("content_fp")
    )
    write_layer(
        # one file per bucket (32 tasks x 256 dirs would write 8k
        # tiny files and time the filesystem, not the engine)
        _fp_bucketed(fps, n_buckets).repartition("bucket"),
        path,
        partition_by=["bucket"],
        fmt="parquet",
    )
    _write_fp_scheme(spark, path, n_buckets)


def _make_source(spark, src_dir: str, n_triggers: int, per: int) -> None:
    for t in range(n_triggers):
        base = 10_000_000 + t * per
        rows = [
            (base + i, f"unique probe document {base + i} with enough "
                       f"words to look like prose content")
            for i in range(per)
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src_dir)


def _run(spark, tag: str, n_buckets: int, n_triggers: int,
         seed_fps: int, per: int) -> list[float]:
    from lakehouse_to_rag_spark.streaming.pipeline import (
        stream_text_dedup_sink,
    )

    root = tempfile.mkdtemp(prefix=f"text_probe_{tag}_")
    ledger = f"{root}/fps"
    src = f"{root}/src"
    t0 = time.perf_counter()
    _seed_ledger(spark, ledger, seed_fps, n_buckets)
    _make_source(spark, src, n_triggers, per)
    print(f"# [{tag}] setup {time.perf_counter() - t0:.1f}s "
          f"(seed {seed_fps} fps, {n_triggers} x {per} docs)",
          file=sys.stderr)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_text_dedup_sink(
        stream, ledger, f"{root}/ck", n_buckets=n_buckets
    )
    q.awaitTermination()
    walls = [
        p["durationMs"]["triggerExecution"] / 1000.0
        for p in (json.loads(x.json) for x in q.recentProgress)
        if p.get("numInputRows", 0) > 0
    ]
    shutil.rmtree(root, ignore_errors=True)
    return walls


def main() -> None:
    from lakehouse_to_rag_spark.session import get_spark

    n_triggers = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    seed_fps = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    mode = sys.argv[3] if len(sys.argv) > 3 else "both"
    per = 16  # small triggers: the shape where bucket pruning matters
    spark = get_spark("text-ingest-probe")
    spark.sparkContext.setLogLevel("ERROR")
    assert n_triggers <= 100, "recentProgress retains 100 entries"
    assert n_triggers >= 6, (
        "half-over-half medians need >= 6 triggers (guard BEFORE the "
        "Spark run, not an IndexError after it)"
    )

    configs = [("bucketed256", 256), ("fullscan1", 1)]
    if mode == "bucketed":
        configs = configs[:1]
    elif mode == "fullscan":
        configs = configs[1:]
    for tag, nb in configs:
        walls = _run(spark, tag, nb, n_triggers, seed_fps, per)
        h = walls[2: len(walls) // 2]  # drop warmup triggers
        t = walls[len(walls) // 2:]
        med_h = sorted(h)[len(h) // 2]
        med_t = sorted(t)[len(t) // 2]
        e = math.log(med_t / med_h) / math.log(2) if med_h > 0 else 0.0
        print(f"{tag}: triggers={len(walls)} "
              f"first-half med={med_h:.2f}s second-half med={med_t:.2f}s "
              f"half-over-half exponent e={e:.2f}")
        print("  walls: " + " ".join(f"{w:.2f}" for w in walls))
    spark.stop()


if __name__ == "__main__":
    main()
