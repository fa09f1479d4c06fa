#!/usr/bin/env python
"""Long-run streaming media-ingest probe (r13 — VERDICT r12 task 7).

Question: does the r13 band-bucketed signature ledger keep per-trigger
wall ~flat over a realistic ingest lifetime, where the r12 layout's
full-ledger read per batch grows with cumulative admissions?

Method:
  1. pre-populate a signature ledger with SEED_SIGS synthetic
     signatures (xxhash64 of the id — uniform 64-bit, so probe images
     almost surely don't collide) — the "months of prior ingest"
     state that makes read-side costs visible at probe scale;
  2. run the REAL streaming sink (``stream_media_dedup_sink``,
     maxFilesPerTrigger=1, availableNow) over N_TRIGGERS source files
     of IMAGES_PER_TRIGGER fresh PNGs each — 50+ micro-batches, each
     one full admit turn (hash, banded dedup vs the ledger, append);
  3. read per-trigger wall from the query's recentProgress
     (durationMs.triggerExecution — the harness's own clock, not
     ours) and regress log(wall) on log(trigger index) over the
     second half, where the cumulative ledger has doubled;
  4. A/B: the same probe against a ledger bootstrapped with
     n_buckets=1 — the SAME code path with bucket pruning disabled
     (every band row hashes to bucket 0, every trigger reads the
     whole ledger), isolating the pruning as the only variable.

Usage: python tools/media_ingest_probe.py [N_TRIGGERS] [SEED_SIGS]
Prints one markdown-ready table; record the numbers in SCALE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _seed_ledger(spark, path: str, n_sigs: int, n_buckets: int) -> None:
    from pyspark.sql import functions as F

    from lakehouse_to_rag_spark.operators.dedup import (
        _media_band_rows,
        _write_media_scheme,
    )
    from lakehouse_to_rag_spark.sources.lakehouse import write_layer

    sigs = spark.range(1, n_sigs + 1).select(
        F.col("id"), F.xxhash64("id").alias("simhash")
    )
    write_layer(
        # one file per bucket (32 tasks x 256 dirs would write 8k
        # tiny files and time the filesystem, not the engine)
        _media_band_rows(sigs, 7, n_buckets).repartition("bucket"),
        path,
        partition_by=["bucket"],
        fmt="parquet",
    )
    _write_media_scheme(spark, path, 7, n_buckets)


def _make_source(spark, src_dir: str, n_triggers: int, per: int) -> None:
    import pandas as pd

    from lakehouse_to_rag_spark.multimodal.ops import encode_png
    from lakehouse_to_rag_spark.multimodal.phash import (
        synth_gradient_image,
    )

    for t in range(n_triggers):
        ids = [10_000_000 + t * per + i for i in range(per)]
        pdf = pd.DataFrame(
            [(i, encode_png(synth_gradient_image(i))) for i in ids],
            columns=["doc_id", "payload"],
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
            src_dir
        )


def _run(spark, tag: str, n_buckets: int, n_triggers: int,
         seed_sigs: int, per: int) -> list[float]:
    from lakehouse_to_rag_spark.streaming.pipeline import (
        stream_media_dedup_sink,
    )

    root = tempfile.mkdtemp(prefix=f"media_probe_{tag}_")
    ledger = f"{root}/sigs"
    src = f"{root}/src"
    t0 = time.perf_counter()
    _seed_ledger(spark, ledger, seed_sigs, n_buckets)
    _make_source(spark, src, n_triggers, per)
    print(f"# [{tag}] setup {time.perf_counter() - t0:.1f}s "
          f"(seed {seed_sigs} sigs, {n_triggers} x {per} images)",
          file=sys.stderr)
    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_media_dedup_sink(
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
    import math

    from lakehouse_to_rag_spark.session import get_spark

    n_triggers = int(sys.argv[1]) if len(sys.argv) > 1 else 54
    seed_sigs = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    mode = sys.argv[3] if len(sys.argv) > 3 else "both"
    per = 4  # small triggers: the shape where bucket pruning matters
    spark = get_spark("media-ingest-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # keep ALL progress entries (recentProgress caps at this number)
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
    results = {}
    for tag, nb in configs:
        walls = _run(spark, tag, nb, n_triggers, seed_sigs, per)
        results[tag] = walls
        h = walls[2: len(walls) // 2]  # drop warmup triggers
        t = walls[len(walls) // 2:]
        med_h = sorted(h)[len(h) // 2]
        med_t = sorted(t)[len(t) // 2]
        # exponent of wall vs trigger index over the run's second vs
        # first half (ledger grows linearly in trigger count)
        e = math.log(med_t / med_h) / math.log(2) if med_h > 0 else 0.0
        print(f"{tag}: triggers={len(walls)} "
              f"first-half med={med_h:.2f}s second-half med={med_t:.2f}s "
              f"half-over-half exponent e={e:.2f}")
        print("  walls: " + " ".join(f"{w:.2f}" for w in walls))
    spark.stop()


if __name__ == "__main__":
    main()
