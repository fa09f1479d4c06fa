#!/usr/bin/env python
"""Sub-quadratic evidence for the kNN-graph edge builder (VERDICT r7
item 1): doc_pagerank's graph build was the one composed plan that
died at 100×, and `knn_edges_auto` now dispatches it to
`knn_self_ivf` (trained-IVF self-kNN, cluster-cogrouped Arrow GEMM,
O(n^1.5) at C=√n) past the cutover. This probe measures BOTH forms
across a replication ladder so the crossover and the scaling
exponents land in SCALE.md as numbers, not claims:

- brute (knn_bruteforce_numpy, exact): work doubles 4× per corpus
  doubling — the quadratic slope the dispatch escapes.
- self-IVF (knn_self_ivf, C=√n, nprobe=8): work should grow ~2.8×
  per doubling (n^1.5), and stay feasible at 400k rows where brute
  force is already past the probe budget.

Replication with shifted ids (scale_probe.py convention) keeps the
embedding distribution identical at every scale; replicas land in
the same cluster, so per-cluster fan-out grows exactly like a real
corpus densifying. Usage:

    python tools/knn_graph_probe.py [sf_dir]   (default sf0.1)

Prints one line per (form, n): seconds + edge count.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_to_rag_spark.operators.similarity import (  # noqa: E402
    knn_bruteforce_numpy,
    knn_self_ivf,
)
from lakehouse_to_rag_spark.session import get_spark  # noqa: E402
from lakehouse_to_rag_spark.sources.tables import load_table  # noqa: E402

ID_STRIDE = 10_000_000


def replicate(df, factor: int):
    k = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("k")
    return (
        df.select("*", k)
        .withColumn("vec_id", F.col("vec_id") + F.col("k") * F.lit(ID_STRIDE))
        .drop("k")
        .localCheckpoint(eager=True)  # time the operator, not the blow-up
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("knn-graph-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "embeddings")
    n_base = base.count()

    # quadratic ladder (exact GEMM brute force)
    for factor in (2, 4, 8):
        e = replicate(base, factor)
        n = n_base * factor
        t0 = time.time()
        edges = knn_bruteforce_numpy(e, e, k=5).count()
        print(f"brute n={n}: {time.time() - t0:.1f}s edges={edges}", flush=True)
        e.unpersist()

    # sub-quadratic ladder (trained-IVF self-kNN, the dispatch target)
    import math

    for factor in (8, 20, 40, 80):
        e = replicate(base, factor)
        n = n_base * factor
        c = max(16, math.isqrt(n))
        t0 = time.time()
        edges = knn_self_ivf(e, k=5, num_centroids=c, nprobe=8).count()
        print(
            f"self_ivf n={n} C={c}: {time.time() - t0:.1f}s edges={edges}",
            flush=True,
        )
        e.unpersist()


if __name__ == "__main__":
    main()
