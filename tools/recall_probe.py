#!/usr/bin/env python
"""Sampled-ground-truth recall floor for the ANN regime of
`knn_edges_auto` (VERDICT r8 item 2): past the 10k cutover the
kNN-graph edges become the `knn_self_ivf` IVF approximation, whose
accuracy at graph scale was asserted (small-n recall pin + equality
vs `ivf_topk_kmeans`) but never MEASURED at >=100k rows. This probe
quantifies it: exact top-k ground truth for ~1k sampled probes
(brute GEMM with the probe set as the query side — 1k x n, cheap even
at 400k) vs the self-IVF edge list at the dispatch's own parameters
(C = max(16, isqrt(n))), swept over nprobe. recall@5 = fraction of
exact (query, neighbor) pairs the approximate graph reproduces.

Corpus: sf0.1 embeddings replicated with a DETERMINISTIC direction
perturbation (dim-0 += replica_index * 1e-3) — identical replication
(scale_probe convention) would make ground truth a degenerate pile of
cosine-1.0 ties; the perturbation keeps the cluster structure (each
replica family stays tightly grouped, like a near-dup-dense real
corpus) while giving every vector a distinct, unambiguous neighbor
order at the operators' shared 4dp rounding.

Usage:
    python tools/recall_probe.py [sf_dir]     (default sf0.1)

Prints one line per (n, nprobe): recall@5 + build seconds. The
results land in SCALE.md and back the recall floor pinned in
tests/test_dedup_quality.py.
"""

from __future__ import annotations

import math
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
N_PROBES = 1_000
K = 5


def replicate_perturbed(df, factor: int):
    """Replicas get distinct ids AND a distinct direction: dim-0 is
    shifted by replica_index * 1e-3, which moves cosine by ~1e-3 on
    these unit-scale vectors — one decade above the operators' 4dp
    rounding, so no cross-replica exact ties survive."""
    k = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("k")
    return (
        df.select("*", k)
        .withColumn("vec_id", F.col("vec_id") + F.col("k") * F.lit(ID_STRIDE))
        .withColumn(
            "embedding",
            F.concat(
                F.array(
                    F.col("embedding")[0]
                    + F.col("k").cast("double") * F.lit(1e-3)
                ),
                F.slice(F.col("embedding"), 2, 1_000_000),
            ),
        )
        .drop("k")
        .localCheckpoint(eager=True)  # time the operator, not the blow-up
    )


DIM = 64
N_TOPICS = 500


def synthetic_corpus(spark, n: int, topic_weight: float = 1.0):
    """Deterministic topic-mixture corpus — the HARD recall case.
    Replicated real embeddings give recall 1.000 at every nprobe
    (measured r9): a replica family is cluster-colocated by
    construction, so the probed cluster always contains the true
    top-k. Here each vector is its topic's base direction plus 50%
    per-vector noise, both derived from xxhash64 (no RNG): topic
    neighborhoods are tight enough that true neighbors are mostly
    same-topic, but noise pushes a vector's nearest neighbors across
    quantization-cell boundaries — the regime where nprobe actually
    trades recall."""
    comp = (
        "transform(sequence(0, {d}), j -> "
        "  (cast(xxhash64({seed}, j) as double) / 9.223372036854776e18)"
        ")"
    )
    topic_base = comp.format(d=DIM - 1, seed="vec_id % {t}".format(t=N_TOPICS))
    noise = comp.format(d=DIM - 1, seed="vec_id + 1000000")
    return (
        spark.range(n)
        .select(F.col("id").alias("vec_id"))
        .select(
            "vec_id",
            F.expr(
                f"zip_with({topic_base}, {noise}, "
                f"(b, e) -> {topic_weight} * b + 0.5 * e)"
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )


def sweep(corpus, n: int, label: str) -> None:
    stride = max(1, n // N_PROBES)
    probes = corpus.filter(
        F.pmod(F.xxhash64("vec_id"), F.lit(stride)) == 0
    ).limit(N_PROBES).localCheckpoint(eager=True)
    n_p = probes.count()
    t0 = time.time()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce_numpy(corpus, probes, k=K).collect()
    }
    t_exact = time.time() - t0
    print(
        f"[{label}] n={n} probes={n_p} exact_pairs={len(exact)} "
        f"exact_sec={t_exact:.1f}",
        flush=True,
    )
    c = max(16, math.isqrt(n))
    probe_ids = {q for q, _ in exact}
    for nprobe in (4, 8, 16):
        t0 = time.time()
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in knn_self_ivf(
                corpus, k=K, num_centroids=c, nprobe=nprobe
            ).collect()
            if r["query_id"] in probe_ids
        }
        dt = time.time() - t0
        recall = len(exact & approx) / len(exact)
        print(
            f"[{label}] n={n} C={c} nprobe={nprobe}: "
            f"recall@{K}={recall:.3f} build_sec={dt:.1f}",
            flush=True,
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    spark = get_spark("recall-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if mode in ("synthetic", "both"):
        for n in (100_000, 400_000):
            corpus = synthetic_corpus(spark, n)
            sweep(corpus, n, "synthetic")
            corpus.unpersist()
    if mode == "uniform":
        # pure-noise, no topic structure: the pessimistic IVF floor
        # (neighborhoods have no cluster alignment to exploit)
        for n in (100_000, 400_000):
            corpus = synthetic_corpus(spark, n, topic_weight=0.0)
            sweep(corpus, n, "uniform")
            corpus.unpersist()
        return
    if mode == "synthetic":
        return
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        )
    )
    n_base = base.count()

    factors = (-(-100_000 // n_base), -(-400_000 // n_base))
    for factor in factors:  # ~100k / ~400k regardless of base size
        corpus = replicate_perturbed(base, factor)
        n = corpus.count()
        assert n == n_base * factor
        sweep(corpus, n, "replicated")
        corpus.unpersist()


if __name__ == "__main__":
    main()
