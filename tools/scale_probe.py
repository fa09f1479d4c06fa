#!/usr/bin/env python
"""N-fold corpus replication probe for the dedup scale paths.

Replicates documents/embeddings FACTOR times with shifted ids (every
row joins a FACTOR-clique of exact replicas — worst-case dup density:
the true-pair set grows quadratically in FACTOR), then times the
operators whose 100 TB story was rebuilt in round 2:

- tf_cosine_pairs dense regime: distributed upper-triangular block
  GEMM — at FACTOR=20 the 5k-doc sf0.1 corpus becomes 100k docs =
  25 blocks = 325 block-pair tasks, so the multi-block path (never hit
  at bench scale) carries real volume.
- embedding_lsh_pairs: banded signature join + distributed pair-join
  verification (no driver-side matrix since round 2).

Usage: python tools/scale_probe.py [factor] [sf_dir]
Prints one line per operator: seconds + output rows (stderr noise from
Spark; stdout is the result lines only).

EXPONENT MODE (r11 — VERDICT r10 task 6, the formalized form of the
ad-hoc 10x/100x SCALE.md probes): replicate the sf dir's
documents/events/embeddings FACTOR times with shifted ids into a
temp catalog dir, run each named REGISTRY ENTRY against the 1x and
the Nx replica dirs (min of two runs each — same parquet layout both
sides, so the ratio isolates the operator), and print the fitted
scaling exponent  e = log(t_N / t_1) / log(N)  per entry. e ~ 1 is
linear, e ~ 2 quadratic, e ~ 0 replication-invariant (driver-bound
or non-scaling input). The r10 regressions (shingle_novelty 9x,
minhash_distinct 2.8x) hid behind small sf0.1 constants — an
exponent report catches the class even when the constant is small.

Usage: python tools/scale_probe.py exponent [factor] [sf_dir] [entry ...]
Default entries: the heaviest driver-bench rows that scale with the
replicated tables (curated from BENCH_r10).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_to_rag_spark.operators.dedup import (  # noqa: E402
    embedding_lsh_pairs,
    tf_cosine_pairs,
)
from lakehouse_to_rag_spark.session import get_spark  # noqa: E402
from lakehouse_to_rag_spark.sources.tables import load_table  # noqa: E402

ID_STRIDE = 10_000_000


def replicate(df, id_col: str, factor: int):
    k = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("k")
    return (
        df.select("*", k)
        .withColumn(id_col, F.col(id_col) + F.col("k") * F.lit(ID_STRIDE))
        .drop("k")
        .localCheckpoint(eager=True)  # time the operator, not the blow-up
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = replicate(
        load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull()),
        "doc_id",
        factor,
    )
    emb = replicate(load_table(spark, sf_dir, "embeddings"), "vec_id", factor)
    n_docs, n_vecs = docs.count(), emb.count()
    print(f"# corpus: {n_docs} docs, {n_vecs} vectors ({factor}x)")

    t0 = time.perf_counter()
    n = tf_cosine_pairs(docs, "doc_id", "text", threshold=0.9).count()
    print(
        f"tf_cosine_dense_blockgemm: {time.perf_counter() - t0:.1f}s pairs={n}"
    )

    t0 = time.perf_counter()
    n = embedding_lsh_pairs(
        emb, num_bits=64, num_bands=8, threshold=0.9
    ).count()
    print(f"embedding_lsh_pairjoin_verify: {time.perf_counter() - t0:.1f}s pairs={n}")

    # linear / banded operators: wall should grow ~FACTOR× (plus the
    # quadratic true-dup pair OUTPUT for the pair ops), never FACTOR²
    from lakehouse_to_rag_spark.operators.curation import (
        bloom_decontaminate,
        domain_mix_sample,
        training_shuffle,
    )
    from lakehouse_to_rag_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from lakehouse_to_rag_spark.operators.text_analysis import bigram_lm_scores

    t0 = time.perf_counter()
    n = minhash_lsh_pairs(docs, "doc_id", "text").count()
    print(f"minhash_banded: {time.perf_counter() - t0:.1f}s pairs={n}")

    t0 = time.perf_counter()
    n = simhash_pairs(docs, "doc_id", "text", max_hamming=3).count()
    print(f"simhash_banded: {time.perf_counter() - t0:.1f}s pairs={n}")

    t0 = time.perf_counter()
    holdout = docs.filter(F.col("doc_id") % 10 == 0)
    n = bloom_decontaminate(docs, holdout, m_bits=1 << 20, k=3).count()
    print(f"bloom_decontaminate: {time.perf_counter() - t0:.1f}s rows={n}")

    t0 = time.perf_counter()
    n = bigram_lm_scores(docs).count()
    print(f"bigram_lm_scores: {time.perf_counter() - t0:.1f}s rows={n}")

    from lakehouse_to_rag_spark.operators.text_analysis import (
        remove_duplicate_spans,
        sequence_pack,
    )

    # worst-case gram skew by construction: every replica clique makes
    # every 5-gram a duplicated gram appearing in >= FACTOR docs, and
    # the small synthetic vocabulary means a handful of grams appear in
    # a large fraction of ALL docs — the boilerplate-gram hot key
    t0 = time.perf_counter()
    removed = remove_duplicate_spans(docs, min_docs=max(2, factor))
    n = removed.filter(F.col("n_removed_words") > 0).count()
    print(
        f"remove_duplicate_spans: {time.perf_counter() - t0:.1f}s "
        f"docs_touched={n}"
    )

    t0 = time.perf_counter()
    n = sequence_pack(docs, seq_tokens=2048).count()
    print(f"sequence_pack: {time.perf_counter() - t0:.1f}s rows={n}")

    from lakehouse_to_rag_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )
    from lakehouse_to_rag_spark.operators.text_analysis import (
        trigram_backoff_scores,
    )
    from lakehouse_to_rag_spark.operators.curation import (
        temperature_mix_sample,
    )

    t0 = time.perf_counter()
    books = pq_train(emb, m=8, k=64, sample_rows=4096, iters=5)
    codes = pq_encode(emb, books).localCheckpoint(eager=True)
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    queries = emb.filter(F.col("vec_id") < 10)
    n = pq_topk(codes, queries, books, k=10).count()
    print(
        f"pq_train+encode: {t_enc:.1f}s  pq_topk_adc: "
        f"{time.perf_counter() - t0:.1f}s rows={n}"
    )

    t0 = time.perf_counter()
    n = trigram_backoff_scores(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
    ).count()
    print(f"trigram_backoff: {time.perf_counter() - t0:.1f}s rows={n}")

    t0 = time.perf_counter()
    n = temperature_mix_sample(docs, alpha=0.5).count()
    print(f"temperature_mix: {time.perf_counter() - t0:.1f}s rows={n}")

    t0 = time.perf_counter()
    n = training_shuffle(docs, n_shards=64).count()
    n2 = domain_mix_sample(
        docs, {"src0": 0.4, "src1": 0.3, "src2": 0.3}
    ).count()
    print(
        f"training_shuffle+domain_mix: {time.perf_counter() - t0:.1f}s "
        f"rows={n}/{n2}"
    )

    # ---- round-4 operators -------------------------------------------
    from lakehouse_to_rag_spark.operators.curation import dsir_select
    from lakehouse_to_rag_spark.operators.dedup import ngram_jaccard_pairs
    from lakehouse_to_rag_spark.operators.retrieval import bm25_topk

    queries_txt = spark.createDataFrame(
        [
            (0, "spark table join"),
            (1, "fast vector scan"),
            (2, "window agg stream"),
        ],
        "query_id long, query string",
    )
    t0 = time.perf_counter()
    n = bm25_topk(docs, queries_txt, k=5).count()
    print(f"bm25_posting_join: {time.perf_counter() - t0:.1f}s rows={n}")

    t0 = time.perf_counter()
    n = dsir_select(
        docs, docs.filter(F.col("source").isin("src0", "src1")), n=2000
    ).count()
    print(f"dsir_gumbel_topk: {time.perf_counter() - t0:.1f}s rows={n}")

    # skew bomb: one stop-shingle planted into 30% of the corpus would
    # contribute C(0.3*n_docs, 2) self-join rows uncapped; the DF cap
    # must hold wall time at the no-plant baseline
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.concat(F.lit("common stop shingle here "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    t0 = time.perf_counter()
    n = ngram_jaccard_pairs(
        planted, "doc_id", "text", 3, 0.5, max_shingle_df=10_000
    ).count()
    print(f"ngram_jaccard_df_cap_planted: {time.perf_counter() - t0:.1f}s pairs={n}")

    from lakehouse_to_rag_spark.operators.dedup import semdedup
    from lakehouse_to_rag_spark.operators.text_analysis import (
        line_dedup,
        nb_quality_scores,
    )

    t0 = time.perf_counter()
    n = line_dedup(docs).count()
    print(f"line_dedup: {time.perf_counter() - t0:.1f}s rows={n}")

    t0 = time.perf_counter()
    train = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "is_hq", F.col("source").isin("src0", "src1", "src2")
    )
    n = nb_quality_scores(train, docs.filter(F.col("doc_id") % 2 == 1)).count()
    print(f"nb_quality_filter: {time.perf_counter() - t0:.1f}s rows={n}")

    # replica cliques are the semdedup worst case: every identity
    # group lands in one cluster; duplicate-proof init (first-k
    # DISTINCT vectors) keeps per-cluster blocks bounded
    t0 = time.perf_counter()
    kept = (
        semdedup(emb, num_clusters=64, threshold=0.95, iterations=2)
        .filter(F.col("kept"))
        .count()
    )
    print(f"semdedup(64 clusters): {time.perf_counter() - t0:.1f}s kept={kept}")

    # oversized-cluster hierarchy: a deliberately tiny num_clusters
    # drops ~n/4 rows into each top-level cluster, far over the cap —
    # the recursive re-cluster must fan them out to executor-sized
    # leaves instead of raising (r5; flat form would refuse here)
    t0 = time.perf_counter()
    kept = (
        semdedup(
            emb,
            num_clusters=4,
            threshold=0.95,
            iterations=2,
            max_cluster_rows=20_000,
        )
        .filter(F.col("kept"))
        .count()
    )
    print(f"semdedup_autosplit(4 clusters, cap 20k): {time.perf_counter() - t0:.1f}s kept={kept}")

    # r5: named quality filters are pure per-row projections — wall
    # must track corpus size linearly with zero shuffle
    from lakehouse_to_rag_spark.operators.text_analysis import (
        c4_line_filter,
        gopher_quality_scores,
    )

    t0 = time.perf_counter()
    n = (
        gopher_quality_scores(docs, min_stop_words=1)
        .filter("keep")
        .count()
    )
    print(f"gopher_quality: {time.perf_counter() - t0:.1f}s kept={n}")
    # line-structure injection (registry convention) so the filter
    # exercises both keep and drop paths on the synthetic corpus
    structured = docs.withColumn(
        "text", F.regexp_replace(F.col("text"), " table ", ".\n")
    )
    t0 = time.perf_counter()
    n = (
        c4_line_filter(structured, min_kept_lines=2)
        .filter("NOT dropped")
        .count()
    )
    print(f"c4_line_filter: {time.perf_counter() - t0:.1f}s kept={n}")

    # r5: greedy k-center is k Arrow passes over the corpus — linear
    # in n per pass by construction; the replica cliques collapse to
    # the base corpus's diversity structure
    from lakehouse_to_rag_spark.operators.curation import kcenter_select

    t0 = time.perf_counter()
    n = kcenter_select(emb, k=8).count()
    print(f"kcenter_select(k=8): {time.perf_counter() - t0:.1f}s centers={n}")

    # r5: PCA is one moment pass (O(d^2) state) + one projection pass —
    # wall must track corpus size linearly; the replica cliques leave
    # the covariance (hence the trained components) EXACTLY that of the
    # base corpus, a free invariant check on the training math
    from lakehouse_to_rag_spark.operators.spectral import pca_project

    t0 = time.perf_counter()
    n = pca_project(emb, k=4, iterations=20).count()
    print(f"pca_project(k=4): {time.perf_counter() - t0:.1f}s rows={n}")

    # r5: MMR cost is kNN + (queries x k_candidates) greedy — corpus
    # growth only affects the candidate fetch, never the greedy stage
    from lakehouse_to_rag_spark.operators.retrieval import mmr_rerank

    t0 = time.perf_counter()
    n = mmr_rerank(
        emb, emb.filter(F.col("vec_id") < 10), k_candidates=20, k=5
    ).count()
    print(f"mmr_rerank(10q,kc=20): {time.perf_counter() - t0:.1f}s rows={n}")

    # r5b: JL projection is ONE map-only Arrow pass (no training, no
    # shuffle) — the cheapest per-row op in the package; wall must
    # track corpus size linearly with near-zero constant
    from lakehouse_to_rag_spark.operators.spectral import jl_project

    t0 = time.perf_counter()
    n = jl_project(emb, k=16).count()
    print(f"jl_project(k=16): {time.perf_counter() - t0:.1f}s rows={n}")

    # r5b: perplexity bucketing = trigram scoring (probed above via
    # trigram_backoff_scores) + the distributed two-phase global rank;
    # the rank's own cost is one range exchange over the REDUCED
    # per-doc score rows + a bounded partition-count collect
    from lakehouse_to_rag_spark.operators.text_analysis import (
        perplexity_buckets,
    )

    t0 = time.perf_counter()
    n = perplexity_buckets(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
    ).count()
    print(f"perplexity_buckets: {time.perf_counter() - t0:.1f}s rows={n}")

    # r5b: the two video containers are per-row mapInPandas codec
    # work (encode->mux->demux->decode per doc) — embarrassingly
    # parallel, wall tracks row count; probe with the registry
    # recipes over the replicated doc_id space
    from lakehouse_to_rag_spark.plans import registry as _reg

    for name in ("avi_frame_stats", "mp4_frame_stats"):
        fn = _reg.QUERIES[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        print(f"{name}@sf: {time.perf_counter() - t0:.1f}s rows={n}")

    # r6: perceptual dedup — decode+hash is one Arrow pass (linear),
    # the banded join moves 8-byte signatures only; replica cliques
    # make every identity a FACTOR-clique of exact hash matches, so
    # the PAIR OUTPUT grows quadratically while candidate generation
    # must stay banded (wall ~linear + output cost)
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    import pandas as pd

    from lakehouse_to_rag_spark.multimodal.ops import encode_png, encode_wav
    from lakehouse_to_rag_spark.multimodal.phash import (
        synth_am_waveform,
        synth_gradient_image,
    )
    from lakehouse_to_rag_spark.operators.dedup import (
        audio_fingerprint_pairs,
        image_hash_pairs,
    )

    pay_schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )

    def _img(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["id"]]
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [encode_png(synth_gradient_image(i)) for i in ids],
            })

    n_media = 500 * factor
    imgs = spark.range(n_media).repartition(32).mapInPandas(_img, schema=pay_schema)
    t0 = time.perf_counter()
    n = image_hash_pairs(imgs, method="phash", max_hamming=6).count()
    print(f"image_hash_pairs({n_media}): {time.perf_counter() - t0:.1f}s pairs={n}")

    def _aud(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["id"]]
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [encode_wav(synth_am_waveform(i)) for i in ids],
            })

    auds = spark.range(n_media).repartition(32).mapInPandas(_aud, schema=pay_schema)
    t0 = time.perf_counter()
    n = audio_fingerprint_pairs(auds, max_hamming=8).count()
    print(f"audio_fingerprint_pairs({n_media}): {time.perf_counter() - t0:.1f}s pairs={n}")

    # r6: unigram-LM — trainer is sample-bounded (invariant to corpus
    # size); the Viterbi encoder is the scaling path (memoized Arrow)
    from lakehouse_to_rag_spark.functions.unigram import (
        unigram_encode,
        unigram_train,
    )

    logp = unigram_train(docs, sample_rows=500, max_multi=200, em_iters=2)
    t0 = time.perf_counter()
    n = unigram_encode(docs, logp).count()
    print(f"unigram_encode: {time.perf_counter() - t0:.1f}s rows={n}")

    # r6: the 8-stage curation capstone at the probe's sf dir — its
    # replicated-corpus story is its parts (line_dedup / gopher /
    # jaccard each probed above; stage 1 collapses replica cliques,
    # so downstream stages see ~base cardinality regardless of
    # duplication structure)
    t0 = time.perf_counter()
    n = _reg.QUERIES["pretrain_corpus_full"](spark, sf_dir).count()
    print(f"pretrain_corpus_full@sf: {time.perf_counter() - t0:.1f}s rows={n}")

    # r6b: star CC — round count must stay O(log^2 n) regardless of
    # component shape; probe the two adversarial shapes at once: a
    # FACTOR*4096-node path (diameter = n-1, the min-label killer)
    # unioned with a FACTOR*1000-leaf hub (degree skew)
    from lakehouse_to_rag_spark.operators.graph import (
        connected_components_star,
    )

    n_path, n_hub = 4096 * factor, 1000 * factor
    chain = spark.range(n_path - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    hub = spark.range(n_hub).select(
        (F.lit(10_000_000) + 0).alias("id_a"),
        (F.lit(10_000_000) + 1 + F.col("id")).alias("id_b"),
    )
    st: dict = {}
    t0 = time.perf_counter()
    n = connected_components_star(chain.unionByName(hub), stats=st).count()
    print(
        f"star_cc(path {n_path} + hub {n_hub}): "
        f"{time.perf_counter() - t0:.1f}s rounds={st['rounds']} labels={n}"
    )

    # r6b: the composed RAG read path — stages 2-3 are the broadcast
    # kNN/BM25 shapes (linear in corpus per query), stages 4-7 touch
    # only queries x candidates rows; wall must track the store scan
    from lakehouse_to_rag_spark.operators.retrieval import rag_read_path

    t0 = time.perf_counter()
    n = rag_read_path(
        docs, emb, query_ids=[0, 1, 2], candidates=10, kc=8, k=4
    ).count()
    print(f"rag_read_path(3q): {time.perf_counter() - t0:.1f}s rows={n}")

    # r6b: binary ANN — a 1-bit/dim XOR+popcount codegen scan; wall
    # must track corpus size linearly with the smallest constant in
    # the ANN family (the rerank join touches queries x rerank rows)
    from lakehouse_to_rag_spark.operators.similarity import knn_binary_rerank

    t0 = time.perf_counter()
    n = knn_binary_rerank(
        emb, emb.filter(F.col("vec_id") < 10), dim=64, k=5, rerank=50
    ).count()
    print(f"knn_binary_rerank(10q): {time.perf_counter() - t0:.1f}s rows={n}")

    # r6b: binary IVF — the nprobe-pruned Hamming scan; wall should
    # track (probed fraction x corpus), the assignment scan is linear
    from lakehouse_to_rag_spark.operators.similarity import knn_binary_ivf

    t0 = time.perf_counter()
    n = knn_binary_ivf(
        emb, emb.filter(F.col("vec_id") < 10), dim=64, k=5,
        num_centroids=16, nprobe=4,
    ).count()
    print(f"knn_binary_ivf(10q,4/16): {time.perf_counter() - t0:.1f}s rows={n}")

    # r6b: integer-micro PageRank over the GEMM-built kNN graph —
    # graph build is the GEMM (linear scans x queries), the 10 rounds
    # are join+groupBy over an n-row score table
    from lakehouse_to_rag_spark.operators.graph import pagerank_micro
    from lakehouse_to_rag_spark.operators.similarity import (
        knn_bruteforce_numpy,
    )

    t0 = time.perf_counter()
    edges = knn_bruteforce_numpy(
        emb, emb, k=5, id_col="vec_id", vec_col="embedding"
    ).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    n = pagerank_micro(edges, damping_pct=85, iterations=10).count()
    print(f"doc_pagerank_shape: {time.perf_counter() - t0:.1f}s rows={n}")

    spark.stop()


# ------------------------------------------------------ exponent mode

# Heaviest bench rows that scale with documents/events/embeddings
# (BENCH_r10 p50 order, write-path capstones included — their file
# I/O scales with the corpus too). TPC-H rows are excluded: their
# tables are not replicated, so their exponent is 0 by construction.
EXPONENT_DEFAULT_ENTRIES = [
    "winnow_matches_topm_auto",
    # doc_pagerank deliberately ABSENT: its registry entry pins the
    # exact all-pairs edge build (cutover_rows=maxsize, the
    # oracle-replayable gate form) — quadratic BY DESIGN, so probing
    # it at 10x is 100x work that measures the pin, not the
    # production path; knn_self_ivf IS that production graph path
    "knn_self_ivf",
    "bm25_served_incremental",
    "rag_index_manifest",
    "rag_read_path_served",
    "chunk_refresh_plan",
    "cdc_chunks",
    "dedup_keep_best",
    "dedup_minhash_distinct",
    "dedup_ngram_containment_auto",
]

_REPLICATED = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # shift user_id too: replicating events under ONE user id set
    # would multiply per-user window sizes (a skew change, not a
    # scale change) — id-shifted replicas keep per-key cardinality
    # and grow the key space, which is what corpus growth does
    "events": ["event_id", "user_id"],
}


def build_replica_dir(spark, sf_dir: str, factor: int, out_dir: str) -> None:
    """Materialize a catalog dir with documents/events/embeddings
    replicated ``factor`` times (ids shifted per replica) and every
    other table copied verbatim, so registry entries — which take
    (spark, sf_dir) — run against it unchanged."""
    import shutil

    from lakehouse_to_rag_spark.sources.tables import TABLES

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        src = Path(sf_dir) / f"{t}.parquet"
        dst = out / f"{t}.parquet"
        if t in _REPLICATED:
            df = load_table(spark, sf_dir, t)
            k = F.explode(
                F.sequence(F.lit(0), F.lit(factor - 1))
            ).alias("_k")
            rep = df.select("*", k)
            for c in _REPLICATED[t]:
                rep = rep.withColumn(
                    c, F.col(c) + F.col("_k") * F.lit(ID_STRIDE)
                )
            rep.drop("_k").repartition(32).write.mode("overwrite").parquet(
                str(dst)
            )
        else:
            # unconditional copy: an exists() skip kept tables from a
            # PREVIOUS sf_dir when the probe was re-pointed, silently
            # producing a mixed-scale catalog (r11 self-review).
            # A stale Spark-written DIRECTORY at dst (earlier run with
            # a different _REPLICATED set) would make copyfile raise
            # IsADirectoryError — remove whatever is there first
            # (ADVICE r11), mirroring the overwrite semantics of the
            # replicated branch.
            if dst.is_dir():
                shutil.rmtree(dst)
            elif dst.exists():
                dst.unlink()
            shutil.copyfile(src, dst)


def exponent_main(argv: list[str]) -> None:
    import math

    from lakehouse_to_rag_spark.plans import registry as _reg

    factor = int(argv[0]) if argv else 10
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    entries = argv[2:] or EXPONENT_DEFAULT_ENTRIES
    spark = get_spark("scale-exponent")
    spark.sparkContext.setLogLevel("ERROR")

    # dirs keyed by SOURCE sf name as well as factor, so re-pointing
    # the probe at another sf_dir can never reuse the wrong replicas
    base = Path(__file__).resolve().parent.parent / ".tmp" / "scale_probe"
    tag = Path(sf_dir.rstrip("/")).name
    dirs = {}
    for f in (1, factor):
        d = str(base / f"{tag}_x{f}")
        build_replica_dir(spark, sf_dir, f, d)
        dirs[f] = d
    print(f"# exponent probe: factor={factor}, sf={sf_dir}")

    def _time(name: str, d: str) -> float:
        best = math.inf
        for _ in range(2):  # min-of-2: drop plan build / JIT warmup
            t0 = time.perf_counter()
            _reg.QUERIES[name](spark, d).count()
            best = min(best, time.perf_counter() - t0)
        return best

    for name in entries:
        if name not in _reg.QUERIES:
            print(f"{name}: UNKNOWN entry")
            continue
        try:
            t1 = _time(name, dirs[1])
            tn = _time(name, dirs[factor])
            e = math.log(tn / t1) / math.log(factor)
            print(
                f"{name}: t1={t1:.2f}s t{factor}={tn:.2f}s "
                f"exponent={e:.2f}"
            )
        except Exception as exc:  # noqa: BLE001 - report, keep probing
            print(f"{name}: ERR {str(exc)[:120]}")
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "exponent":
        exponent_main(sys.argv[2:])
    else:
        main()
