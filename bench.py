#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from lakehouse_to_rag_spark.session import get_spark  # noqa: E402
from lakehouse_to_rag_spark.plans.registry import QUERIES  # noqa: E402

# BENCH ROW POLICY (r10 — VERDICT r9 task 6). At 107 rows the driver's
# interleaved passes inflated p50s up to 5x over standalone mins
# (cdc_chunks 17.0 s driver vs 3.1 s standalone, r9), so HEADLINE
# membership is now budgeted, not append-only:
#   1. Every operator FAMILY keeps at least one row; a family's row is
#      never retired while it is the family's only perf signal.
#   2. Oracle/production HASH TWINS (md5 vs xxhash64 — identical plan,
#      different gram hash) bench side-by-side for ONE round to put
#      the ratio on record, then only the PRODUCTION (xx) row stays;
#      the md5 twin's cost is derivable from the recorded ratio.
#   3. Variant forms sharing the whole plan except one stage keep one
#      row (the winnow_matches/topm precedent, r9) — the kept row is
#      the production parameterization.
#   4. Budget: ~110 rows / ~12 min driver wall at sf0.1. Past it,
#      retire in order: hash-twin duplicates (rule 2), then covered
#      variants (rule 3) — never a family's last row. Record every
#      retirement as a comment at its old position with the final
#      recorded numbers, so BENCH files stay interpretable.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q4_order_priority",
    "word_freq_top10",
    "silver_docs",
    "gold_chunks_recursive",
    "events_hourly",
    "events_sessionize",
    "dedup_exact_groups",
    # dedup_ngram_jaccard (uncapped pin) replaced r10 by the library-
    # default auto-capped form under policy rule 3 (same plan + one
    # window filter; r10 standalone sf0.1 mins 1.76 s uncapped vs
    # 1.66 s auto — the harness corpus has no >cap shingles, so the
    # forms differ only at the planted-boilerplate probe scale)
    "dedup_ngram_jaccard_auto",
    "dedup_minhash",
    "dedup_embedding",
    "knn_bruteforce",
    "lang_id",
    "token_counts",
    "events_asof_join",
    "events_session_range_join",
    "events_multi_rollup",
    "knn_bruteforce_numpy",
    "dedup_simhash",
    "events_value_percentiles",
    "dedup_tf_cosine",
    "q15_top_supplier",
    # round-2 corpus-assembly additions
    "sequence_pack",
    "quality_prune",
    "bloom_decontaminate",
    "domain_mix",
    "training_shuffle",
    "dedup_incremental",
    "knn_int8",
    "bigram_lm_scores",
    # round-3 additions: IVF probe + curation hot path + span removal
    # + the three oracle-gated real media codecs
    "knn_ivf",
    "knn_pq",
    "tokenize_to_ids",
    "remove_duplicate_spans",
    "png_pixel_stats",
    "wav_audio_stats",
    "temperature_mix",
    "trigram_backoff_scores",
    # CCNet head/middle/tail cut over the trigram scores (adds the
    # distributed two-phase global rank on top)
    "perplexity_buckets",
    # round-4 additions: every remaining operator family gets a perf
    # row — trained ANN (coarse k-means + PQ residuals), the replayable
    # Lloyd-trained IVF, subword tokenization, the prefix-filtered
    # Jaccard twin, and the GIF leg of the media set. Note on
    # gif_frame_stats: its time is dominated by the pure-Python LZW
    # codec (sequential per payload, ~12M pixels at sf0.1) — compare
    # it round-over-round, not against JVM-side query rows.
    "knn_ivfpq",
    "knn_ivf_kmeans",
    # 1-bit sign quantization + exact rerank: the ANN memory floor
    # (XOR+popcount codegen scan)
    "knn_binary_rerank",
    "bpe_token_counts",
    "dedup_ngram_jaccard_prefix",
    "gif_frame_stats",
    "jpeg_pixel_stats",
    "bm25_retrieval",
    "hybrid_retrieval_rrf",
    "dsir_select",
    "semdedup",
    "nb_quality_filter",
    "line_dedup",
    # round-5 additions: the FLAC leg of the media set (pure-Python
    # bit-level codec like GIF's LZW — compare round-over-round) and
    # the two named web-corpus filters (JVM-side array lambdas)
    "flac_audio_stats",
    "gopher_quality",
    "c4_line_filter",
    "prototype_scores",
    "kcenter_select",
    "pretrain_pipeline",
    "compression_ratio",
    "blocklist_filter",
    # spectral model training: one-pass exact-int64 covariance +
    # driver-side sharpened power iteration + map-only projection
    "embedding_pca",
    # train-free JL projection: the map-only floor any reducer
    # should beat before earning its training pass
    "embedding_rp",
    # diversity-aware retrieval tail: kNN candidates + greedy MMR
    "mmr_rerank",
    # round-6 additions: the full production curation chain (8 fused
    # stages), the ANN-backed hybrid retrieval path, and perceptual
    # image dedup (PNG round-trip + pHash + banded Hamming join)
    "pretrain_corpus_full",
    "hybrid_retrieval_ivf",
    "image_phash_dedup",
    "audio_fingerprint_dedup",
    "image_dedup_incremental",
    # unigram-LM (SentencePiece-style) tokenizer: sample-trained
    # hard-EM, distributed Viterbi encode
    "unigram_token_counts",
    # WordPiece greedy longest-match encode (the BERT tokenizer),
    # completing the tokenizer triple
    "wordpiece_token_counts",
    # the serving-side capstone: BM25 + kNN -> RRF -> min-max rel ->
    # greedy MMR -> metadata join, one composed plan
    "rag_read_path",
    # the release datasheet: per-source counts/tokens/median/dups
    "corpus_datacard",
    # video leg: JPEG encode -> AVI mux -> demux -> JPEG decode per
    # doc (pure-Python entropy coding like GIF/FLAC — compare
    # round-over-round)
    "avi_frame_stats",
    # mp4_frame_stats (the ISO-BMFF twin — sample tables instead of
    # RIFF chunks, same JPEG codec core per payload) retired r13 under
    # policy rule 3 (VERDICT r12 task 8): final recorded numbers
    # r12 min 1.035 s vs avi_frame_stats 0.972 s (ratio ~1.06x on
    # record since r6 — the container demux is a rounding error on the
    # shared entropy-coding cost). The mp4 form stays fully
    # oracle-gated in the registry rotation; only its bench row
    # retires — avi keeps the video family's row.
    # round-7 additions: the round-6b tail that was gated but never
    # benched — the exact-dedup-first MinHash twin (crawl-shaped
    # corpora), the all-integer Hamming IVF, link-graph centrality,
    # and both halves of the persisted-index RAG story (write-side
    # manifest build, read-side serve from the persisted layouts)
    "dedup_minhash_distinct",
    "knn_binary_ivf",
    "doc_pagerank",
    "rag_read_path_served",
    "rag_index_manifest",
    # r7: data-dispatched MinHash (probe + winning form) and the
    # maintained-mode medallion (4 batches of keyed upserts incl. a
    # rejected re-crawl wave — a WRITE-path row like rag_index_manifest)
    "dedup_minhash_auto",
    "medallion_incremental",
    # r8: the round-7 tail that was gated but never benched (the gap
    # VERDICT r7 flagged), plus winnowing's xxhash64 production form
    # benched side-by-side with its md5 oracle twin, and the
    # broadcast-free self-kNN that de-quadratized doc_pagerank
    # winnow_fingerprints (md5 oracle twin) retired r10 under policy
    # rule 2 after two recorded side-by-side rounds (r8 4.26 s / r9
    # 4.59 s vs the xx production row's 2.89 / 3.09 — ratio ~1.5x on
    # record); the md5 form stays fully oracle-gated in the registry
    # rotation
    "winnow_fingerprints_xx",
    # winnow_matches itself left the list in r9: it and the bounded
    # topm form below share the whole candidate/aggregate plan and
    # differ only in the final window, so benching both paid ~50s/pass
    # twice for one signal (r8 p50 31.0s / r9 min 24.8s on record);
    # topm is the production report form and keeps the family's row
    "token_budget_select",
    "decontaminate_fuzzy",
    "bm25_served_incremental",
    "knn_self_ivf",
    # the embedding rung of the decontamination family (map-only GEMM)
    "decontaminate_semantic",
    # content-root split: one fingerprint groupBy + join
    "leakage_safe_split",
    # cross-source vocabulary matrix: distinct-reduce + bounded join
    "source_vocab_overlap",
    # winnow_matches_topm (static fraction-of-corpus cap) retired r11
    # under policy rule 3 after the one mandated side-by-side round:
    # r10 driver p50 34.7 s static vs 5.1 s for the auto-capped form
    # below (ratio ~6.8x on record in BENCH_r10 + SCALE.md); the
    # static parameterization stays fully oracle-gated in the registry
    # rotation (it is the cap-parameter-stability gate), only its
    # bench row retires — the auto form is the production report and
    # keeps the family's row
    # r10: the bounded MOSS report under the adaptive
    # fraction-of-corpus cap (max_fp_df="auto"), externally gated with
    # a SQL-derived cap oracle
    "winnow_matches_topm_auto",
    # r9 family additions: SCD2 dimension build (one exchange, two
    # window passes inside it), content-defined chunking (per-row JVM
    # array lambdas), hard-negative mining (label-masked GEMM), and
    # per-source quality calibration (window rank / quantile forms)
    "scd2_user_type",
    "cdc_chunks",
    "knn_hard_negatives",
    "quality_calibrated_select",
    # r9: SCD2 interval enrichment, CDF snapshot diff, deterministic
    # hash-rank sampling (TakeOrdered shape)
    "scd2_enrich_events",
    "events_snapshot_diff",
    "docs_uniform_sample",
    "scd2_user_type_snapshots",
    "events_sessionize_capped",
    "embedding_diversity",
    "scd2_incremental",
    # r10: tombstone SCD2 (absence closes the interval) — broadcast
    # grid array + one key exchange carrying three window passes
    "scd2_snapshots_deletes",
    "chunk_refresh_plan",
    "events_asof_nearest",
    # dedup_ngram_containment (uncapped pin) replaced r10 by the
    # library-default auto-capped form under policy rule 3 (r9 driver
    # row 2.5 s; r10 uncontended bench 2.17 s — the harness corpus has
    # no >cap shingles so the forms coincide here; they diverge on the
    # planted-boilerplate probe corpus)
    "dedup_ngram_containment_auto",
    # r10 curation additions: quality-aware dedup survivor (components
    # + one window), shingle novelty (one shingle exchange + id
    # groupBy), corpus-relative OOV rate (TakeOrdered vocab broadcast)
    "dedup_keep_best",
    "shingle_novelty",
    "docs_oov_rate",
    # r10: IR evaluation metrics (recall/MRR/nDCG at k) — one query
    # exchange + bounded per-query rank lists
    "retrieval_eval_metrics",
    # r10 continuation: map-only run-length-fold entropy (a NEW perf
    # shape — the per-row aggregate fold with zero exchanges) and the
    # two-token-exchange PMI collocation report. source_overlap_matrix
    # stays un-rowed under policy rule 3: its plan is dedup_minhash's
    # banded join + an O(|pairs|) tail, already covered by that row.
    "docs_char_entropy",
    "docs_bigram_pmi",
    # r12: the training-shard capstone's assignment plan — a NEW perf
    # shape (two-phase global cumsum: range exchange -> pid-pinned
    # checkpoint -> per-partition window + broadcast prefix offsets).
    # The write half (write_training_shards) is file I/O over this
    # same plan + one partitioned write; not separately rowed (the
    # medallion_incremental precedent for write-path capstones).
    # dedup_jaccard_auto_unit / dedup_minhash_auto_unit stay un-rowed
    # under policy rule 3: their plans are the word+char single-unit
    # plans (both already rowed) behind one row predicate.
    "training_shards_assign",
    # orders_monthly_spine_recursive stays out: Spark executes
    # WITH RECURSIVE one job per iteration (~0.19 s × 80 months =
    # ~15 s of pure scheduling floor regardless of data size); the
    # performant gap-fill shape is the sequence()-based
    # events_hourly_gapfilled already benched via the registry
]


def _prior_mins(sf: float) -> dict[str, float]:
    """Per-query min timings from the most recent recorded BENCH
    round, used only to decide which entries get an untimed warm-up
    pass (see below). Missing file / missing entry => warm up (the
    conservative default for never-benched queries).

    Recovery of recorded BENCH_r*.json files is delegated to
    tools/bench_record.py (r13 — VERDICT r12 task 1: the r12 tail
    started inside the new queries_spread section and the old
    unanchored fallback parsed noise ratios as timings; the shared
    recovery prefers the compact names_v/mins_csv trailer, accepts a
    sidecar ``<stem>.mins.json``, and REFUSES ambiguous legacy tails
    instead of guessing). Since r12 the script also writes its own
    COMPLETE per-query record to ``.bench_last.json`` at the end of
    every run and prefers it here: the r12 run found the driver tail
    truncated past 67 of 114 rows, which silently re-classified 47
    long-benched entries as never-benched and re-warmed them (~2 min
    of wasted driver wall). The recorded-file overlay makes warm-up
    selection immune to tail truncation; BENCH_r*.json parsing stays
    as the fallback for a fresh checkout."""
    from tools.bench_record import load_bench_file

    latest: dict[str, float] = {}
    for f in sorted(Path(__file__).resolve().parent.glob("BENCH_r*.json")):
        if f.name.endswith(".mins.json"):
            continue  # sidecars are read via their main record
        try:
            rec = load_bench_file(f)
        except (OSError, ValueError):
            continue
        # driver records are sf0.1: applying them as priors at another
        # scale is only CONSERVATIVE in one direction (extra warm-ups
        # at smaller sf) but wrong at a larger one — skip any record
        # whose recovered sf is known and differs (r13, the per-sf
        # record discipline; unrecoverable-sf legacy records keep the
        # old behavior)
        if rec.get("sf") is not None and float(rec["sf"]) != sf:
            continue
        q = rec.get("queries")
        if q:
            latest = {k: float(v) for k, v in q.items()}
    own = Path(__file__).resolve().parent / ".bench_last.json"
    try:
        rec = json.loads(own.read_text())
        # PER-SF slots (r13): the record used to be a single
        # {sf, queries} slot, so a local sf0.01 iteration run (the
        # /verify bench leg) silently CLOBBERED the sf0.1 record the
        # driver's warm-up selection depends on — the sf guard kept
        # the wrong-scale record from poisoning the priors, but the
        # right-scale record was gone and every long-benched entry
        # re-warmed (the exact ~2 min regression the r12 note below
        # documents). Now each scale factor keeps its own slot under
        # "by_sf"; both legacy forms are still read.
        if "by_sf" in rec:
            q = rec["by_sf"].get(_sf_key(sf))
            if q:
                latest.update({k: float(v) for k, v in q.items()})
        elif "queries" in rec:
            if float(rec.get("sf", -1)) == sf:
                latest.update(
                    {k: float(v) for k, v in rec["queries"].items()}
                )
        elif sf == 0.1:  # pre-r12 flat record: sf0.1 by convention
            latest.update({k: float(v) for k, v in rec.items()})
    except (OSError, ValueError, AttributeError, TypeError):
        pass  # no own record yet: BENCH_r*.json parsing stands alone
    return latest


def _sf_key(sf: float) -> str:
    """Canonical string key for a scale factor ('0.1', '0.01') —
    repr-stable across json round-trips."""
    return format(sf, "g")


def _merge_own_record(own: Path, sf: float, timings: dict) -> None:
    """Read-modify-write of .bench_last.json's per-sf slot: other
    scales' records survive this run (r13 — see _prior_mins). All
    three historical record forms are read, never discarded: the
    per-sf form, the r12 {sf, queries} single slot, and the pre-r12
    flat record (sf0.1's by the same convention _prior_mins reads it
    under — dropping it would re-lose the sf0.1 priors on the next
    cross-scale run, the regression this RMW exists to fix)."""
    by_sf: dict = {}
    try:
        old = json.loads(own.read_text())
        if "by_sf" in old:
            by_sf = old["by_sf"]
        elif "queries" in old and "sf" in old:  # r12 single slot
            by_sf = {_sf_key(float(old["sf"])): old["queries"]}
        elif isinstance(old, dict) and old:  # pre-r12 flat record
            by_sf = {"0.1": old}
    except (OSError, ValueError, AttributeError, TypeError, KeyError):
        pass
    by_sf[_sf_key(sf)] = timings
    own.write_text(json.dumps({"by_sf": by_sf}))


def _calibrate_py() -> float:
    """Fixed-work single-core Python figure (min of 3): cross-round
    comparisons of the recorded BENCH_rN.json files divide by this to
    remove host-speed drift — VERDICT r5 found a ~1.25x UNIFORM
    inflation across untouched queries that only a same-machine A/B
    could attribute to the host; this bakes that control into every
    artifact. The loop is deterministic (checksum asserted) so the
    work is identical in every round."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for i in range(10_000_000):
            acc = (acc + i * 2654435761) & 0xFFFFFFFF
        best = min(best, time.perf_counter() - t0)
        assert acc == 122804416, "calibration checksum drift"
    return round(best, 3)


def _calibrate_jvm(spark) -> float:
    """Fixed-work JVM-side figure: a constant-size range aggregate
    that never touches the SF tables, so it measures the same work
    every round regardless of data.

    Run to JIT STEADY STATE, not min-of-3 (r12): the figure keeps
    improving across repeats as C2 compilation tiers land (measured
    in one idle session: 0.64, 0.27, 0.28, 0.22, 0.20, 0.19, 0.19,
    0.16, 0.16, 0.16 s), so a min-of-3 records wherever the ramp
    happened to be — r11 recorded 0.268 and r12's re-run 0.168 on
    the same host, a 60% phantom "drift" that poisoned every
    calib-normalized cross-round comparison. Iterate (up to 25, never
    fewer than 15 — the ramp has a plateau before the final C2 tier
    lands, see the inline comment) until the last FOUR runs sit
    within 3% of the running min, then report that min: the
    steady-state figure is the host's, not the ramp's. (ADVICE r12:
    this docstring previously described an older 12-run/5%/3-run rule
    — the constants here are the implemented ones.)"""
    runs: list[float] = []
    for _ in range(25):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr(
            "sum(id * 2 + 1) AS s"
        ).collect()
        runs.append(time.perf_counter() - t0)
        # converged when four consecutive runs stop improving on the
        # running min by more than 3% — but never before 15 runs: the
        # ramp has a PLATEAU (~0.12 s for several runs) before the
        # final tier lands (~0.09 s), and any convergence test exits
        # on the plateau (measured: 5%/3 exited at 0.126, 3%/4 at
        # 0.125, both on sessions that reach 0.092). Total cost a few
        # seconds, paid once per bench run.
        if len(runs) >= 15 and all(
            r <= min(runs) * 1.03 for r in runs[-4:]
        ):
            break
    return round(min(runs), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    calib_py = _calibrate_py()
    spark = get_spark("lakehouse-to-rag-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on a trivial action so the first timed query
    # doesn't pay session startup
    spark.range(1000).selectExpr("sum(id)").collect()
    calib_jvm = _calibrate_jvm(spark)

    # UNTIMED warm-up before the timed passes: profiling shows the
    # first execution of the pandas-UDF queries pays a large one-off
    # cost (Python worker pool spin-up + Arrow serializer init:
    # dedup_tf_cosine 12.0 s first run vs 2.4-3.1 s for every later
    # run, dedup_embedding 3.5 s vs 0.7 s; measured flat after run 1,
    # so it is warm-up, not variance). Without it that one-off cost
    # lands in pass 1 and drags p50. Since r8 the per-query warm-up is
    # SELECTIVE (the bench wall was creeping toward the driver budget
    # as HEADLINE grew): one synthetic mapInPandas action spins the
    # shared Python worker pool + Arrow path globally, then only
    # queries whose last recorded min was >= 1 s (or never benched)
    # get an individual warm-up run — a sub-second JVM query has no
    # per-query one-off cost left once the pool is warm.
    spark.range(100_000).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    prior = _prior_mins(sf)
    # Name-drift guard: a RENAMED entry has no recorded min anywhere,
    # so it silently re-enters the always-warm class (one extra full
    # run) — fine for genuinely new entries, but worth a visible line
    # so a rename that was meant to keep its history is caught.
    never_benched = [n for n in HEADLINE if n not in prior]
    if never_benched and prior:
        print(
            f"# warm-up: {len(never_benched)} HEADLINE name(s) with no "
            f"recorded min (new or renamed): {never_benched}",
            file=sys.stderr,
        )
    for name in HEADLINE:
        if prior.get(name, 99.0) >= 1.0:
            QUERIES[name](spark, sf_dir).count()
    spark.catalog.clearCache()

    # 3 interleaved passes over the whole list, min per query: the
    # harness VM shows host-level degradation WINDOWS lasting minutes
    # (the same query measures 1.5 s and 28.5 s across bench runs with
    # an idle system, no full GCs, no CPU throttling — measured).
    # Back-to-back repeats of one query all land inside a window;
    # whole-list passes put each query's repeats minutes apart, so a
    # window poisons at most one pass of each query, never its min.
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    rowcounts: dict[str, int] = {}
    for _ in range(3):
        for name in HEADLINE:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            rowcounts[name] = df.count()
            samples[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    # SMALL-ROW STABILIZATION (r12 — VERDICT r11 task 6): sub-1.5 s
    # rows swing +-20-35% round-to-round under interleaved contention
    # (r11: the scd2 family, jpeg_pixel_stats — all noise, each
    # costing attribution time every round). Rows whose measured min
    # is < 1.5 s get TWO extra interleaved passes (min of 5, not 3):
    # cheap by definition (~2x the sum of sub-1.5 s mins), and the
    # deeper min cuts the sampling tail that produced the swings.
    small = [n for n in HEADLINE if min(samples[n]) < 1.5]
    for _ in range(2):
        for name in small:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            samples[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    # min is the noise-floor signal (see window rationale above);
    # median is reported alongside so a regression cannot hide behind
    # one lucky pass (round-over-round comparability). The per-row
    # SPREAD (p50/min - 1) is the mechanical noise gauge (r12): a
    # round-over-round delta within a row's spread band is
    # contention, not signal — regression claims need the spread's
    # support before anyone burns attribution time.
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        runs = sorted(samples[name])
        timings[name] = round(runs[0], 3)
        medians[name] = round(runs[len(runs) // 2], 3)
        spreads[name] = round(
            medians[name] / timings[name] - 1.0 if timings[name] else 0.0, 3
        )
        print(
            f"# {name}: min={timings[name]:.3f}s p50={medians[name]:.3f}s "
            f"spread={spreads[name]:.3f} n={len(runs)} "
            f"rows={rowcounts[name]}",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    # the complete per-query record _prior_mins prefers next run (the
    # driver wrapper truncates its recorded tail; this file does not).
    _merge_own_record(
        Path(__file__).resolve().parent / ".bench_last.json", sf, timings
    )
    # Self-sufficient driver artifact (r13 — VERDICT r12 task 1): the
    # driver records only the LAST 2000 chars of this line, and the
    # full named queries dict is ~3.2 KB at 114 rows — it can never
    # fit. So the line ENDS with the mins as a compact values-only CSV
    # in HEADLINE order (~700 chars, always inside the tail window)
    # plus the version of the committed name registry
    # (tools/bench_names.json) that decodes it. Key order is load-
    # bearing: names_v/mins_csv must stay LAST.
    from tools.bench_record import ensure_names_version

    names_v = ensure_names_version(HEADLINE)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_p50": medians,
                # per-row relative spread (p50/min - 1): the noise
                # band a cross-round delta must clear to count as
                # signal; sub-1.5 s rows carry 5 samples (see above)
                "queries_spread": spreads,
                "value_p50": round(sum(medians.values()), 3),
                "sf": sf,
                # host-speed normalizers: divide cross-round totals by
                # the ratio of these figures before comparing rounds
                # (BASELINE.md "Bench calibration")
                "calib": {
                    "py_spin_sec": calib_py,
                    "jvm_fixed_sec": calib_jvm,
                },
                "names_v": names_v,
                "mins_csv": ",".join(
                    f"{timings[n]:.3f}" for n in HEADLINE
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
