"""Unigram-LM subword tokenizer (SentencePiece-style, Kudo 2018):
the BPE twin most modern pipelines train instead of or alongside
merges — a piece VOCABULARY with probabilities, segmented by Viterbi
(best-scoring split) rather than greedy merges.

Deterministic hard-EM variant, engineered for exact SQL replay (the
same playbook as functions/bpe.py's 200-step oracle):

- SEED: all single characters of the sample words, plus the top
  ``max_multi`` substrings of length 2..``max_piece_len`` ranked by
  frequency-weighted occurrence count (ties lexicographic). Seed
  probabilities are occurrence-count MLE.
- EM (``em_iters`` rounds): the E-step is VITERBI (hard EM) — each
  sample word's single best segmentation under the current piece
  log-probabilities; the M-step recounts pieces over those paths
  with +1 Laplace smoothing (every vocab piece stays alive, so the
  encoder can never strand a sample-covered character).
- ENCODE: Viterbi with the final probabilities; characters outside
  the vocab advance one position at the fixed ``UNK_MICRO`` penalty
  (guaranteed segmentability on unseen corpus text).

Exactness anchors (why two engines agree bit-for-bit):
- log-probs quantize to INTEGER MICRO-UNITS: floor(ln(cnt/total)*1e6
  + 0.5) over exact integer counts — path scores are exact BIGINT
  sums.
- the per-cell DP winner is a TOTAL order: (score DESC, n_tokens
  ASC, path-string ASC), so ties cannot diverge.
- words are chunked to ``max_word_len`` characters before
  segmentation (each chunk independent) so the DP has a static
  position bound — the unrolled-CTE form of the oracle.
- U+001F is the oracle's path separator and is stripped from text on
  both sides (the BPE module's enforced-delimiter contract).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ONE copy of the WS_CLASS split + chr(31)-strip delimiter contract:
# bpe.py owns it, both tokenizers share it, and both SQL oracles
# replay it — a second hand-synced copy here would be exactly the
# silent-divergence class the round-6 BPE fix closed.
from lakehouse_to_rag_spark.functions.bpe import _split_ws

UNK_MICRO = -30_000_000
SEP = "\x1f"


def _chunks(word: str, max_word_len: int) -> list[str]:
    return [
        word[i : i + max_word_len]
        for i in range(0, len(word), max_word_len)
    ]


def _viterbi(
    word: str, logp: dict[str, int], max_piece_len: int
) -> tuple[int, int, str]:
    """Best segmentation of one (pre-chunked) word: returns
    (score_micro, n_tokens, path) with path = pieces joined by SEP.
    Candidates per cell: vocab pieces of length 1..max_piece_len
    ending at the cell, plus the UNK single-char fallback when the
    char is not itself a piece. Winner by (score DESC, n_tokens ASC,
    path ASC) — the total order the SQL replay uses."""
    n = len(word)
    # dp[j] = (score, ntok, path) best for prefix word[:j]
    dp: list[tuple[int, int, str]] = [(0, 0, "")] * (n + 1)
    for j in range(1, n + 1):
        best: tuple[int, int, str] | None = None
        for k in range(1, min(max_piece_len, j) + 1):
            piece = word[j - k : j]
            lp = logp.get(piece)
            if lp is None:
                if k == 1:
                    lp = UNK_MICRO  # fallback keeps every cell reachable
                else:
                    continue
            ps, pt, pp = dp[j - k]
            cand = (ps + lp, pt + 1, pp + SEP + piece if pp else piece)
            if (
                best is None
                or cand[0] > best[0]
                or (cand[0] == best[0] and cand[1] < best[1])
                or (
                    cand[0] == best[0]
                    and cand[1] == best[1]
                    and cand[2] < best[2]
                )
            ):
                best = cand
        dp[j] = best  # type: ignore[assignment]
    return dp[n]


def _logp_from_counts(counts: dict[str, int]) -> dict[str, int]:
    total = sum(counts.values())
    return {
        p: math.floor(math.log(c / total) * 1_000_000 + 0.5)
        for p, c in counts.items()
    }


def unigram_train(
    df: DataFrame,
    sample_rows: int = 500,
    max_piece_len: int = 4,
    max_multi: int = 200,
    em_iters: int = 2,
    max_word_len: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, int]:
    """Train on the first ``sample_rows`` docs by id; returns
    piece -> logp_micro. Bounded driver state (the tokenizer-family
    contract: the TRAINER sees a sample, the ENCODER scales)."""
    rows = (
        df.filter(F.col(text_col).isNotNull())
        .orderBy(F.col(id_col))
        .limit(sample_rows)
        .select(text_col)
        .collect()
    )
    word_freq: dict[str, int] = {}
    for r in rows:
        for w in _split_ws(r[0]):
            for c in _chunks(w, max_word_len):
                word_freq[c] = word_freq.get(c, 0) + 1

    # seed occurrence counts: every substring position, freq-weighted
    sub_counts: dict[str, int] = {}
    chars: set[str] = set()
    for w, f in word_freq.items():
        chars.update(w)
        for ln in range(1, max_piece_len + 1):
            for i in range(len(w) - ln + 1):
                s = w[i : i + ln]
                sub_counts[s] = sub_counts.get(s, 0) + f
    multi = sorted(
        (
            (p, c)
            for p, c in sub_counts.items()
            if len(p) >= 2 and c >= 2
        ),
        key=lambda pc: (-pc[1], pc[0]),
    )[:max_multi]
    vocab = {c: sub_counts[c] for c in chars}
    vocab.update(dict(multi))
    logp = _logp_from_counts(vocab)

    for _ in range(em_iters):
        counts = {p: 1 for p in vocab}  # Laplace: all pieces alive
        for w, f in word_freq.items():
            _, _, path = _viterbi(w, logp, max_piece_len)
            for piece in path.split(SEP):
                if piece in counts:
                    counts[piece] += f
                # UNK fallback chars outside vocab carry no count
        logp = _logp_from_counts(counts)
    return logp


def unigram_encode(
    df: DataFrame,
    logp: dict[str, int],
    max_piece_len: int = 4,
    max_word_len: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed Viterbi encode: (id, n_tokens). The logp table
    rides the closure; per-word memoization bounds per-batch cost by
    DISTINCT words (Zipf)."""
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_tokens", LongType()),
        ]
    )

    def _enc(batches):
        cache: dict[str, int] = {}

        def ntok(word: str) -> int:
            got = cache.get(word)
            if got is None:
                got = sum(
                    _viterbi(c, logp, max_piece_len)[1]
                    for c in _chunks(word, max_word_len)
                )
                cache[word] = got
            return got

        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                out.append(sum(ntok(w) for w in _split_ws(t or "")))
            yield pd.DataFrame({id_col: pdf[id_col], "n_tokens": out})

    return (
        df.filter(F.col(text_col).isNotNull())
        .select(id_col, text_col)
        .mapInPandas(_enc, schema=schema)
    )
