"""Byte-pair-encoding tokenizer: sample-trained merges, distributed
encode (SURVEY.md §2.13 token-counting north-star, upgraded from the
whitespace/regex estimators in operators/text_analysis.py to a real
subword vocabulary).

Training is the classic word-frequency BPE (Sennrich et al. 2016):
count whitespace words on a BOUNDED sample, then greedily merge the
most frequent adjacent symbol pair ``num_merges`` times. Like every
production tokenizer (GPT-2's BPE, SentencePiece) the TRAINER sees a
sample, never the corpus; what scales is the ENCODER, which ships as
(merge ranks, vocab ids) broadcast state inside an Arrow-batched UDF
with per-word memoization (Zipf: a few thousand distinct words cover
almost all tokens in a batch).

Determinism: no RNG anywhere — pair ties break lexicographically,
vocab ids are assigned (sorted base symbols, then merges in creation
order), so two runs — or two engines — produce identical ids.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"

# The package-wide cross-engine whitespace contract (functions.text.
# WS_CLASS): bare str.split() would also split on unicode whitespace
# (\x85,  , ...) that no SQL engine's \s or split includes — the
# same divergence class the round-5 self-review fixed at every JVM
# split site. Identical to str.split() on ASCII corpora.
_WS_RE = re.compile("[ \t\n\x0b\f\r]+")


def _split_ws(text: str) -> list[str]:
    # U+001F is the cross-engine symbol delimiter in the DuckDB
    # training/encode oracle (plans/registry.py _bpe_oracle); both
    # sides strip it from text before word splitting so the delimiter
    # assumption is enforced rather than assumed (a corpus containing
    # chr(31) would otherwise silently diverge — round-6 ADVICE fix).
    return [w for w in _WS_RE.split(text.replace("\x1f", "")) if w]


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    sample_rows: int = 16384,
    id_col: str = "doc_id",
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Train BPE merges on the first ``sample_rows`` documents by id.
    Returns (ordered merge list, symbol -> id vocabulary).

    Pair counts are maintained INCREMENTALLY: each merge touches only
    the words that actually contain the merged pair (tracked in an
    inverted pair -> words index), not the whole word dict — the
    classic O(sample_vocab x num_merges) full rescan becomes
    O(affected_words) per merge, which is why the default sample is
    16k docs rather than 4k. Merge order is bit-identical to the
    rescanning form: the argmax key (count, a, b) is a total order
    over pairs, so dict iteration order never matters."""
    rows = (
        df.filter(F.col(text_col).isNotNull())
        .orderBy(F.col(id_col))
        .limit(sample_rows)
        .select(text_col)
        .collect()
    )
    word_freq: dict[tuple[str, ...], int] = {}
    base: set[str] = {_EOW}
    for r in rows:
        for w in _split_ws(r[0]):
            key = tuple(w) + (_EOW,)
            word_freq[key] = word_freq.get(key, 0) + 1
            base.update(w)

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[tuple[str, ...]]] = {}
    for word, freq in word_freq.items():
        for p in zip(word, word[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + freq
            pair_words.setdefault(p, set()).add(word)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # max frequency, lexicographic tie-break: deterministic
        best = max(
            pair_counts.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1])
        )
        if best[1] < 2:  # nothing left worth merging
            break
        a, b = best[0]
        merged = a + b
        merges.append((a, b))
        # rewrite ONLY the words containing (a, b); a rewritten word
        # cannot itself still contain (a, b) (left-to-right replacement
        # consumes both symbols), so the snapshot list is stable
        for word in list(pair_words.get((a, b), ())):
            freq = word_freq.pop(word)
            for p in zip(word, word[1:]):
                c = pair_counts[p] - freq
                if c:
                    pair_counts[p] = c
                else:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(word)
                    if not ws:
                        del pair_words[p]
            out: list[str] = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new = tuple(out)
            word_freq[new] = word_freq.get(new, 0) + freq
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + freq
                pair_words.setdefault(p, set()).add(new)

    vocab: dict[str, int] = {}
    for i, sym in enumerate(sorted(base)):
        vocab[sym] = i + 1  # 0 is reserved for <unk>
    nxt = len(vocab) + 1
    for a, b in merges:
        sym = a + b
        if sym not in vocab:
            vocab[sym] = nxt
            nxt += 1
    return merges, vocab


def bpe_encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Encode one word to BPE symbols by repeatedly applying the
    best-ranked (earliest-trained) adjacent merge — the GPT-2 encode
    loop."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed encode: (id, token_ids array<int>, n_tokens). The
    merge table rides the task closure (broadcast by Spark's closure
    serializer — a few thousand pairs); per-word memoization makes the
    per-batch cost proportional to DISTINCT words, not words."""
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("token_ids", ArrayType(IntegerType())),
            StructField("n_tokens", LongType()),
        ]
    )

    def _enc(batches):
        cache: dict[str, list[int]] = {}

        def ids_for(word: str) -> list[int]:
            got = cache.get(word)
            if got is None:
                got = [
                    vocab.get(s, 0) for s in bpe_encode_word(word, ranks)
                ]
                cache[word] = got
            return got

        for pdf in batches:
            out_ids, out_n = [], []
            for t in pdf[text_col]:
                ids: list[int] = []
                for w in _split_ws(t or ""):
                    ids.extend(ids_for(w))
                out_ids.append(ids)
                out_n.append(len(ids))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "token_ids": out_ids,
                    "n_tokens": out_n,
                }
            )

    return (
        df.filter(F.col(text_col).isNotNull())
        .select(id_col, text_col)
        .mapInPandas(_enc, schema=schema)
    )


def bpe_decode_ids(ids: list[int], vocab: dict[str, int]) -> str:
    """Inverse of encode for in-vocab text: concatenate symbols and
    turn end-of-word markers back into spaces (<unk>=0 -> empty)."""
    inv = {v: k for k, v in vocab.items()}
    text = "".join(inv.get(i, "") for i in ids)
    return text.replace(_EOW, " ").strip()
