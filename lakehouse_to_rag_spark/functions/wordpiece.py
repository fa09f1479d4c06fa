"""WordPiece tokenizer: frequency-built subword vocabulary, greedy
longest-match-first encode (SURVEY.md §2.13 token-counting family —
the third tokenizer twin next to functions/bpe.py and
functions/unigram.py; BERT-style WordPiece is what most
encoder-pipeline token budgets are denominated in).

Two deterministic stages, mirroring the siblings' contract:

* ``wordpiece_train`` builds the vocabulary from a BOUNDED sample of
  documents: every observed (piece, is_continuation) of length 1 is
  always in-vocab (the character base), plus the top ``vocab_multi``
  multi-character pieces ranked by summed occurrence weight
  (weight DESC, piece ASC, continuation ASC — a total order, so two
  runs or two engines build the identical vocabulary). This is the
  counting flavor of vocabulary construction; the likelihood-scored
  merge variant is what unigram.py's EM covers.
* ``wordpiece_encode`` is the famous greedy longest-match-first scan
  (Wu et al. 2016; the BERT tokenizer's WordPiece loop): at each
  position take the LONGEST vocab piece that matches (continuation
  pieces for positions past the word start); if no piece matches,
  the ENTIRE word becomes one [UNK] token. Encoding ships the
  bounded vocab as task-closure broadcast state inside an
  Arrow-batched ``mapInPandas`` with per-word memoization — the same
  scale shape as bpe_encode (the trainer sees a sample, the ENCODER
  is what must scan 100 TB).

Determinism: no RNG, total-order ranking, and the greedy scan is a
single forward pass — replayable in SQL as a recursive CTE (see the
``wordpiece_token_counts`` oracle in plans/registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_to_rag_spark.functions.bpe import _split_ws


def wordpiece_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_multi: int = 200,
    max_piece_len: int = 4,
    sample_rows: int = 500,
    id_col: str = "doc_id",
) -> set[tuple[str, bool]]:
    """Build the WordPiece vocabulary from the first ``sample_rows``
    documents by id. Returns a set of (piece, is_continuation) —
    all the encoder needs for greedy matching.

    Weight of a piece = sum over sampled words of
    word_frequency x number of occurrence positions (a piece
    occurring twice inside one word counts twice — plain occurrence
    mass, no overlap suppression, so the SQL replay is a flat
    substring unnest + SUM)."""
    if max_piece_len < 1:
        raise ValueError(f"wordpiece_train: max_piece_len >= 1, got {max_piece_len}")
    if vocab_multi < 0:
        raise ValueError(f"wordpiece_train: vocab_multi >= 0, got {vocab_multi}")
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
            word_freq[w] = word_freq.get(w, 0) + 1

    weights: dict[tuple[str, bool], int] = {}
    for word, freq in word_freq.items():
        n = len(word)
        for i in range(n):
            for ln in range(1, min(max_piece_len, n - i) + 1):
                key = (word[i : i + ln], i > 0)
                weights[key] = weights.get(key, 0) + freq

    vocab = {k for k in weights if len(k[0]) == 1}
    multi = sorted(
        (
            (wt, piece, cont)
            for (piece, cont), wt in weights.items()
            if len(piece) >= 2
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )
    vocab.update((piece, cont) for _, piece, cont in multi[:vocab_multi])
    return vocab


def wordpiece_encode_word(
    word: str, vocab: set[tuple[str, bool]], max_piece_len: int
) -> int:
    """Token count of one word under greedy longest-match-first; a
    position with no matching piece collapses the whole word to one
    [UNK] (the BERT rule — partial matches are discarded, not kept)."""
    pos, cnt, n = 0, 0, len(word)
    while pos < n:
        for ln in range(min(max_piece_len, n - pos), 0, -1):
            if (word[pos : pos + ln], pos > 0) in vocab:
                pos += ln
                cnt += 1
                break
        else:
            return 1
    return cnt


def wordpiece_encode(
    df: DataFrame,
    vocab: set[tuple[str, bool]],
    max_piece_len: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed encode: (id, n_tokens) for every non-null-text row
    (whitespace-only text counts 0 tokens). The vocab set rides the
    task closure; per-word memoization makes per-batch cost
    proportional to DISTINCT words (Zipf), same as bpe_encode."""
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField(id_col, LongType()), StructField("n_tokens", LongType())]
    )

    def _enc(batches):
        cache: dict[str, int] = {}

        def toks(word: str) -> int:
            got = cache.get(word)
            if got is None:
                got = wordpiece_encode_word(word, vocab, max_piece_len)
                cache[word] = got
            return got

        for pdf in batches:
            out = [
                sum(toks(w) for w in _split_ws(t or ""))
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "n_tokens": out})

    return (
        df.filter(F.col(text_col).isNotNull())
        .select(id_col, text_col)
        .mapInPandas(_enc, schema=schema)
    )
