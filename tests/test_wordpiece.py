"""WordPiece engine/oracle parity on an ADVERSARIAL toy corpus.

The BPE round-6 lesson (ADVICE.md high: the sf-corpus gate can pass
while a word-shape class silently diverges) applied up front: this
pins engine == oracle end to end (train + encode + count) on exactly
the shapes where greedy longest-match and the recursive-CTE replay
could disagree — repeated pieces, greedy-vs-optimal traps, the
whole-word [UNK] rule (reachable only via a char OUTSIDE the
training-sample window), chr(31) stripping, and the
whitespace-only/NULL contract.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

# Docs 0..7 are inside the 500-doc training sample. Doc 501 is OUTSIDE
# it (sample_rows=500, ids 0..500 exist): its novel character is never
# observed in training, so its words hit the whole-word [UNK] rule —
# the only way UNK is reachable (every sampled (char, cont) is
# char-base vocab by construction, so sampled words can never fail).
_TEXTS = [
    "haha haha hahaha ha hah",  # repeated pieces, shared boundaries
    "abab ababab ab ba bab",  # greedy-longest vs shorter-split traps
    "xxxx xxxxx xxx xx x",  # runs: longest-match eats 4, then rest
    "the quick brown fox jumps over the lazy dog",
    "banana bananas ana nan",
    "",  # whitespace-only -> n_tokens 0 via the not-null join contract
    None,  # dropped by the not-null filter on both sides
    "ha\x1fha boo\x1f\x1fboo",  # chr(31) stripped identically both sides
]


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wp_toy")
    texts = list(_TEXTS) + [
        f"filler{i} pad{i}" for i in range(len(_TEXTS), 501)
    ] + ["zq zzqq azq"]  # doc 501: 'z'/'q' unseen in docs 0..500
    rows = pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["toy"] * len(texts),
            "n_chars": [len(t) if t else 0 for t in texts],
        }
    )
    rows.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_wordpiece_matches_oracle_on_adversarial_corpus(spark, toy_dir):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()["wordpiece_token_counts"](spark, toy_dir)
    got = {r["doc_id"]: r["n_tokens"] for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{toy_dir}/documents.parquet'"
    )
    want = dict(
        con.execute(entrymod.oracle_sql()["wordpiece_token_counts"]).fetchall()
    )
    con.close()

    assert got == want, (
        f"engine/oracle token counts diverge: "
        f"{ {k: (got.get(k), want.get(k)) for k in set(got) | set(want) if got.get(k) != want.get(k)} }"
    )
    assert 6 not in got  # NULL text dropped
    assert got[5] == 0  # whitespace-only kept at 0
    # doc 501: three out-of-sample words, each collapsing to [UNK]
    assert got[501] == 3


def test_greedy_longest_match_word_level():
    """Hand-computed greedy traces, including the trap where taking
    the longest prefix forces MORE total tokens than an optimal split
    would (greedy is the spec, not optimality)."""
    from lakehouse_to_rag_spark.functions.wordpiece import (
        wordpiece_encode_word,
    )

    vocab = {
        ("abc", False),
        ("ab", False),
        ("a", False),
        ("b", True),
        ("c", True),
        ("d", True),
        ("cd", True),
    }
    # greedy takes 'abc' then 'd': 2 tokens (optimal here too)
    assert wordpiece_encode_word("abcd", vocab, 4) == 2
    # 'abcb': greedy 'abc'+'b' = 2
    assert wordpiece_encode_word("abcb", vocab, 4) == 2
    # 'abx': 'ab' matches, then ('x', True) missing -> whole-word UNK
    assert wordpiece_encode_word("abx", vocab, 4) == 1
    # greedy trap: 'abcc' -> 'abc' + 'c' = 2, never 'ab' + 'cc'
    assert wordpiece_encode_word("abcc", vocab, 4) == 2


def test_vocab_total_order_and_char_base(spark):
    """Every observed (char, cont) is in-vocab; multi-char pieces are
    capped by the (weight DESC, piece ASC, cont ASC) total order."""
    from lakehouse_to_rag_spark.functions.wordpiece import wordpiece_train

    df = spark.createDataFrame(
        [(0, "aa aa ab")], "doc_id long, text string"
    )
    vocab = wordpiece_train(df, vocab_multi=1, max_piece_len=2)
    assert ("a", False) in vocab and ("a", True) in vocab
    assert ("b", True) in vocab and ("b", False) not in vocab
    # weight('aa')=2 > weight('ab')=1 -> only 'aa' survives the cap
    assert ("aa", False) in vocab and ("ab", False) not in vocab


def test_production_vocab_encode_memory_bound(spark):
    """Encode at a PRODUCTION 32k vocab (training oracles cap at ~200
    pieces; this pins the encode path itself): the vocab rides every
    task closure, so its serialized size is the per-executor memory
    bill — assert it stays sub-MB at 32k pieces — and the encode must
    stay correct with a large vocab in the hot loop (hand-computable
    planted words among filler pieces). SCALE.md r7 records the
    throughput side: 500k docs / 50k distinct words in ~3s for both
    WordPiece and Unigram at this vocab size."""
    import pickle

    from lakehouse_to_rag_spark.functions.unigram import unigram_encode
    from lakehouse_to_rag_spark.functions.wordpiece import wordpiece_encode

    vocab = {(f"zq{i:05d}", bool(i % 2)) for i in range(31_990)}
    for c in "abx":
        vocab.add((c, False))
        vocab.add((c, True))
    vocab.add(("ab", False))
    assert len(vocab) > 31_000
    assert len(pickle.dumps(vocab)) < 1 << 20  # sub-MB closure at 32k

    df = spark.createDataFrame(
        [(0, "ab a b"), (1, "abq ab")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in wordpiece_encode(df, vocab, max_piece_len=7).collect()
    }
    # 'ab'=1, 'a'=1, 'b'=1; 'abq' has no ('q',True) -> UNK=1, 'ab'=1
    assert got == {0: 3, 1: 2}

    logp = {f"zq{i:05d}": -1_000_000 for i in range(31_990)}
    logp.update({"a": -2_000_000, "b": -2_000_000, "ab": -3_000_000})
    assert len(pickle.dumps(logp)) < 1 << 20
    got_u = {
        r["doc_id"]: r["n_tokens"]
        for r in unigram_encode(df, logp, max_piece_len=7).collect()
    }
    # viterbi: 'ab' -> min tokens 1 ('ab' beats 'a'+'b'); 'abq': 'ab'+UNK
    assert got_u[0] == 3 and got_u[1] >= 2
