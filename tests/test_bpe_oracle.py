"""BPE training-oracle parity on an ADVERSARIAL toy corpus.

Round-6 ADVICE.md (high): the round-5 oracle rewrote merge steps with
a single-delimiter REPLACE, which silently skipped the second of two
delimiter-SHARING occurrences of the merged pair inside one word
('haha', '2020', odd runs 'aaaaa') — the engine's consume-both scan
merges both, so training diverged on realistic corpora even though the
sf-corpus gate happened to pass.  The fix double-delimits the symbol
string so occurrences never share characters; this test pins the
equivalence on exactly the word shapes that broke, end to end
(train + encode + count) against the same pinned oracle the driver
runs, plus the chr(31)-stripping contract.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

# The adversarial shapes from ADVICE.md: adjacent repeated pairs that
# share a delimiter in single-delimited string form, odd/even runs,
# and enough repetition that the repeated pairs actually win merges.
_TEXTS = [
    "haha haha haha hahaha ha ha hah",
    "2020 2020 2020 20202 202 20 20",
    "aaaa aaaaa aaa aa aa aaaaaa a",
    "xyxyxy xyxy xyxy xy xy yx",
    "the quick brown fox jumps over the lazy dog",
    "the cat and the hat and the bat",
    "banana bananas banana ana ana nan",
    "",  # whitespace-only -> n_tokens 0 via the not-null join contract
    None,  # dropped by the not-null filter on both sides
    "ha\x1fha boo\x1f\x1fboo",  # chr(31) stripped identically both sides
]


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe_toy")
    rows = pd.DataFrame(
        {
            "doc_id": list(range(len(_TEXTS))),
            "text": _TEXTS,
            "lang": ["en"] * len(_TEXTS),
            "source": ["toy"] * len(_TEXTS),
            "n_chars": [len(t) if t else 0 for t in _TEXTS],
        }
    )
    rows.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_bpe_token_counts_matches_oracle_on_repeat_words(spark, toy_dir):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()["bpe_token_counts"](spark, toy_dir)
    got = {r["doc_id"]: r["n_tokens"] for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{toy_dir}/documents.parquet'"
    )
    want = dict(con.execute(entrymod.oracle_sql()["bpe_token_counts"]).fetchall())
    con.close()

    assert got == want, (
        f"engine/oracle token counts diverge: "
        f"{ {k: (got.get(k), want.get(k)) for k in set(got) | set(want) if got.get(k) != want.get(k)} }"
    )
    # the None-text doc is excluded, the empty doc kept at 0 tokens
    assert 8 not in got
    assert got[7] == 0
    assert got[9] > 0


def test_engine_consume_both_scan_on_repeats():
    """The engine itself: one merge of (h,a) over 'hahaha' must yield
    [ha, ha, ha, </w>] (consume-both), never [ha, h, a, ...]."""
    from lakehouse_to_rag_spark.functions.bpe import bpe_encode_word

    # rank table with the single merge (h, a)
    assert bpe_encode_word("hahaha", {("h", "a"): 0}) == [
        "ha", "ha", "ha", "</w>",
    ]
    # odd run: greedy left-to-right pairs up the prefix, leaves the tail
    assert bpe_encode_word("aaaaa", {("a", "a"): 0}) == ["aa", "aa", "a", "</w>"]


def test_chr31_stripped_before_word_split():
    from lakehouse_to_rag_spark.functions.bpe import _split_ws

    assert _split_ws("ha\x1fha boo\x1f\x1fboo") == ["haha", "booboo"]


# ---------------------------------------------- unigram-LM tokenizer

_UNI_TEXTS = [
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",  # 44 chars: 3 chunks
    "haha hahaha 2020 20202 the cat sat on the mat",
    "na\x1five uni\x1f\x1fcode mixed123 !!!",  # chr(31) stripped both sides
    "the the the the cat cat dog dog dog banana",
    "",
    None,
    "x",
    "zzzz qqqq xxxx unseen-chars: ---",
]


@pytest.fixture(scope="module")
def uni_toy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("unigram_toy")
    pd.DataFrame(
        {
            "doc_id": list(range(len(_UNI_TEXTS))),
            "text": _UNI_TEXTS,
            "lang": ["en"] * len(_UNI_TEXTS),
            "source": ["toy"] * len(_UNI_TEXTS),
            "n_chars": [len(t) if t else 0 for t in _UNI_TEXTS],
        }
    ).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_unigram_token_counts_matches_oracle_on_adversarial_corpus(
    spark, uni_toy_dir
):
    """Engine vs the unrolled 3-pass Viterbi oracle on the shapes that
    stress the contract: words longer than the 20-char chunk bound,
    chr(31) in text, repeats, single chars, chars unseen at encode
    time (UNK fallback)."""
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()["unigram_token_counts"](spark, uni_toy_dir)
    got = {r["doc_id"]: r["n_tokens"] for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{uni_toy_dir}/documents.parquet'"
    )
    want = dict(
        con.execute(entrymod.oracle_sql()["unigram_token_counts"]).fetchall()
    )
    con.close()
    assert got == want
    assert 6 not in got      # null text dropped
    assert got[5] == 0       # empty text -> 0 tokens
    assert got[7] >= 1       # single char segmentable


def test_unigram_viterbi_total_order_and_chunking():
    from lakehouse_to_rag_spark.functions.unigram import (
        UNK_MICRO,
        _chunks,
        _viterbi,
    )

    # deterministic winner under exact score ties: two vocabularies
    # where 'ab'+'cd' and 'abc'+'d' tie on score -> fewer-tokens is
    # not a tiebreak here (both 2) -> lexicographic path wins
    logp = {"ab": -10, "cd": -10, "abc": -10, "d": -10, "a": -50,
            "b": -50, "c": -50}
    score, ntok, path = _viterbi("abcd", logp, 4)
    assert (score, ntok) == (-20, 2)
    assert path == "ab\x1fcd"  # 'ab…' < 'abc…' lexicographically

    # UNK fallback: unseen chars advance one position at the penalty
    score, ntok, _ = _viterbi("xy", {"x": -5}, 4)
    assert ntok == 2 and score == -5 + UNK_MICRO

    assert _chunks("a" * 44, 20) == ["a" * 20, "a" * 20, "a" * 4]


def test_unigram_train_is_deterministic(spark, uni_toy_dir):
    from lakehouse_to_rag_spark.functions.unigram import unigram_train
    from lakehouse_to_rag_spark.sources.tables import load_table

    d = load_table(spark, uni_toy_dir, "documents")
    a = unigram_train(d, em_iters=2)
    b = unigram_train(d, em_iters=2)
    assert a == b and len(a) > 10
