"""Pure-Python unit tests for the recursive splitter (SURVEY.md §5.2
item 3: golden unit tests on fixed strings; driver check for gold is
rows-only so fidelity is established here)."""

from lakehouse_to_rag_spark.functions.chunker import split_text_recursive


def test_empty_and_none():
    assert split_text_recursive("") == []
    assert split_text_recursive(None) == []


def test_short_text_single_chunk():
    assert split_text_recursive("hello world") == ["hello world"]


def test_chunks_bounded_by_size():
    text = " ".join(f"word{i}" for i in range(500))
    chunks = split_text_recursive(text, chunk_size=200, chunk_overlap=10)
    assert chunks, "non-empty input must chunk"
    assert all(len(c) <= 200 for c in chunks)


def test_overlap_carries_tail():
    # words of 7 chars + space; chunk_size 40 → ~5 words/chunk,
    # overlap 10 → last word of chunk i reappears in chunk i+1
    words = [f"aaaa{i:03d}" for i in range(20)]
    text = " ".join(words)
    chunks = split_text_recursive(text, chunk_size=40, chunk_overlap=10)
    assert len(chunks) > 2
    for prev, nxt in zip(chunks, chunks[1:]):
        prev_tail = prev.split(" ")[-1]
        assert prev_tail in nxt, (prev, nxt)


def test_paragraph_separator_preferred():
    text = ("para one is here.\n\n" + "para two is much longer " * 3).strip()
    chunks = split_text_recursive(text, chunk_size=60, chunk_overlap=5)
    assert chunks[0] == "para one is here."


def test_unsplittable_token_hard_cut():
    text = "x" * 450
    chunks = split_text_recursive(text, chunk_size=200, chunk_overlap=10)
    assert all(len(c) <= 200 for c in chunks)
    # full coverage of the string (character-level fallback)
    assert sum(len(c) for c in chunks) >= 450 - 10 * len(chunks)


def test_no_empty_chunks():
    text = "a  b \n\n  \n c   d"
    chunks = split_text_recursive(text, chunk_size=5, chunk_overlap=0)
    assert all(c.strip() for c in chunks)


def test_regression_goldens():
    """Frozen outputs guarding against accidental semantic drift of the
    recursive splitter (chunk_size=50, overlap=10)."""
    assert split_text_recursive("hello world", 50, 10) == ["hello world"]
    para = ("para one is here.\n\n" + "para two is much longer " * 3).strip()
    assert split_text_recursive(para, 50, 10) == [
        "para one is here.",
        "para two is much longer para two is much longer",
        "longer para two is much longer",
    ]
    words = " ".join(f"word{i}" for i in range(60))
    chunks = split_text_recursive(words, 50, 10)
    assert chunks[0] == "word0 word1 word2 word3 word4 word5 word6 word7"
    assert chunks[1] == "word7 word8 word9 word10 word11 word12 word13"
    assert chunks[-1] == "word55 word56 word57 word58 word59"
    assert len(chunks) == 10


class TestCdcChunks:
    """Content-defined chunking: reconstruction, edit locality (the
    property fixed-stride lacks), min-size fold, boundary params."""

    def test_chunks_reconstruct_exactly(self, spark):
        from lakehouse_to_rag_spark.operators.gold import cdc_chunks

        d = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).filter("text is not null and length(text) > 0")
        originals = {r["doc_id"]: r["text"] for r in d.collect()}
        for hash_fn in ("md5", "xxhash64"):  # oracle + production forms
            got = cdc_chunks(d, hash_fn=hash_fn).collect()
            by_doc = {}
            for r in got:
                by_doc.setdefault(r["doc_id"], []).append(
                    (r["chunk_index"], r["chunk"])
                )
            assert set(by_doc) == set(originals), hash_fn
            for doc, chunks in by_doc.items():
                chunks.sort()
                assert [i for i, _ in chunks] == list(range(len(chunks)))
                assert "".join(c for _, c in chunks) == originals[doc]

    def test_edit_locality_vs_fixed_stride(self, spark):
        """Insert a sentence mid-document: CDC boundaries REALIGN
        after the edit (most chunk hashes shared), fixed-stride
        shifts every downstream chunk (tail hashes all differ)."""
        from lakehouse_to_rag_spark.operators.gold import cdc_chunks

        base = " ".join(f"w{i:04d} token filler text" for i in range(200))
        edited = base[:500] + "AN INSERTED SENTENCE " + base[500:]
        two = spark.createDataFrame(
            [(1, base), (2, edited)], "doc_id long, text string"
        )
        for hash_fn in ("md5", "xxhash64"):  # the property is hash-agnostic
            got = cdc_chunks(
                two, k=16, divisor=32, hash_fn=hash_fn
            ).collect()
            h = {1: set(), 2: set()}
            n = {1: 0, 2: 0}
            for r in got:
                h[r["doc_id"]].add(r["chunk_hash"])
                n[r["doc_id"]] += 1
            assert n[1] >= 10, hash_fn  # enough chunks to mean much
            shared = len(h[1] & h[2])
            assert shared >= 0.7 * n[1], (hash_fn, shared, n)
        # fixed-stride control: everything after the edit point shifts
        stride_shared = 0
        for s in range(0, len(base), 100):
            if base[s:s + 100] == edited[s:s + 100]:
                stride_shared += 1
        assert stride_shared <= 5  # only the prefix before the edit

    def test_min_size_fold_suppresses_close_cutpoints(self, spark):
        from lakehouse_to_rag_spark.operators.gold import cdc_chunks

        d = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(50)
        small = cdc_chunks(d, k=8, divisor=16, min_size=1).collect()
        merged = cdc_chunks(d, k=8, divisor=16, min_size=80).collect()
        assert len(merged) < len(small)
        lens = [len(r["chunk"]) for r in merged]
        # every chunk except possibly each doc's terminal one >= min
        by_doc = {}
        for r in merged:
            by_doc.setdefault(r["doc_id"], []).append(
                (r["chunk_index"], len(r["chunk"]))
            )
        for doc, rows in by_doc.items():
            rows.sort()
            assert all(ln >= 80 for _, ln in rows[:-1]), (doc, rows)

    def test_rejects_bad_params(self, spark):
        import pytest

        from lakehouse_to_rag_spark.operators.gold import cdc_chunks

        d = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        for kw in (
            {"k": 0},
            {"divisor": 0},
            {"min_size": 0},
            {"hash_fn": "sha1"},
        ):
            with pytest.raises(ValueError, match="cdc_chunks"):
                cdc_chunks(d, **kw)


def test_chunk_refresh_plan_touches_only_edited_docs(spark):
    """The refresh plan must scale with the EDIT MASS: unedited
    documents emit zero rows, and an edited doc re-embeds only the
    chunks its edit touched (strictly fewer than its chunk count —
    the fixed-stride scheme would invalidate the whole tail)."""
    from lakehouse_to_rag_spark.operators.gold import (
        cdc_chunks,
        chunk_refresh_plan,
    )

    old = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter("text is not null and length(text) > 0").select(
        "doc_id", "text"
    )
    from pyspark.sql import functions as F

    new = old.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.substring("text", 1, 40),
                F.lit(" XX "),
                F.expr("substring(text, 41)"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    plan = chunk_refresh_plan(old, new).collect()
    assert plan
    assert all(r["doc_id"] % 10 == 0 for r in plan)
    n_old_chunks = {
        r["doc_id"]: r["cnt"]
        for r in cdc_chunks(old.filter("doc_id % 10 = 0"))
        .groupBy("doc_id").count().withColumnRenamed("count", "cnt")
        .collect()
    }
    from collections import Counter

    emb = Counter(r["doc_id"] for r in plan if r["action"] == "embed")
    # strictly local: on average far fewer chunks touched than exist
    touched = sum(emb.values())
    total = sum(n_old_chunks.values())
    assert touched < 0.6 * total, (touched, total)
    # identical corpora -> empty plan
    assert chunk_refresh_plan(old, old).count() == 0
