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
