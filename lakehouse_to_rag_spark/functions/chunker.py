"""RAG chunking: recursive character text splitter.

Reference F1 (airflow/dags/etl.py:207-215): LangChain
``RecursiveCharacterTextSplitter(chunk_size=200, chunk_overlap=10)``
applied row-wise with pandas ``.apply`` — single-core, GIL-bound.

Here: a self-contained re-implementation of the recursive-splitter
semantics (separator cascade ``["\\n\\n", "\\n", " ", ""]``, greedy
merge up to chunk_size with chunk_overlap carry-over), wrapped in an
Arrow-batched ``pandas_udf`` so chunking scales linearly with executor
cores instead of running on one driver core. No LangChain dependency.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

DEFAULT_SEPARATORS = ["\n\n", "\n", " ", ""]
DEFAULT_CHUNK_SIZE = 200
DEFAULT_CHUNK_OVERLAP = 10


def _join_splits(splits: list[str], separator: str) -> str | None:
    text = separator.join(splits).strip()
    return text if text else None


def _merge_splits(
    splits: list[str], separator: str, chunk_size: int, chunk_overlap: int
) -> list[str]:
    """Greedy merge of sub-splits into chunks <= chunk_size, keeping a
    chunk_overlap-sized tail as the seed of the next chunk."""
    sep_len = len(separator)
    docs: list[str] = []
    current: list[str] = []
    total = 0
    for piece in splits:
        plen = len(piece)
        if total + plen + (sep_len if current else 0) > chunk_size:
            if current:
                doc = _join_splits(current, separator)
                if doc is not None:
                    docs.append(doc)
                # pop from the front until the carried tail fits the
                # overlap budget AND the incoming piece fits the chunk
                while total > chunk_overlap or (
                    total + plen + (sep_len if current else 0) > chunk_size
                    and total > 0
                ):
                    total -= len(current[0]) + (sep_len if len(current) > 1 else 0)
                    current = current[1:]
        current.append(piece)
        total += plen + (sep_len if len(current) > 1 else 0)
    doc = _join_splits(current, separator)
    if doc is not None:
        docs.append(doc)
    return docs


def split_text_recursive(
    text: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    separators: list[str] | None = None,
) -> list[str]:
    """Pure-Python recursive character splitter (unit-testable)."""
    if text is None:
        return []
    seps = separators if separators is not None else DEFAULT_SEPARATORS

    def _split(text: str, separators: list[str]) -> list[str]:
        final: list[str] = []
        separator = separators[-1]
        remaining: list[str] = []
        for i, sep in enumerate(separators):
            if sep == "":
                separator = sep
                break
            if sep in text:
                separator = sep
                remaining = separators[i + 1 :]
                break
        splits = [s for s in (text.split(separator) if separator else list(text)) if s]
        good: list[str] = []
        for s in splits:
            if len(s) < chunk_size:
                good.append(s)
            else:
                if good:
                    final.extend(_merge_splits(good, separator, chunk_size, chunk_overlap))
                    good = []
                if not remaining:
                    final.append(s)
                else:
                    final.extend(_split(s, remaining))
        if good:
            final.extend(_merge_splits(good, separator, chunk_size, chunk_overlap))
        return final

    return _split(text, seps)


def chunks_udf(
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> "F.pandas_udf":
    """Arrow-batched chunker: string column -> array<string> of chunks."""

    @F.pandas_udf(ArrayType(StringType()))
    def _chunks(content: pd.Series) -> pd.Series:
        return content.map(
            lambda t: split_text_recursive(t, chunk_size, chunk_overlap)
        )

    return _chunks


def fixed_stride_chunks(
    col: str | Column,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> Column:
    """SQL-only chunking baseline: fixed windows of ``chunk_size`` chars
    advancing by ``chunk_size - chunk_overlap``. Fully JVM-side
    (sequence + transform + substring) so it is both oracle-expressible
    and the fast path when exact recursive semantics aren't required."""
    c = F.col(col) if isinstance(col, str) else col
    stride = chunk_size - chunk_overlap
    starts = F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1)), F.lit(stride))
    return F.transform(starts, lambda s: F.substring(c, s, chunk_size))
