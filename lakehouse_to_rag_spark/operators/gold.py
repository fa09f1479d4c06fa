"""Gold stage: RAG chunk fan-out.

Reference semantics (airflow/dags/etl.py:218-250): pandas
``.apply(_split_content)`` + ``.explode("chunks")`` + rename -> one row
per ~200-char chunk, all silver columns replicated; an empty chunk list
keeps one row with NULL chunk (pandas explode keeps NaN — we match with
``explode_outer``, SURVEY.md §2.9 T2).

Note: the reference writes gold to the *silver* path (etl.py:240, a
latent bug); we implement the documented intent (separate gold output,
README.md:157-161).

Scale notes: chunking is embarrassingly parallel — no shuffle at all in
this stage; the pandas_udf runs Arrow-batched on every executor core.
The explode multiplies rows ~len/stride×; downstream consumers should
repartition by size, not count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_to_rag_spark.functions.chunker import (
    DEFAULT_CHUNK_OVERLAP,
    DEFAULT_CHUNK_SIZE,
    chunks_udf,
    fixed_stride_chunks,
)


def gold_transform(
    silver: DataFrame,
    content_col: str = "content",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    with_index: bool = False,
) -> DataFrame:
    """Pure function silver -> gold (one row per chunk).

    ``with_index=True`` adds a ``chunk_index`` column via posexplode —
    an extension over the reference that RAG retrieval needs to
    reconstruct document order.
    """
    arr = chunks_udf(chunk_size, chunk_overlap)(F.col(content_col))
    if with_index:
        return silver.select(
            "*", F.posexplode_outer(arr).alias("chunk_index", "chunk")
        )
    return silver.withColumn("chunk", F.explode_outer(arr))


def gold_transform_fixed_stride(
    silver: DataFrame,
    content_col: str = "content",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> DataFrame:
    """SQL-only chunking variant (sequence+substring, zero Python) —
    oracle-expressible and the fastest path when recursive-splitter
    boundary snapping isn't required."""
    arr = fixed_stride_chunks(content_col, chunk_size, chunk_overlap)
    return silver.select(
        "*", F.posexplode_outer(arr).alias("chunk_index", "chunk")
    )


def cdc_chunks(
    df: DataFrame,
    k: int = 16,
    divisor: int = 256,
    min_size: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """CONTENT-DEFINED chunking (rolling-hash cutpoints — the
    rsync/LBFS/restic boundary discipline applied to RAG chunking):
    cut after every position whose k-gram hash ≡ 0 (mod ``divisor``),
    so expected chunk length is ~``divisor`` + k and — the property
    fixed-stride chunking lacks — boundaries REALIGN after an edit:
    inserting a sentence shifts only the chunks containing it, every
    later cutpoint is decided by local content and lands identically,
    so chunk-level hashes stay stable for incremental re-embedding and
    chunk-level dedup (fixed-stride shifts EVERY downstream chunk and
    invalidates the whole tail; equality property-tested on a planted
    edit).

    Engine shape: per-row JVM array lambdas only (the winnowing
    pattern — hash sequence bound to a column ONCE, then
    filter/aggregate/transform over it), no shuffle, no Python; the
    gram hash is the engine-portable 60-bit md5 so the whole chunking
    replays in SQL — or ``hash_fn="xxhash64"``, the winnowing
    precedent's PRODUCTION knob: the identical plan with the native
    JVM hash in place of the md5+conv chain (the md5 chain is the
    whole cost of this operator at scale — one hash per character);
    cutpoints differ between the two hashes by construction, but
    every CDC property (reconstruction, edit locality, min-size) is
    hash-agnostic and property-tested for both. A corpus must stick
    to ONE hash_fn: ``chunk_refresh_plan`` across hashes would
    re-embed everything. ``min_size`` greedily suppresses cutpoints closer
    than min_size to the last kept one (an F.aggregate fold — the
    sequential CDC min-size rule); the terminal chunk may be shorter,
    as in every CDC scheme. Documents shorter than k emit one whole
    chunk.

    DEFAULT ``divisor=256`` is the RAG production value, set from the
    r10 sf0.1 probe (SCALE.md): mean chunk 140 chars / p50 111 on the
    harness corpus (expected ~divisor+k asymptotically — the
    reference's RecursiveCharacterTextSplitter targets 200-char
    chunks, /root/reference/airflow/dags/etl.py:205-213), the lowest
    incremental refresh mass of the probed grid (1.06 chunks
    re-embedded per edited doc vs 1.38 at divisor=64), the cheapest
    chunking wall (3.4 s vs 4.8 s), and BM25 retrieval parity within
    noise (span-in-top-10 48/99 vs 51/99 across 99 planted span
    queries). Gated oracle entries pin divisor=64 (their original
    parameterization) so the gate never drifts with a default.
    Returns (id_col, chunk_index 0.., chunk, chunk_hash)."""
    if k < 1 or divisor < 1 or min_size < 1:
        raise ValueError(
            f"cdc_chunks: k, divisor, min_size >= 1, got "
            f"k={k} divisor={divisor} min_size={min_size}"
        )
    t = f"`{text_col}`"
    if hash_fn == "md5":
        gram = (
            f"cast(conv(substr(md5(substring({t}, i, {k})), 1, 15), "
            f"16, 10) as bigint)"
        )
    elif hash_fn == "xxhash64":
        gram = f"xxhash64(substring({t}, i, {k}))"
    else:
        raise ValueError(
            f"cdc_chunks: hash_fn must be 'md5' (SQL-replayable oracle "
            f"form) or 'xxhash64' (production form), got {hash_fn!r}"
        )
    # candidate cutpoints: position AFTER each boundary gram
    cands = (
        f"case when length({t}) >= {k} then "
        f"filter(transform(sequence(1, length({t}) - {k - 1}), "
        f"i -> case when pmod({gram}, {divisor}) = 0 "
        f"then i + {k} else null end), x -> x is not null) "
        f"else cast(array() as array<int>) end"
    )
    # greedy min-size fold + bounds [1, kept..., len+1]; a cutpoint
    # past the end (last gram) and duplicates collapse via the fold
    bounds = (
        f"concat(aggregate(_c, array(1), (acc, b) -> "
        f"case when b - element_at(acc, -1) >= {min_size} "
        f"and b <= length({t}) then concat(acc, array(b)) "
        f"else acc end), array(length({t}) + 1))"
    )
    chunks = (
        f"transform(sequence(1, size(_b) - 1), "
        f"j -> substring({t}, element_at(_b, j), "
        f"element_at(_b, j + 1) - element_at(_b, j)))"
    )
    return (
        df.filter(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
        .select(F.col(id_col), F.col(text_col), F.expr(cands).alias("_c"))
        .select(F.col(id_col), F.col(text_col), F.expr(bounds).alias("_b"))
        .select(
            F.col(id_col),
            F.posexplode(F.expr(chunks)).alias("chunk_index", "chunk"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_index").cast("long").alias("chunk_index"),
            "chunk",
            F.md5(F.col("chunk")).alias("chunk_hash"),
        )
    )


def chunk_refresh_plan(
    old: DataFrame,
    new: DataFrame,
    k: int = 16,
    divisor: int = 256,
    min_size: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Incremental re-embedding driver — the composition ``cdc_chunks``
    exists for: given two corpus versions, emit ONLY the chunk-level
    work a refresh needs: ``embed`` rows (chunk hashes present in new
    but not old — new or edited content) and ``delete`` rows (hashes
    present in old but not new — superseded index entries). Because
    CDC boundaries realign after an edit, an insertion into a
    document re-embeds only the chunks it touched; under fixed-stride
    chunking the same edit would invalidate the document's whole
    tail (the cdc_chunks edit-locality property, here doing its
    actual job).

    Plan shape: two map-only chunkings + two hash-partitioned
    anti-joins on (id, chunk_hash) — work scales with the CHANGED
    corpus fraction at the join output, never with corpus size in
    the result. Identical params must be used on both sides (the
    cutpoint function is the identity of the scheme). Returns
    (id_col, chunk_index, chunk_hash, action) — chunk text is
    deliberately dropped (the refresh consumer re-reads it by
    (id, chunk_index) from the NEW corpus; hashes travel, bodies
    don't)."""
    keys = [id_col, "chunk_hash"]
    # each chunking feeds TWO consumers (anti-join stream side of its
    # own branch + build side of the other's), and the per-character
    # gram hash is the whole cost of CDC chunking — without the lazy
    # checkpoint each side computed TWICE (4 corpus chunkings per run,
    # confirmed as 4 Scan parquet leaves in the physical plan; r13
    # optimization round, guide §1.2/§2.4). The checkpointed table is
    # the NARROW (id, chunk_index, chunk_hash) projection — chunk text
    # never materializes (~2% of corpus bytes at 100 TB).
    o = cdc_chunks(
        old, k, divisor, min_size, id_col, text_col, hash_fn
    ).select(id_col, "chunk_index", "chunk_hash").localCheckpoint(eager=False)
    n = cdc_chunks(
        new, k, divisor, min_size, id_col, text_col, hash_fn
    ).select(id_col, "chunk_index", "chunk_hash").localCheckpoint(eager=False)
    embed = n.join(o.select(*keys), keys, "left_anti").withColumn(
        "action", F.lit("embed")
    )
    delete = o.join(n.select(*keys), keys, "left_anti").withColumn(
        "action", F.lit("delete")
    )
    return embed.unionByName(delete)
