"""The reference's analytics/data-quality query library, Spark-first.

Covers SURVEY.md §2 rows A1-A7, O1-O3, U1, T1, D1 and the pass-through
SQL entry (src/helpers/duckdb_queries.py + src/helpers/delta_queries.py).

Every function is ``DataFrame -> DataFrame`` and built purely from
pyspark.sql.functions, so plans stay in whole-stage codegen; top-k
queries compile to TakeOrderedAndProject (distributed heap top-k, no
global sort); unions of per-table 1-row aggregates are trivially
parallel.

Float outputs are rounded (default 4 dp) so results hash-match a
double-precision oracle run by another engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ROUND_DP = 4


def table_row_counts(tables: dict[str, DataFrame]) -> DataFrame:
    """A1 (duckdb_queries.py:34-41): COUNT(*) per table, unioned with a
    literal table_name column."""
    parts = [
        df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("row_count"),
        )
        for name, df in tables.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def content_length_stats(
    tables: dict[str, DataFrame], content_col: str = "content"
) -> DataFrame:
    """A2 (duckdb_queries.py:48-61) + A7 (delta_queries.py:45-54):
    avg/min/max content length per table."""
    length = F.length(F.col(content_col))
    parts = [
        df.agg(
            F.lit(name).alias("table_name"),
            F.round(F.avg(length), ROUND_DP).alias("avg_length"),
            F.min(length).alias("min_length"),
            F.max(length).alias("max_length"),
        )
        for name, df in tables.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def missing_values(
    tables: dict[str, DataFrame], cols: tuple[str, ...] = ("content", "title")
) -> DataFrame:
    """A3 (duckdb_queries.py:68-80): COUNT(*) - COUNT(col) per column
    per table (NULL-skipping COUNT semantics match ANSI)."""
    parts = [
        df.agg(
            F.lit(name).alias("table_name"),
            *[
                (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"missing_{c}")
                for c in cols
            ],
        )
        for name, df in tables.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def word_frequency(
    df: DataFrame,
    content_col: str = "content",
    min_word_length: int = 3,
    k: int = 10,
) -> DataFrame:
    """A4 + T1 + O1 (duckdb_queries.py:98-110): explode whitespace
    tokens of lowercased content, keep words longer than
    ``min_word_length``, count, top-k by frequency.

    Tie-break by word ASC added for cross-engine determinism (the
    reference's bare ORDER BY frequency DESC is unstable).
    Scale shape: partial hash-agg on each partition before the shuffle
    (2-phase HashAggregate) — the explode never materializes globally.
    """
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(content_col)), " ", -1)).alias("word")
        )
        .filter(F.length("word") > min_word_length)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("frequency"))
        .orderBy(F.desc("frequency"), F.asc("word"))
        .limit(k)
    )


def duplicate_analysis(df: DataFrame, col: str = "content") -> DataFrame:
    """A5 (duckdb_queries.py:117-123): total vs exact-distinct counts.
    ``approximate=True`` swaps in HLL approx_count_distinct — the right
    call at 100 TB where exact COUNT(DISTINCT) is a full shuffle of the
    column."""
    return df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.countDistinct(F.col(col)).alias("unique_values"),
        (F.count(F.lit(1)) - F.countDistinct(F.col(col))).alias("duplicate_rows"),
    )


def duplicate_analysis_approx(df: DataFrame, col: str = "content") -> DataFrame:
    """A5 at scale: HLL sketch instead of exact distinct (SURVEY §2.13)."""
    return df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.approx_count_distinct(F.col(col)).alias("unique_values_approx"),
    )


def avg_length_by_group_topk(
    df: DataFrame,
    group_col: str = "source",
    content_col: str = "content",
    k: int = 5,
) -> DataFrame:
    """A6 + O2 (duckdb_queries.py:148-154): GROUP BY source, avg content
    length, top-k. Tie-break by group ASC for determinism."""
    return (
        df.groupBy(F.col(group_col))
        .agg(F.round(F.avg(F.length(F.col(content_col))), ROUND_DP).alias("avg_length"))
        .orderBy(F.desc("avg_length"), F.asc(group_col))
        .limit(k)
    )


def duplicate_rows(df: DataFrame, cols: list[str]) -> DataFrame:
    """D1 (delta_queries.py:57-62): every member of each duplicate group
    (pandas ``duplicated(keep=False)`` semantics) via a count window —
    one hash exchange on the key, no self-join."""
    w = Window.partitionBy(*[F.col(c) for c in cols])
    return (
        df.withColumn("_cnt", F.count(F.lit(1)).over(w))
        .filter(F.col("_cnt") > 1)
        .drop("_cnt")
    )


def run_custom_query(spark: SparkSession, sql: str) -> DataFrame:
    """Pass-through SQL entry (duckdb_queries.py:131-136 parity).
    Views must be registered first (sources.register_views)."""
    return spark.sql(sql)


def count_min_heavy_hitters(
    df,
    key_col: str = "user_id",
    width: int = 256,
    depth: int = 3,
    top_k: int = 20,
):
    """Engine-portable count-min sketch + heavy-hitter probe.

    The sketch is a SPARSE (row_i, bucket, count) table — depth md5
    bucket hashes per key, one partial-aggregatable groupBy — instead
    of the JVM binary ``count_min_sketch`` (which no SQL function can
    query or merge outside the JVM). Size is bounded by depth×width
    rows no matter the corpus; merging snapshots is summing counts per
    (row_i, bucket); estimating ANY key needs only this table, never
    the raw data. estimate = min over rows of the key's bucket count —
    the classic over-estimate-only CMS bound (≤ true + eps·N with
    eps ≈ e/width at confidence 1 - (1/e)^depth).

    The returned frame carries the exact top-``top_k`` keys with true
    and estimated counts side by side, so the error is visible (and
    oracle-checkable) rather than hidden behind the sketch.
    """
    from lakehouse_to_rag_spark.operators.curation import md5_bucket

    key = F.col(key_col)
    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row_i"),
                    md5_bucket(key, f"cms{i}:", width).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    )
    sketch = (
        df.select(rb.alias("rb"))
        .select("rb.row_i", "rb.bucket")
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), F.asc(key_col))
        .limit(top_k)
    )
    for i in range(depth):
        side = sketch.filter(F.col("row_i") == i).select(
            F.col("bucket").alias(f"b{i}"), F.col("c").alias(f"c{i}")
        )
        probes = probes.withColumn(
            f"b{i}", md5_bucket(key, f"cms{i}:", width)
        ).join(F.broadcast(side), f"b{i}")
    return probes.select(
        key_col,
        F.col("true_count").cast("long").alias("true_count"),
        F.least(*[F.col(f"c{i}") for i in range(depth)])
        .cast("long")
        .alias("cms_estimate"),
    )


def corpus_datacard(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source corpus DATA CARD — the summary table every dataset
    release ships (cf. 'Datasheets for Datasets', Gebru et al. 2021):
    document counts, null-text counts, whitespace-token totals, a
    deterministic median length, and exact-duplicate document counts,
    one row per ``group_col``.

    Determinism choices: the median is RANK-BASED (the value at row
    ceil(n/2) ordered by (length, id) among non-null texts — no
    interpolation, so no float quantile-convention skew between
    engines); token totals count single-space splits (the word-family
    convention); dup_docs counts documents whose md5(text) appears
    more than once WITHIN the group. The corpus is scanned ONCE into
    a narrow localCheckpointed projection (group, id, flags, length,
    tokens, md5 — the text column never leaves the scan); the three
    summaries derive from it. Joins back onto the base are NULL-SAFE
    on the group key (eqNullSafe — a NULL-source group must report
    its real median/dups, not coalesced zeros; review finding)."""
    t = F.col(text_col)
    proj = df.select(
        F.col(group_col),
        F.col(id_col),
        t.isNull().cast("long").alias("_isnull"),
        F.length(t).alias("_len"),
        F.when(t.isNotNull(), F.size(F.split(t, " ", -1)))
        .otherwise(F.lit(0))
        .alias("_tok"),
        F.md5(t).alias("_h"),
    ).localCheckpoint(eager=False)
    nn = proj.filter(F.col("_isnull") == 0)
    w = Window.partitionBy(group_col).orderBy(
        F.col("_len").asc(), F.col(id_col).asc()
    )
    med = (
        nn.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy(group_col))
        )
        .filter(F.col("_rn") == F.ceil(F.col("_n") / 2))
        .select(
            F.col(group_col).alias("_gm"),
            F.col("_len").cast("long").alias("median_len"),
        )
    )
    dups = (
        nn.groupBy(group_col, "_h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") > 1)
        .groupBy(F.col(group_col).alias("_gd"))
        .agg(F.sum("_c").alias("dup_docs"))
    )
    base = proj.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_isnull").alias("n_null_text"),
        F.sum("_tok").cast("long").alias("total_tokens"),
    )
    return (
        base.join(med, F.col(group_col).eqNullSafe(F.col("_gm")), "left")
        .join(dups, F.col(group_col).eqNullSafe(F.col("_gd")), "left")
        .select(
            group_col,
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_null_text").cast("long").alias("n_null_text"),
            "total_tokens",
            F.coalesce(F.col("median_len"), F.lit(0)).cast("long").alias("median_len"),
            F.coalesce(F.col("dup_docs"), F.lit(0)).cast("long").alias("dup_docs"),
        )
    )


def source_vocab_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-source lexical-similarity matrix: for every source pair
    (a <= b, diagonal included) the distinct-word intersection size
    and its vocabulary Jaccard — the corpus-analysis input mixing
    decisions lean on (two sources whose vocabularies barely overlap
    contribute more diversity per token than two near-identical
    crawls; the diagonal is each source's own vocabulary size, so one
    result table carries both the marginals and the interactions).

    Scale shape: the corpus reduces FIRST to distinct (source, word)
    pairs — one partial-aggregatable exchange, output bounded by
    sources x vocabulary, corpus size gone. The self-join then keys
    on word with per-word fan-out bounded by the SOURCE count squared
    (sources are a small dimension; a word present in all of them
    contributes |sources|^2 rows, never corpus-scaled) — the inverted
    index join whose skew is structurally capped, unlike document
    self-joins. Whitespace tokens, lowercased, empties dropped (the
    vocab_builder convention); Jaccard is an exact integer ratio
    rounded to 4dp. Returns (source_a, source_b, n_shared, jaccard)."""
    words = (
        df.filter(
            F.col(text_col).isNotNull() & F.col(source_col).isNotNull()
        )
        .select(
            F.col(source_col).alias("src"),
            F.explode(
                F.split(F.lower(F.col(text_col)), " ", -1)
            ).alias("word"),
        )
        .filter(F.length("word") > 0)
        .distinct()
        .localCheckpoint(eager=False)  # three consumers, one reduce
    )
    sizes = words.groupBy("src").agg(F.count(F.lit(1)).alias("n_vocab"))
    a = words.select(F.col("src").alias("source_a"), "word")
    b = words.select(F.col("src").alias("source_b"), "word")
    inter = (
        a.join(b, "word")
        .filter(F.col("source_a") <= F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = F.col("n_shared") / (
        F.col("sa.n_vocab") + F.col("sb.n_vocab") - F.col("n_shared")
    )
    return (
        inter.join(
            sizes.alias("sa"), F.col("source_a") == F.col("sa.src")
        )
        .join(sizes.alias("sb"), F.col("source_b") == F.col("sb.src"))
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(jac, ROUND_DP).alias("jaccard"),
        )
    )
