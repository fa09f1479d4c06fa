"""Skew-mitigation utilities (SURVEY.md §2.13 scale posture).

At 100 TB a single hot key (one viral URL, one bot user) turns a
groupBy into one straggler task. AQE's skew-join splitting covers
joins; for AGGREGATIONS over algebraic functions, salting is the
classic fix: aggregate on (key, salt) first — spreading the hot key
over N tasks — then combine the partials.

Only algebraic aggregates (sum/count/min/max — and avg via sum+count)
can ride this; holistic ones (exact median) cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. Stage 1 groups by (keys, salt) — the hot
    key fans out over ``num_salts`` reducers; stage 2 combines the
    partials (count combines with sum). Result is identical to the
    direct groupBy for these algebraic functions.

    Note: Spark's built-in partial aggregation already gives map-side
    combine; salting matters when the REDUCE side itself is the
    bottleneck (billions of rows for one key across many upstream
    partitions).
    """
    _stage1 = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    _stage2 = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

    salt = (F.monotonically_increasing_id() % num_salts).alias("_salt")
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*[F.col(c) for c in key_cols], F.col("_salt"))
        .agg(
            *[
                _stage1[fn](F.col(src)).alias(f"_p_{out}")
                for out, (src, fn) in aggs.items()
            ]
        )
    )
    return stage1.groupBy(*[F.col(c) for c in key_cols]).agg(
        *[
            _stage2[fn](F.col(f"_p_{out}")).alias(out)
            for out, (src, fn) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join for when AQE's skew splitting can't engage
    (e.g. the dim side is too big to broadcast but small enough to
    replicate, or a deterministic plan is required): fact rows get a
    random salt in [0, num_salts); the dim side is replicated once
    per salt value (explode of a literal range). The join key becomes
    (key, salt), spreading a hot key's rows over ``num_salts`` tasks.
    Row-for-row identical to the plain join: each fact row matches
    exactly the one dim replica carrying its salt.

    Cost: dim side is shuffled num_salts×; worth it only when one
    fact key dominates a reducer. Salt uses a per-row uniform hash of
    monotonically_increasing_id — deterministic within a run, but NOT
    across layouts (it only routes rows; results are layout-free).
    """
    salted_fact = fact.withColumn(
        "_salt", (F.monotonically_increasing_id() % num_salts).cast("int")
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = salted_fact.join(
        replicated_dim,
        (salted_fact[key] == replicated_dim[key])
        & (salted_fact["_salt"] == replicated_dim["_salt"]),
    )
    keep = [salted_fact[c] for c in fact.columns] + [
        replicated_dim[c] for c in dim.columns if c != key
    ]
    return out.select(*keep)
