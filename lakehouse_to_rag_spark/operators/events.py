"""Event-stream analytics (batch over the `events` table; the same
logic re-expressed incrementally lives in streaming/).

Covers time bucketing, sessionization (gap-based), per-user top-k, JSON
prop extraction, and pivot-style conditional aggregation. Timestamp
outputs are formatted to strings so results are engine-portable
(SURVEY.md §5.2 determinism discipline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_SECONDS = 30 * 60


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour rollup per event type: count + total value.
    2-phase hash aggregate; the hour bucket is computed pre-shuffle."""
    hour = F.date_format(
        F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00:00"
    ).alias("hour")
    return events.groupBy(hour, F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def sessionize(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_seconds``.
    Returns per-user session counts.

    One hash exchange on user_id feeds both the lag window and the
    final groupBy (same partitioning, Catalyst reuses the exchange).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(
        prev_us.isNull()
        | (F.unix_micros(F.col("ts")) - prev_us > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    return (
        events.select("user_id", "ts", "event_id")
        .withColumn("is_new", is_new)
        .groupBy("user_id")
        .agg(F.sum("is_new").cast("long").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events"))
    )


def top_users_by_value(
    events: DataFrame, event_type: str = "purchase", k: int = 10
) -> DataFrame:
    """Filter (pushed to the scan) → groupBy user → deterministic top-k
    (rank on rounded total, id tie-break) via TakeOrderedAndProject."""
    return (
        events.filter(F.col("event_type") == event_type)
        .groupBy("user_id")
        .agg(
            F.round(F.sum("value"), 4).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(k)
    )


def props_rollup(events: DataFrame) -> DataFrame:
    """Extract the integer prop `k` from the JSON props column and
    aggregate per event type (get_json_object is codegen'd JSON path
    evaluation — no UDF)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(k).alias("n_with_k"),
    )


def type_pivot_daily(events: DataFrame) -> DataFrame:
    """Per-day conditional-aggregation pivot: one column per event type.
    Written as sum(case when ...) — portable and single-pass."""
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    counts = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
        .cast("long")
        .alias(f"n_{t}")
        for t in ["click", "view", "purchase", "signup", "error"]
    ]
    return events.groupBy(day).agg(*counts)
