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


def variant_props_rollup(events: DataFrame) -> DataFrame:
    """Semi-structured path via VariantType (Spark 4): ``parse_json``
    materializes the JSON props as a binary variant — a single parse
    per row, after which any number of typed ``variant_get``
    extractions are O(field) binary probes instead of re-running a
    JSON parser per path (the reason Variant beats get_json_object
    when >1 field is read at 100 TB). ``try_variant_get`` returns
    NULL on type mismatch instead of raising under ANSI mode."""
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "long")
    return (
        events.withColumn("k", k)
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.max("k").alias("max_k"),
        )
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


def asof_latest_prior(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
) -> DataFrame:
    """As-of join: for each ``left_type`` event, the most recent
    ``right_type`` event of the same user at-or-before its timestamp
    (>= semantics, like SQL ASOF JOIN).

    Spark has no native as-of join; the scalable shape is the
    union-and-carry trick: tag both streams, sort within user, and
    carry the last right-side row forward with last(..., ignorenulls)
    — ONE shuffle on user_id and a linear pass, instead of the
    quadratic join+filter+row_number formulation.
    """
    r = events.filter(F.col("event_type") == right_type).select(
        "user_id",
        "ts",
        F.col("event_id"),
        F.col("event_id").alias("right_id"),
        F.lit(0).alias("tag"),
    )
    l = events.filter(F.col("event_type") == left_type).select(
        "user_id",
        "ts",
        F.col("event_id"),
        F.lit(None).cast("long").alias("right_id"),
        F.lit(1).alias("tag"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last(
        F.when(F.col("tag") == 0, F.struct("ts", "right_id")), ignorenulls=True
    ).over(w)
    return (
        r.unionByName(l)
        .withColumn("prior", carried)
        .filter(F.col("tag") == 1)
        .select(
            F.col("event_id"),
            F.col("user_id"),
            F.col("prior.right_id").alias("prior_click_id"),
            # exact integer micros, not rounded float seconds: a gap
            # landing on a 4dp rounding midpoint makes HALF_UP (Spark,
            # decimal-string based) and C round (DuckDB, x*10^4 on the
            # double) disagree in the last digit
            (F.unix_micros("ts") - F.unix_micros("prior.ts")).alias("gap_us"),
        )
    )


def user_value_deltas(events: DataFrame) -> DataFrame:
    """Per-user value delta vs previous event (lag analytic window)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.col("value") - F.lag("value").over(w)
    return events.select(
        "event_id", "user_id", F.round(delta, 4).alias("value_delta")
    )


def rolling_hour_avg(events: DataFrame) -> DataFrame:
    """Per-user trailing 1-hour average value: a RANGE window frame
    ordered by epoch micros (numeric range frames are engine-portable;
    interval frames are not)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("avg_value_1h"),
    )


def session_intervals(
    events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """Materialize per-user session INTERVALS (session_id, start, end)
    from the gap-based sessionization — the right-hand side for range
    joins. One shuffle on user_id; the session id is a running sum of
    session starts (same window partitioning, exchange reused)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(
        prev_us.isNull()
        | (F.unix_micros(F.col("ts")) - prev_us > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.select("user_id", "ts", "event_id")
        .withColumn("session_seq", F.sum(is_new).over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def tag_events_with_session(
    events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """Range join: every event tagged with the session interval that
    contains it (e.ts BETWEEN s.start AND s.end, same user).

    Implemented as an equi-join on user_id with the BETWEEN as a join
    residual — at scale the equi-key bounds the fan-out (a user's
    events only meet that user's sessions). For interval tables
    WITHOUT an equi key, bucket both sides by time window first
    (bucketed range join) so the theta condition never becomes a
    cross product.
    """
    s = session_intervals(events, gap_seconds)
    return (
        events.alias("e")
        .join(
            s.alias("s"),
            (F.col("e.user_id") == F.col("s.user_id"))
            & (F.col("e.ts") >= F.col("s.session_start"))
            & (F.col("e.ts") <= F.col("s.session_end")),
        )
        .select(
            F.col("e.event_id"),
            F.col("e.user_id"),
            F.col("s.session_seq").cast("long").alias("session_seq"),
            F.col("s.n_events").alias("session_size"),
        )
    )


def multi_resolution_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style continuous-aggregate shape: one pass computing
    hour/day/month rollups via grouping sets (a single expand +
    2-phase agg — no three separate scans)."""
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00:00")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    month = F.date_format(F.date_trunc("month", F.col("ts")), "yyyy-MM")
    base = events.select(
        hour.alias("bucket_hour"), day.alias("bucket_day"), month.alias("bucket_month"),
        "value",
    )
    return (
        base.groupingSets(
            [["bucket_hour"], ["bucket_day"], ["bucket_month"]],
            "bucket_hour", "bucket_day", "bucket_month",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def running_anomalies_batch(
    events: DataFrame,
    z_threshold: float = 3.0,
    min_history: int = 10,
) -> DataFrame:
    """Batch twin of streaming.anomaly.running_anomalies: per-user
    running mean/variance over all PRIOR events (rows frame ending at
    -1 — the current row never contributes to its own baseline),
    z-score and anomaly flag. One hash exchange on user_id; the
    running aggregates are a single sequential window pass."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum("value").over(w)
    s2 = F.sum(F.col("value") * F.col("value")).over(w)
    mean = s / n
    var = F.greatest(s2 / n - mean * mean, F.lit(0.0))
    std = F.sqrt(var)
    z = F.when(
        (n >= min_history) & (std > 0), (F.col("value") - mean) / std
    ).otherwise(F.lit(0.0))
    return events.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.round(z, 4).alias("zscore"),
        ((F.abs(z) > z_threshold) & (n >= min_history)).alias("is_anomaly"),
    )


def scd2_dimension(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 build from a change stream —
    the lakehouse dimensional-modeling staple the warehouse side of a
    medallion architecture serves: collapse each key's event history
    to its CHANGE POINTS (consecutive runs of an equal attribute merge
    into one validity interval) and emit one row per version with
    [valid_from, valid_to) interval semantics, ``valid_to`` NULL on
    the open current version, plus ``is_current`` and a 1-based
    ``version`` ordinal.

    Scale shape: ONE hash exchange on the key; both passes (the
    lag-based change detection and the lead-based interval close) are
    sequential window scans inside that same partitioning — Spark
    reuses the exchange (no second shuffle), nothing global, no
    driver state. Same-timestamp events order deterministically by
    ``tiebreak_col``. Timestamps are formatted to strings
    (engine-portable, the events.py convention)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = (
        events.withColumn("_prev", F.lag(attr_col).over(w))
        .filter(
            F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev"))
        )
        .select(key_col, attr_col, ts_col, tiebreak_col)
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    fmt = "yyyy-MM-dd HH:mm:ss"
    nxt = F.lead(ts_col).over(w2)
    return changed.select(
        F.col(key_col),
        F.col(attr_col),
        F.date_format(ts_col, fmt).alias("valid_from"),
        F.date_format(nxt, fmt).alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


def scd2_enrich(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    fact_id_col: str = "event_id",
    attr_col: str = "event_type",
    how: str = "inner",
) -> DataFrame:
    """Fact-to-SCD2 enrichment — the interval join every Type-2
    dimension exists to serve: each fact row picks the dimension
    version whose [valid_from, valid_to) contains its timestamp.
    ``dim`` is ``scd2_dimension`` output (``attr_col`` names the
    attribute column it was built with); the formatted-string
    timestamps compare lexicographically (the format is
    zero-padded, so string order == time order), and the half-open
    interval makes the match EXACTLY one version per fact (a fact at
    a change point belongs to the version it opened).

    ``how`` is the unmatched-fact policy: ``"inner"`` (default, the
    gated form) drops facts whose key has no covering dimension
    version; ``"left"`` keeps them with NULL attribute/version — the
    merge_asof-parity choice a production fact table with
    LATE-ARRIVING dimension keys needs, where the inner form would
    silently lose rows (ADVICE r9: the interval predicate lives in
    the join condition, not a post-filter, so left rows survive).

    Scale shape: one equi-join on the key with the interval predicate
    as a residual join condition — per-key version counts are small
    (change points, not events), so the join fan-out is bounded; no
    range partitioning needed. Returns the fact id/key + the matched
    version's attribute/ordinal."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"scd2_enrich: how must be 'inner' or 'left', got {how!r}"
        )
    f = facts.select(
        F.col(fact_id_col),
        F.col(key_col),
        F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss").alias("_fts"),
    ).alias("f")
    d = dim.select(
        F.col(key_col).alias("_dkey"),
        F.col(attr_col).alias("active_type"),
        "valid_from",
        "valid_to",
        "version",
    ).alias("d")
    cond = (
        (F.col(f"f.{key_col}") == F.col("d._dkey"))
        & (F.col("f._fts") >= F.col("d.valid_from"))
        & (
            F.col("d.valid_to").isNull()
            | (F.col("f._fts") < F.col("d.valid_to"))
        )
    )
    return f.join(d, cond, how).select(
        F.col(f"f.{fact_id_col}").alias(fact_id_col),
        F.col(f"f.{key_col}").alias(key_col),
        F.col("f._fts").alias("ts"),
        "active_type",
        "version",
    )


def scd2_from_snapshots(
    snapshots: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    snap_col: str = "snap_day",
) -> DataFrame:
    """SCD2 build from PERIODIC FULL SNAPSHOTS — the other way
    dimensions arrive in a lakehouse (a daily dump of current state
    rather than a change stream): per key, consecutive snapshots with
    an unchanged attribute collapse into one validity interval;
    ``valid_from`` is the first snapshot showing the value,
    ``valid_to`` the first snapshot showing a different one
    (half-open, NULL-open current — identical contract to
    ``scd2_dimension``, so the same ``scd2_enrich`` consumes both).
    A key ABSENT from later snapshots keeps its last version open:
    full-snapshot absence means deletion in some models — use
    ``scd2_from_snapshots_with_deletes`` when absence must close the
    interval (tombstone semantics).

    The change detection is the identical lag-window collapse as the
    change-stream form — one hash exchange on the key, both window
    passes inside it; snapshot grain (the ``snap_col`` values) is
    whatever the caller materialized, no calendar assumption."""
    w = Window.partitionBy(key_col).orderBy(snap_col)
    # same lazy duplicate-(key, snap) fail-close as the tombstone
    # form: a doubled snapshot row makes the window order (hence the
    # collapse) nondeterministic — raise at execution instead. The
    # raise branch casts to the ATTRIBUTE's own type (ADVICE r10): a
    # "string" cast here forced when/otherwise common-type resolution
    # to string, silently coercing lag(attr) — changing the typing of
    # the attr != _prev change detection for non-string attrs and
    # failing analysis outright for array/struct attrs.
    dup = F.when(
        F.lag(snap_col).over(w) == F.col(snap_col),
        F.raise_error(
            F.concat(
                F.lit(
                    "scd2_from_snapshots: duplicate "
                    f"({key_col}, {snap_col}) row for key "
                ),
                F.col(key_col).cast("string"),
            )
        ).cast(snapshots.schema[attr_col].dataType),
    ).otherwise(F.lag(attr_col).over(w))
    changed = (
        snapshots.withColumn("_prev", dup)
        .filter(
            F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev"))
        )
        .select(key_col, attr_col, snap_col)
    )
    w2 = Window.partitionBy(key_col).orderBy(snap_col)
    nxt = F.lead(snap_col).over(w2)
    return changed.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(snap_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


def scd2_from_snapshots_with_deletes(
    snapshots: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    snap_col: str = "snap_day",
) -> DataFrame:
    """SCD2 from periodic full snapshots with TOMBSTONE semantics —
    the delete-closing completion of the dimensional family's
    contract (``scd2_from_snapshots`` documents "absent key stays
    open"; many models read full-snapshot absence as DELETION): a key
    missing from a later snapshot has its open interval CLOSED at the
    first snapshot it is absent from, and a key that REAPPEARS after
    absence opens a brand-new version (version ordinals keep
    counting), leaving an uncovered hole between — the interval
    tiling matches observed presence exactly, property-tested: every
    (key, snapshot) present in the input is covered by exactly one
    version's [valid_from, valid_to), every absent grid snapshot by
    none.

    Engine shape: the global snapshot GRID (the distinct ``snap_col``
    values — bounded by calendar cadence, never by data volume) is
    collapsed to ONE sorted-array row and broadcast, so each row
    finds the grid snapshot after its own with ``try_element_at``
    (NULL past the end — no single-partition window, no ANSI
    out-of-bounds trap); then one hash exchange on the key carries
    all three window passes (change/gap marking, running version +
    valid_from carry, run-end detection) — the
    ``scd2_dimension`` discipline. A version run ends at an attribute
    change, a presence gap, or end of history; in the first two cases
    ``valid_to`` IS the run-end row's next grid snapshot (the change
    point / the deletion point), in the third it is NULL-open —
    which also means ``is_current`` is true only for keys present at
    the FINAL snapshot."""
    grid = snapshots.select(
        F.sort_array(F.collect_set(snap_col)).alias("_grid")
    )
    s = snapshots.join(F.broadcast(grid))
    nxt_snap = F.try_element_at(
        "_grid",
        (F.array_position("_grid", F.col(snap_col)) + F.lit(1)).cast("int"),
    )
    s = s.select(
        F.col(key_col), F.col(attr_col), F.col(snap_col),
        nxt_snap.alias("_nxt_snap"),
    )
    w = Window.partitionBy(key_col).orderBy(snap_col)
    prev_snap = F.lag(snap_col).over(w)
    prev_attr = F.lag(attr_col).over(w)
    prev_nxt = F.lag("_nxt_snap").over(w)
    marked = s.withColumn(
        "_new",
        # a duplicated (key, snap) row is a malformed "full snapshot"
        # (two states for one key at one instant) whose window order —
        # and therefore the whole tiling — would be nondeterministic:
        # fail closed LAZILY via raise_error on adjacent duplicates,
        # which rides the existing lag and costs nothing on valid data
        F.when(
            prev_snap == F.col(snap_col),
            F.raise_error(
                F.concat(
                    F.lit(
                        "scd2_from_snapshots_with_deletes: duplicate "
                        f"({key_col}, {snap_col}) row for key "
                    ),
                    F.col(key_col).cast("string"),
                )
            ).cast("int"),
        )
        .when(
            prev_snap.isNull()
            | (F.col(attr_col) != prev_attr)
            | (prev_nxt != F.col(snap_col)),  # presence gap: deletion
            F.lit(1),
        )
        .otherwise(F.lit(0)),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    runs = marked.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(snap_col),
        F.col("_nxt_snap"),
        F.sum("_new").over(wc).cast("long").alias("_version"),
        F.last(
            F.when(F.col("_new") == 1, F.col(snap_col)), ignorenulls=True
        ).over(wc).alias("_valid_from"),
        F.lead("_new").over(w).alias("_nxt_new"),
    )
    return runs.filter(
        F.col("_nxt_new").isNull() | (F.col("_nxt_new") == 1)
    ).select(
        F.col(key_col),
        F.col(attr_col),
        F.col("_valid_from").alias("valid_from"),
        F.col("_nxt_snap").alias("valid_to"),
        F.col("_nxt_snap").isNull().alias("is_current"),
        F.col("_version").alias("version"),
    )


def sessionize_capped(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    max_duration_seconds: int = 4 * 3600,
) -> DataFrame:
    """Gap-based sessionization with a MAX-DURATION cap — the
    production refinement plain gap sessions lack: a bot or
    long-lived tab that never pauses ``gap_seconds`` produces one
    unbounded session; here a session also splits at fixed
    ``max_duration_seconds`` epochs from its own start. Epochs are
    FIXED from the session start (split at start+cap, start+2·cap,
    ...), not rolling-restart — the rolling form re-anchors the clock
    at each split, a sequential recurrence no window expresses; the
    fixed-epoch form is the standard scalable choice and is stated so
    a consumer knows which contract they get.

    Plan: the gap sessionize's running-sum window, then the session
    start via one more window over the SAME (user, ts) partitioning —
    Spark reuses the single exchange. session_id embeds the sub-epoch
    so downstream group-bys need one key. Returns events +
    (session_seq, session_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = (
        F.when(prev_ts.isNull(), F.lit(1))
        .when(
            F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
            > gap_seconds,
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    sess = events.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    ws = Window.partitionBy("user_id", "session_seq")
    start = F.min(F.unix_timestamp("ts")).over(ws)
    epoch = (
        (F.unix_timestamp("ts") - start) / F.lit(max_duration_seconds)
    ).cast("long")
    return sess.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "session_seq",
        F.concat_ws(
            "-",
            F.col("user_id").cast("string"),
            F.col("session_seq").cast("string"),
            epoch.cast("string"),
        ).alias("session_id"),
    )


def scd2_apply_changes(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    check_order: bool = True,
) -> DataFrame:
    """Incremental SCD2 maintenance — the dimensional twin of the
    index appends: fold a NEW change batch into an existing Type-2
    dimension without rebuilding history. Closed versions pass
    through untouched; each affected key's OPEN version seeds the
    collapse of the new events (so a batch whose first change repeats
    the open attribute creates NO new version — the run merges across
    the batch boundary exactly as a full rebuild would); version
    ordinals continue from the open version's. The defining property,
    equality-tested AND the basis of the gated entry's oracle:

        apply_changes(scd2(history < t), events >= t)
            == scd2(full history)   row for row.

    CONTRACT: batch events must be strictly later than every affected
    open version's valid_from (the suffix property a CDC feed
    provides). ``check_order=True`` fail-closes with one bounded
    aggregate join BEFORE any output; pass False only when the feed
    guarantees ordering upstream. Ordering inside the merge uses the
    RAW timestamp and the RAW tiebreak column (any orderable type —
    never cast), formatting to the interval strings only at output:
    the formatted-string ordering an earlier draft used silently
    broke the apply==rebuild invariant on sub-second feeds (two
    same-second events whose raw order differs from id order) and
    made same-ts ordering nondeterministic for non-numeric ids (the
    long cast NULLed them) — ADVICE r9. One residual precision limit
    is inherent to the string-interval contract itself: the dim
    stores second-truncated valid_from, so an out-of-order batch
    event landing in the SAME second as (but before) the open
    version's true change point is undetectable by ``check_order`` —
    exactly as undetectable as it is in the full rebuild's output.
    At 100 TB the batch is bounded and
    history is touched only on affected keys (one semi/anti join
    pair) — the dimension is never rebuilt. The advantage is
    I/O-shaped and BATCH-PROPORTIONAL (probed, SCALE.md r9): with a
    0.1% CDC batch the apply beats the rebuild even at local[32];
    with a bulk batch (~40% of history) the three dim-sized joins
    cost more than the rebuild's single window pass — for backfills,
    rebuild with ``scd2_dimension``."""
    fmt = "yyyy-MM-dd HH:mm:ss"
    tb_type = changes.schema[tiebreak_col].dataType
    affected = changes.select(F.col(key_col)).distinct()
    untouched = dim.join(affected, key_col, "left_anti")
    d_aff = dim.join(affected, key_col, "left_semi")
    closed = d_aff.filter(~F.col("is_current"))
    open_v = d_aff.filter(F.col("is_current"))
    ev = changes.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("_rts"),
        F.col(tiebreak_col).alias("_tb"),
        F.lit(1).alias("_is_new"),
    )
    if check_order:
        bad = (
            ev.groupBy(key_col).agg(F.min("_rts").alias("_first"))
            .join(open_v.select(key_col, "valid_from"), key_col)
            .filter(F.col("_first") <= F.to_timestamp("valid_from"))
            .count()
        )
        if bad:
            raise ValueError(
                f"scd2_apply_changes: {bad} key(s) have batch events at "
                "or before their open version's valid_from — the batch "
                "is not a strict suffix of history. Rebuild with "
                "scd2_dimension, or fix the feed ordering."
            )
    seed = open_v.select(
        F.col(key_col),
        F.col(attr_col),
        F.to_timestamp("valid_from").alias("_rts"),
        # NULL (asc = NULLS FIRST) — the seed already sorts before any
        # batch event via _is_new; the tiebreak never compares across
        # the seed/event boundary, so no sentinel value (and no cast
        # of the caller's id type) is needed
        F.lit(None).cast(tb_type).alias("_tb"),
        F.lit(0).alias("_is_new"),
        F.col("version").alias("_base"),
    )
    ev = ev.withColumn("_base", F.lit(None).cast("long"))
    merged = seed.unionByName(ev)
    w = Window.partitionBy(key_col).orderBy("_rts", "_is_new", "_tb")
    kept = (
        merged.withColumn("_prev", F.lag(attr_col).over(w))
        .filter(
            F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev"))
        )
    )
    w2 = Window.partitionBy(key_col).orderBy("_rts", "_is_new", "_tb")
    base = Window.partitionBy(key_col)
    nxt = F.lead("_rts").over(w2)
    rebuilt = kept.select(
        F.col(key_col),
        F.col(attr_col),
        F.date_format("_rts", fmt).alias("valid_from"),
        F.date_format(nxt, fmt).alias("valid_to"),
        nxt.isNull().alias("is_current"),
        (
            F.row_number().over(w2)
            # keys with a seed continue its ordinal; new keys start at 1
            + F.coalesce(F.max("_base").over(base), F.lit(1)) - F.lit(1)
        ).cast("long").alias("version"),
    )
    return untouched.unionByName(closed).unionByName(rebuilt)


def asof_nearest(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    direction: str = "nearest",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join with DIRECTION and TOLERANCE — the full pandas
    ``merge_asof`` surface over the union-and-carry shape
    (``asof_latest_prior`` is the backward special case): for each
    ``left_type`` event, the matched ``right_type`` event is the
    latest at-or-before (``backward``), earliest at-or-after
    (``forward``), or the closer of the two with backward winning
    exact-distance ties (``nearest`` — the pandas convention).
    ``tolerance_seconds`` NULLs the match beyond the bound instead of
    dropping the row (merge_asof parity: every left row survives).

    Scale shape: ONE shuffle on user_id; backward and forward carries
    are two window passes over the SAME tagged union and the same
    partitioning (exchange reused — the quadratic join+filter+rank
    formulation never appears). Returns (event_id, user_id, right_id
    nullable, gap_us signed: right ts minus left ts)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_nearest: direction must be backward|forward|nearest, "
            f"got {direction!r}"
        )
    if left_type == right_type:
        # degenerate: every event lands in BOTH union branches, so
        # each left row trivially matches itself at gap 0 — fail loud
        # instead of returning meaningless output (ADVICE r9)
        raise ValueError(
            f"asof_nearest: left_type == right_type ({left_type!r}) — "
            "every row would match itself at gap 0; pick distinct types"
        )
    r = events.filter(F.col("event_type") == right_type).select(
        "user_id", "ts", "event_id",
        F.col("event_id").alias("right_id"),
        F.lit(0).alias("tag"),
    )
    left = events.filter(F.col("event_type") == left_type).select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("long").alias("right_id"),
        F.lit(1).alias("tag"),
    )
    u = r.unionByName(left)
    # backward: last right at-or-before (right sorts first on ts ties
    # via tag asc). forward: first right at-or-after — same pass over
    # the reverse order (tag desc puts the left row first on ties so a
    # same-ts right still counts as "after", matching >= / <=).
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        # tag ASC inside the desc scan: a same-ts right must sort
        # BEFORE the left row so equal timestamps count as "at-or-
        # after" (>= semantics), mirroring the backward window
        .orderBy(F.desc("ts"), F.asc("tag"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rstruct = F.when(F.col("tag") == 0, F.struct("ts", "right_id"))
    prior = F.last(rstruct, ignorenulls=True).over(wb)
    nxt = F.last(rstruct, ignorenulls=True).over(wf)
    lm = F.col("_l")
    gap_b = F.unix_micros("prior.ts") - lm      # <= 0
    gap_f = F.unix_micros("nxt.ts") - lm        # >= 0
    if direction == "backward":
        rid, gap = F.col("prior.right_id"), gap_b
    elif direction == "forward":
        rid, gap = F.col("nxt.right_id"), gap_f
    else:  # nearest: closer wins, backward breaks exact ties; a null
        # side must NOT fall through to the other in the pure-
        # direction forms (only nearest may substitute)
        pick_b = F.col("prior").isNotNull() & (
            F.col("nxt").isNull() | (-gap_b <= gap_f)
        )
        rid = F.when(pick_b, F.col("prior.right_id")).otherwise(
            F.col("nxt.right_id")
        )
        gap = F.when(pick_b, gap_b).otherwise(gap_f)
    if tolerance_seconds is not None:
        # long arithmetic: 3600 * 1e6 overflows int32 under ANSI mode
        within = (
            F.abs(gap)
            <= F.lit(tolerance_seconds).cast("long") * F.lit(1_000_000)
        )
        rid = F.when(within, rid)
        gap = F.when(within, gap)
    return (
        u.withColumn("_l", F.unix_micros("ts"))
        .withColumn("prior", prior)
        .withColumn("nxt", nxt)
        .filter(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            rid.alias("right_id"),
            gap.alias("gap_us"),
        )
    )
