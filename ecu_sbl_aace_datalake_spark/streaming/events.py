"""Event-time windowing & sessionization.

North-star extension (SURVEY.md §2.12: the reference has NO streaming
surface). These operators are written batch-first on event-time columns and
are Structured-Streaming-compatible: the same transformations run under
``readStream`` with :func:`with_watermark` applied before the window agg.

Scale design: tumbling/sliding windows and session aggregation shuffle once
on (key, window); watermarking bounds state for true streams. The lag-gap
sessionizer is a window function (one shuffle on user) for batch;
``F.session_window`` is the native streaming-state equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ensure_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Event-time watermarks require ``TimestampType``; parquet sources read
    as ``TIMESTAMP_NTZ`` (the parquet type for tz-naive data) are cast in
    place, interpreting naive timestamps in the session timezone."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Watermark wrapper — bounds state retention for late data when the
    source is a true stream; a no-op semantically in batch."""
    return ensure_event_time(df, ts_col).withWatermark(ts_col, delay)


def tumbling_agg(
    df: DataFrame,
    window_size: str = "1 hour",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    aggs: list[F.Column] | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation via ``F.window`` — identical
    code path in batch and streaming. Output includes window_start /
    window_end timestamps."""
    group_cols = group_cols or []
    aggs = aggs or [F.count("*").alias("n_events")]
    return (
        df.groupBy(F.window(ts_col, window_size).alias("__w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def sliding_agg(
    df: DataFrame,
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    aggs: list[F.Column] | None = None,
) -> DataFrame:
    """Sliding event-time window aggregation."""
    group_cols = group_cols or []
    aggs = aggs or [F.count("*").alias("n_events")]
    return (
        df.groupBy(F.window(ts_col, window_size, slide).alias("__w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Assign session ids per user via the lag-gap method: a new session
    starts when the gap to the previous event exceeds ``gap``.

    Batch implementation: two window functions over one shuffle on
    ``user_col``. Session ids are 1-based per user in time order —
    deterministic, oracle-comparable. For true streams use
    :func:`session_window_agg` (native state-store sessionization).
    """
    gap_expr = F.expr(f"INTERVAL {gap}")
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.col(ts_col).cast("timestamp") > prev_ts + gap_expr)
    ).cast("long")
    return df.withColumn("__new", new_session).withColumn(
        "session_id",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new")


def session_window_agg(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    aggs: list[F.Column] | None = None,
) -> DataFrame:
    """Native session windows (``F.session_window``) — the streaming-state
    implementation of sessionization; in batch it produces one row per
    (user, session window)."""
    aggs = aggs or [F.count("*").alias("n_events")]
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("__w"), user_col)
        .agg(*aggs)
        .withColumn("session_start", F.col("__w.start"))
        .withColumn("session_end", F.col("__w.end"))
        .drop("__w")
    )


def with_lag_lead(
    df: DataFrame,
    value_col: str,
    user_col: str = "user_id",
    ts_col: str | list[str] = "ts",
) -> DataFrame:
    """lag/lead of a value within each user's time-ordered event stream.
    Pass a list of order columns (e.g. ["ts", "event_id"]) to break
    timestamp ties deterministically."""
    order = [ts_col] if isinstance(ts_col, str) else list(ts_col)
    w = Window.partitionBy(user_col).orderBy(*order)
    return df.withColumn(f"prev_{value_col}", F.lag(value_col).over(w)).withColumn(
        f"next_{value_col}", F.lead(value_col).over(w)
    )


def parse_props(df: DataFrame, props_col: str = "props", schema: str = "k INT") -> DataFrame:
    """Parse the JSON props column into typed fields via from_json."""
    return df.withColumn("__p", F.from_json(F.col(props_col), schema)).select(
        "*", "__p.*"
    ).drop("__p")


def with_trailing_range_agg(
    df: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_seconds: int = 3600,
) -> DataFrame:
    """Trailing time-RANGE window per user: count and sum of ``value_col``
    over the last ``window_seconds`` (inclusive) ending at each event.

    A RANGE frame (not ROWS) — frame membership is by event-time distance, so
    simultaneous events are peers and every row in a tie group sees the same
    frame, making the result deterministic without a tiebreak column. Ordered
    by microsecond epoch (``unix_micros``) so the boundary is exact at the
    fixture's timestamp precision. The sum runs over ``decimal(18,6)`` to be
    association-order-independent (float sums differ by partitioning).

    Scale: one shuffle on ``user_col``; per-user state is a running window —
    Spark's WindowExec is streaming-friendly for bounded-preceding frames
    (no full-partition materialization beyond the frame).
    """
    df = ensure_event_time(df, ts_col)
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    dec = F.col(value_col).cast("decimal(18,6)")
    return df.withColumn("trailing_n", F.count(value_col).over(w)).withColumn(
        f"trailing_sum_{value_col}",
        F.round(F.sum(dec).over(w), 4).cast("double"),
    )


def with_anomaly_flags(
    df: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_seconds: int = 3600,
    sigmas: float = 3.0,
) -> DataFrame:
    """Trailing-window anomaly detection: flag events whose value deviates
    more than ``sigmas``·σ from the trailing per-user mean (inclusive
    time-RANGE frame, like :func:`with_trailing_range_agg`).

    Mean/variance derive from EXACT decimal window sums (sum, sum of
    squares) converted to double only at the end — windowed float
    accumulation differs between engines and partitionings, exact decimal
    prefix sums do not. Events with fewer than 2 trailing peers get a null
    σ and are never flagged. One shuffle on the user key; the window state
    is the trailing frame only.
    """
    df = ensure_event_time(df, ts_col)
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    # decimal(18,6): the square fits decimal(37,12) in BOTH Spark and
    # DuckDB (wider operands would overflow DuckDB's 38-digit product)
    dec = F.col(value_col).cast("decimal(18,6)")
    n = F.count(value_col).over(w)
    s1 = F.sum(dec).over(w).cast("double")
    s2 = F.sum(dec * dec).over(w).cast("double")
    nn = n.cast("double")
    mean = s1 / nn
    var = F.greatest((s2 - s1 * s1 / nn) / (nn - 1.0), F.lit(0.0))
    std = F.when(n >= 2, F.sqrt(var))
    dev = F.abs(F.col(value_col) - mean)
    return (
        df.withColumn("trailing_n", n.cast("long"))
        .withColumn("trailing_mean", F.round(mean, 4))
        .withColumn("trailing_std", F.round(std, 4))
        .withColumn(
            "is_anomaly",
            F.coalesce(dev > F.lit(sigmas) * std, F.lit(False)),
        )
    )


def funnel_stages(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel analysis: for each user, the timestamp at which each
    stage was first reached IN ORDER (stage k counts only strictly after
    stage k-1's time) and the deepest stage index reached. The standard
    product-analytics sequence query, without MATCH_RECOGNIZE (which Spark
    lacks): one groupBy(user) with conditional-min chaining — stage k's
    time is ``min(ts WHERE type = stages[k] AND ts > t_{k-1})``, built by
    iterating the aggregation k times over the SAME grouped frame (single
    shuffle; each pass is a join-free re-aggregation of the compact
    per-user event list).

    Implementation detail: per user we aggregate the (type, ts) pairs to a
    sorted array once, then resolve the stage chain with pure array
    expressions — no repeated shuffles, no per-stage joins.

    Returns one row per user: ``stage_1_ts .. stage_n_ts`` (null once the
    funnel breaks) and ``stages_reached``.

    ``within_seconds`` adds the standard CONVERSION WINDOW: stage k only
    counts if it happens within that many seconds of stage k-1 (the
    greedy first-match semantics stay: each stage takes its EARLIEST
    qualifying event, it does not backtrack to find a chain that would
    survive a later window).
    """
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("t")))
    )
    grouped = (
        df.where(F.col(type_col).isin(stages))
        .groupBy(user_col)
        .agg(pairs.alias("__evs"))
    )
    # closures, NOT default-arg lambdas: F.filter derives the lambda-var
    # count from the Python arity, and default args count toward it
    def _stage_cond(stage: str, prev):
        if prev is None:
            return lambda e: e["t"] == F.lit(stage)
        if within_seconds is not None:
            # interval arithmetic (not unix_micros) so TIMESTAMP_NTZ
            # event times work unchanged
            bound = prev + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
            return lambda e: (
                (e["t"] == F.lit(stage)) & (e["ts"] > prev) & (e["ts"] <= bound)
            )
        return lambda e: (e["t"] == F.lit(stage)) & (e["ts"] > prev)

    out_cols = [F.col(user_col)]
    prev_ts = None
    for k, stage in enumerate(stages, start=1):
        matches = F.filter(F.col("__evs"), _stage_cond(stage, prev_ts))
        stage_ts = F.when(F.size(matches) > 0, F.element_at(matches, 1)["ts"])
        grouped = grouped.withColumn(f"stage_{k}_ts", stage_ts)
        out_cols.append(F.col(f"stage_{k}_ts"))
        prev_ts = F.col(f"stage_{k}_ts")
    # deepest stage wins: chain whens from the LAST stage down so the
    # first matching (deepest) branch returns before shallower ones
    reached = F.when(F.col(f"stage_{len(stages)}_ts").isNotNull(), len(stages))
    for k in range(len(stages) - 1, 0, -1):
        reached = reached.when(F.col(f"stage_{k}_ts").isNotNull(), k)
    reached = reached.otherwise(0)
    return grouped.select(*out_cols, reached.cast("long").alias("stages_reached"))


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity
    period (cohort), counted as retained in every later period they were
    active. Classic growth analytics: one window for the per-user cohort,
    one distinct aggregation per (cohort, period_offset).

    Returns ``(cohort, period_offset, n_users)`` with offset 0 = the
    cohort's own period (so n_users at offset 0 is the cohort size).
    """
    from pyspark.sql import Window

    trunc = F.date_trunc(period, F.col(ts_col))
    w = Window.partitionBy(user_col)
    seconds = {"week": 7 * 86400, "day": 86400}[period]
    with_cohort = df.select(
        F.col(user_col),
        trunc.alias("__p"),
    ).withColumn("__cohort", F.min("__p").over(w))
    return (
        with_cohort.select(
            F.col("__cohort").alias("cohort"),
            ((F.unix_timestamp("__p") - F.unix_timestamp("__cohort")) / seconds)
            .cast("long")
            .alias("period_offset"),
            F.col(user_col),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )


def throttle_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    min_gap_seconds: int = 300,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Event throttling / burst dedup: within each key, drop an event that
    arrives less than ``min_gap_seconds`` after the PREVIOUS RAW event of
    the same key (the standard ``lag``-based formulation — deterministic,
    one window, no iteration; an "anchor on previous KEPT event" variant
    is inherently sequential and belongs in stateful streaming).

    The first event of each key always survives. One shuffle on the key.
    ``tiebreak_cols`` make the within-timestamp order deterministic when
    duplicate timestamps exist (defaults to the key + ts only).
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_ok = (
        prev_ts.isNull()
        | (
            F.col(ts_col).cast("double") - prev_ts.cast("double")
            >= F.lit(float(min_gap_seconds))
        )
    )
    return df.withColumn("__keep", gap_ok).where(F.col("__keep")).drop("__keep")


def transition_matrix(
    df: DataFrame,
    state_col: str,
    user_col: str = "user_id",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """First-order Markov transition counts and probabilities over each
    user's ordered event stream: for every observed (state, next_state)
    pair, how often it occurs and its share of the state's outgoing
    transitions.

    One window partitioned BY USER (bounded per-partition work at any
    scale) + one aggregate; probabilities via a window over the tiny
    per-state groups. Terminal events (no successor) are excluded.
    Output: ``(from_state, to_state, n, p)`` with p rounded to 6dp.
    """
    order = order_cols or ["ts"]
    w = Window.partitionBy(user_col).orderBy(*order)
    steps = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
    )
    counts = steps.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("p"),
    )


def trending_counts(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
    min_prev: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Window-over-window trend detection: per (type, bucket) event count
    plus the ratio to the PREVIOUS bucket's count — the batch twin of a
    streaming trending-topics job. Buckets with no predecessor or a
    predecessor below ``min_prev`` return a null ratio rather than an
    explosive division.

    Shape: one partial-aggregated shuffle to (type, bucket) counts, then
    a lag window over the tiny per-type bucket series. Deterministic:
    counts are exact; the ratio is one double division.
    """
    if bucket == "day":
        b = F.col(ts_col).cast("date")
    elif bucket == "hour":
        b = F.date_trunc("hour", F.col(ts_col))
    else:
        raise ValueError(f"unknown bucket {bucket!r} (day|hour)")
    counts = df.groupBy(F.col(type_col).alias("type"), b.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("type").orderBy("bucket")
    prev = F.lag("n").over(w)
    ratio = F.when(
        prev >= min_prev, F.col("n").cast("double") / prev.cast("double")
    )
    return counts.select(
        "type", "bucket", "n",
        prev.alias("n_prev"),
        F.round(ratio, round_to).alias("trend_ratio"),
    )
