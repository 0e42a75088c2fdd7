"""Time-series operators: resample, gap-fill (LOCF / linear interpolation),
gaps-and-islands detection, and keep-latest-per-key compaction.

North-star extension — the reference engine (see SURVEY.md §2.12/§2.13:
`/root/reference/ecu/sbl/aace/datalake/common.py` has no time-series
surface) stops at star-schema mapping; a metric/telemetry lakehouse needs
regular-grid resampling and gap repair as first-class relational operators.

Scale design (100 TB posture):

* ``resample`` is a single partial-aggregated shuffle on
  ``(keys, bucket)`` — the bucket is a pure column expression, so the
  pre-aggregation happens map-side and only one row per (key, bucket) per
  input partition crosses the wire.
* ``gap_fill`` builds the per-key spine from a ``groupBy(keys)`` bounds
  aggregate (tiny — one row per key) and explodes ``F.sequence`` map-side;
  the spine join and the fill windows share the same ``keys`` partitioning,
  so AQE coalesces them into one exchange chain. Window frames are
  bounded-preceding/following — WindowExec streams them without
  materializing whole partitions.
* ``latest_by_key`` is ``max_by(struct(..))`` — an aggregate, NOT a
  ``ROW_NUMBER() = 1`` window: partial aggregation reduces each partition
  to one candidate row per key before the shuffle, where the window form
  must shuffle and sort every input row. At 100 TB of upsert history this
  is the difference between a compaction that reads fast and one that
  spills.
* ``islands`` needs a per-key ordered pass (lag + running sum) — one
  shuffle on ``keys``; per-key series must fit a task's window state,
  which holds whenever a single entity's event history fits an executor
  (salt the key upstream if a single key is pathological).

All timestamp arithmetic runs through ``unix_micros``/``date_trunc`` on a
session whose timezone `sources.io.load_table` has pinned to UTC, so
wall-clock semantics match tz-naive oracles (DuckDB) exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "time_bucket",
    "resample",
    "gap_fill",
    "islands",
    "latest_by_key",
    "trailing_distinct_count",
    "ewma",
    "merge_intervals",
    "event_path_ngrams",
    "autocorrelation",
    "cusum_scores",
    "seasonal_anomaly",
    "seasonal_naive_backtest",
    "interarrival_stats",
    "twap",
    "ohlc_bars",
    "attribution_touchpoints",
    "sessionize_capped",
]


def time_bucket(ts_col: Column | str, step_seconds: int) -> Column:
    """Floor a timestamp to a ``step_seconds`` grid (epoch-aligned).

    Pure column expression (whole-stage-codegen friendly); equivalent to
    DuckDB ``time_bucket(INTERVAL n seconds, ts)`` on a UTC-pinned session.
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    step_us = int(step_seconds) * 1_000_000
    return F.timestamp_micros(
        (F.floor(F.unix_micros(ts) / F.lit(step_us)) * F.lit(step_us)).cast("long")
    )


def resample(
    df: DataFrame,
    ts_col: str = "ts",
    step_seconds: int = 3600,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Downsample an event table onto a regular grid: one row per
    (``keys``, ``step_seconds``-bucket) with the given aggregates
    (default: event count + DOUBLE-safe mean of ``value``).

    One shuffle with map-side partial aggregation; no window, no join.
    """
    if aggs is None:
        aggs = [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg(F.col("value").cast("decimal(18,6)")), 6)
            .cast("double")
            .alias("avg_value"),
        ]
    bucket = time_bucket(ts_col, step_seconds).alias(bucket_col)
    return df.groupBy(*[F.col(k) for k in keys], bucket).agg(*aggs)


def gap_fill(
    df: DataFrame,
    keys: Sequence[str],
    bucket_col: str = "bucket",
    value_col: str = "avg_value",
    step_seconds: int = 3600,
    method: str = "locf",
    round_to: int = 4,
) -> DataFrame:
    """Fill missing grid points of an already-resampled frame.

    Expects one row per (``keys``, ``bucket_col``) — the output of
    :func:`resample`. Emits the dense per-key grid from each key's min to
    max bucket with:

    * ``value_col`` — observed value, or the filled value where missing;
    * ``is_filled`` — true on synthesized rows.

    ``method='locf'``: last observation carried forward.
    ``method='linear'``: linear interpolation between the nearest observed
    neighbours (interior gaps only by construction — the spine spans
    min..max observed, so every missing point has both neighbours).
    ``method='none'``: leave nulls (just densify).

    The spine derives from a one-row-per-key bounds aggregate and a
    map-side ``sequence``/``explode`` — never a driver-side loop.
    """
    if method not in ("locf", "linear", "none"):
        raise ValueError(f"unknown gap_fill method {method!r}")
    klist = list(keys)
    step = F.expr(f"interval {int(step_seconds)} seconds")
    bounds = df.groupBy(*klist).agg(
        F.min(bucket_col).alias("_mn"), F.max(bucket_col).alias("_mx")
    )
    spine = bounds.select(
        *klist, F.explode(F.sequence(F.col("_mn"), F.col("_mx"), step)).alias(bucket_col)
    )
    dense = spine.join(df, klist + [bucket_col], "left").withColumn(
        "is_filled", F.col(value_col).isNull()
    )
    if method == "none":
        return dense
    order = F.unix_micros(F.col(bucket_col))
    back = (
        Window.partitionBy(*klist)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if method == "locf":
        return dense.withColumn(
            value_col, F.last(value_col, ignorenulls=True).over(back)
        )
    fwd = (
        Window.partitionBy(*klist)
        .orderBy(order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    # carry (value, bucket) together as one struct so the neighbour's value
    # and position can never come from different rows
    obs = F.when(
        F.col(value_col).isNotNull(),
        F.struct(F.col(value_col).alias("v"), order.alias("t")),
    )
    prev = F.last(obs, ignorenulls=True).over(back)
    nxt = F.first(obs, ignorenulls=True).over(fwd)
    # interpolated doubles can land EXACTLY on a decimal half-way point
    # (inputs are 6dp decimals), where Spark's BigDecimal-exact ROUND and
    # other engines' scaled-double ROUND disagree by one ulp; the 1e-9
    # nudge resolves every half-way case upward consistently
    frac = (order - prev["t"]) / (nxt["t"] - prev["t"])
    interp = F.round(
        prev["v"] + (nxt["v"] - prev["v"]) * frac + F.lit(1e-9), round_to
    )
    return dense.withColumn(
        value_col,
        F.when(F.col(value_col).isNotNull(), F.col(value_col)).otherwise(interp),
    )


def islands(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    max_gap_seconds: int = 3600,
    value_col: str | None = "value",
) -> DataFrame:
    """Gaps-and-islands: group each key's events into maximal runs where
    consecutive events are ≤ ``max_gap_seconds`` apart; one output row per
    island with start/end/count (+ decimal-exact value sum when
    ``value_col`` is given).

    Island membership depends only on the multiset of timestamps (ties are
    trivially within-gap), so the result is deterministic under any
    partitioning. ``island_id`` is the per-key ordinal of the island.
    """
    klist = list(keys)
    order = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(*klist).orderBy(order)
    gap_us = int(max_gap_seconds) * 1_000_000
    new_island = F.when(
        F.lag(order).over(w).isNull() | (order - F.lag(order).over(w) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*klist).orderBy(order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tagged = df.withColumn("island_id", F.sum(new_island).over(run))
    aggs = [
        F.min(ts_col).alias("island_start"),
        F.max(ts_col).alias("island_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(
            F.round(F.sum(F.col(value_col).cast("decimal(18,6)")), 4)
            .cast("double")
            .alias(f"sum_{value_col}")
        )
    return tagged.groupBy(*klist, "island_id").agg(*aggs)


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep the newest row per key — upsert-log compaction.

    Implemented as ``max_by(struct(<payload>), struct(ts, tiebreak))``:
    a true aggregate with map-side partial reduction (one candidate per
    key per partition crosses the shuffle), NOT a sort-everything
    ``ROW_NUMBER() = 1`` window. The whole winning row is carried as one
    struct, so payload columns can never mix across tied rows; ties on
    ``ts_col`` break by ``tiebreak_col`` (pass a unique column for full
    determinism).
    """
    klist = list(keys)
    payload = [c for c in df.columns if c not in klist]
    ordering = (
        F.struct(F.col(ts_col), F.col(tiebreak_col))
        if tiebreak_col
        else F.col(ts_col)
    )
    packed = df.groupBy(*klist).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), ordering).alias("_row")
    )
    return packed.select(*klist, *[F.col(f"_row.{c}").alias(c) for c in payload])


def trailing_distinct_count(
    df: DataFrame,
    ts_col: str = "ts",
    entity_col: str = "user_id",
    window_days: int = 7,
    keys: Sequence[str] = (),
    out_col: str = "active_entities",
) -> DataFrame:
    """Trailing N-day DISTINCT-entity count per day (rolling active
    users) — the windowed COUNT(DISTINCT) no engine's window functions
    support natively. Instead of a per-day correlated subquery, each
    (entity, active-day) pair is deduplicated once and then FANS OUT to
    the ≤ N report days it contributes to (``sequence`` + ``explode``,
    map-side); a plain count-distinct groupBy per report day finishes the
    job.

    Scale shape: dedup shuffle on (keys, entity, day) with map-side
    combine, bounded ×N fan-out (window length, not data size), one
    count-distinct aggregate. Nothing is quadratic and no per-day
    subquery rescans the fact table — this is how rolling actives stay
    one pass at 100 TB. Report days cover only days the key actually has
    events on (join against the observed-day set) so the output matches
    the natural per-day report.
    """
    klist = list(keys)
    day = F.date_trunc("DAY", F.col(ts_col)).alias("__day")
    active = df.select(*klist, F.col(entity_col).alias("__e"), day).distinct()
    observed = df.select(*klist, day).distinct()
    step = F.expr("interval 1 day")
    contributes = active.select(
        *klist,
        "__e",
        F.explode(
            F.sequence(
                F.col("__day"),
                F.col("__day") + F.expr(f"interval {int(window_days) - 1} days"),
                step,
            )
        ).alias("__report_day"),
    )
    counted = contributes.groupBy(
        *klist, F.col("__report_day").alias("__day")
    ).agg(F.count_distinct("__e").alias(out_col))
    return observed.join(counted, klist + ["__day"]).select(
        *klist, F.col("__day").alias("report_day"), F.col(out_col)
    )


def ewma(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Sequence[str] = (),
    alpha: float = 0.3,
    window_n: int = 20,
    out_col: str = "ewma",
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Finite-window exponentially-weighted moving average per key:

    ``ewma_t = Σ_{k<K} (1-α)^k · x_{t-k} / Σ_{k<K,avail} (1-α)^k``

    The K-term truncation (default 20: (1-α)^20 < 1e-3 at α=0.3) is what
    makes EWMA a WINDOW expression instead of a sequential recurrence —
    the exact recursive form forces row-at-a-time state, while this form
    is one bounded window frame per row, runs inside whole-stage codegen,
    and is off by at most the dropped tail mass. Weights renormalize over
    the rows actually present, so early rows are plain weighted means,
    not zero-padded.

    Deterministic ordering: pass ``order_tiebreak`` columns when ``ts``
    can tie (frame contents must be reproducible for engine parity).

    Null handling: null values are ABSENT observations — they take no
    weight, don't shift neighbours' weights (the decay indexes positions
    among observed values, newest-first), and a frame of only nulls
    yields a null ``out_col``.
    """
    keys = [F.col(c) for c in key_cols]
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_tiebreak]
    w = (
        Window.partitionBy(*keys).orderBy(*order)
        .rowsBetween(-(int(window_n) - 1), 0)
    )
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    s = F.size(arr)
    # weights as LITERAL doubles, not pow() calls: libm pow differs in the
    # last ulp across engines, literals are bit-identical everywhere (and
    # cheaper). weights[k+1] = (1-α)^k; position j (1-based, frame
    # ascending: j=s is the current row) gets exponent s-j.
    weights = F.array(
        *[F.lit((1.0 - float(alpha)) ** kk) for kk in range(int(window_n))]
    )
    weighted = F.zip_with(
        arr,
        F.sequence(F.lit(1), s),
        lambda x, j: x * F.element_at(weights, s - j + 1),
    )
    num = F.aggregate(weighted, F.lit(0.0), lambda a, x: a + x)
    den = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), s), lambda j: F.element_at(weights, s - j + 1)
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    # guard s > 0: collect_list drops nulls, and sequence(1, 0) would
    # descend into element_at(weights, 0) — an all-null frame is null out
    return df.withColumn(
        out_col,
        F.when(s > 0, F.round(num / den + F.lit(1e-9), 4)),
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    min_gap: int = 0,
) -> DataFrame:
    """Union of overlapping (or within ``min_gap``) intervals per key —
    interval algebra's coalesce step (maintenance windows, user activity
    spans, reservation blocks).

    The sort-based one-pass formulation: within each key, order by start
    and open a new merged interval whenever the running maximum of
    previous ends (+ ``min_gap``) falls short of the current start; the
    group id is a running sum of those breaks. Two window passes + one
    aggregate, all PARTITIONED BY KEY — per-key work is bounded, no
    self-join (the naive overlap join is quadratic per key).

    Numeric or timestamp columns both work (comparisons only; ``min_gap``
    is in the column's own units — seconds for epoch numbers, use 0 for
    pure overlap). Output: ``(key_col, start_col, end_col, n_merged)``.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(start_col), F.col(end_col))
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_break = (
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end + F.lit(min_gap))
    ).cast("long")
    grouped = df.where(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    ).withColumn(
        "__grp",
        F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        grouped.groupBy(key_col, "__grp")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("__grp")
    )


def event_path_ngrams(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    event_col: str,
    n: int = 3,
    top: int | None = 20,
    tie_col: str | None = None,
) -> DataFrame:
    """Frequent event PATHS: per-key n-grams of consecutive events in time
    order (the order-(n-1) generalization of the first-order transition
    matrix) — the "what do users do next" sequence-mining primitive.
    Deterministic ordering: (ts, tie_col) so simultaneous events don't
    float between runs.

    One window sort per key partition (Spark fuses the n-1 leads into a
    single Window node), then a plain count with map-side partial
    aggregation — the n-gram expansion never materializes more than n-1
    extra string columns per event row. Returns ``(path, n_paths)``,
    optionally top-``top`` by (count desc, path asc) as one
    TakeOrderedAndProject.
    """
    order = [F.col(ts_col).asc()] + ([F.col(tie_col).asc()] if tie_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    steps = [F.col(event_col)] + [
        F.lead(event_col, i).over(w) for i in range(1, n)
    ]
    grams = df.select(
        F.when(steps[-1].isNotNull(), F.concat_ws(" > ", *steps)).alias("path")
    ).where(F.col("path").isNotNull())
    out = grams.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths")
    )
    if top is not None:
        out = out.orderBy(F.col("n_paths").desc(), F.col("path").asc()).limit(top)
    return out


def autocorrelation(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    max_lag: int = 3,
    tie_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-series autocorrelation function (ACF): Pearson correlation of
    the series against itself shifted by lag 1..max_lag — the seasonality
    /persistence diagnostic for metric streams.

    Shape: ONE window sort per key (Spark fuses the max_lag ``lag``
    expressions into a single Window node), an unpivot to
    ``(key, lag, v, v_lag)``, then a plain aggregate. The correlation is
    computed on aligned pairs only (lag-k series drops the first k
    points) from exact DECIMAL(18,6) moments — same bit-deterministic
    discipline as ``operators/ml.py``: float arithmetic happens once per
    (key, lag) on already-reduced sums, in a fixed expression order, so
    a DuckDB oracle matches every bit. Degenerate series (constant
    value) return null acf.

    Ordering is (ts, tie_col) — pass a unique tie column when timestamps
    can collide, otherwise lag pairing would be run-dependent.
    """
    keys = list(key_cols)
    order = [F.col(ts_col).asc()] + ([F.col(tie_col).asc()] if tie_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    carry = [ts_col] + ([tie_col] if tie_col else [])
    base = df.where(F.col(value_col).isNotNull()).select(
        *keys, *carry, F.col(value_col).cast("decimal(18,6)").alias("__v")
    )
    lag_cols = [
        F.lag("__v", k).over(w).alias(f"__v_lag{k}") for k in range(1, max_lag + 1)
    ]
    shifted = base.select(*keys, "__v", *lag_cols)
    pairs = shifted.select(
        *keys,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.col("__v").alias("v"),
                        F.col(f"__v_lag{k}").alias("vl"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("p"),
    ).select(*keys, "p.lag", "p.v", "p.vl").where(F.col("vl").isNotNull())
    agg = pairs.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("__sx"),
        F.sum("vl").alias("__sy"),
        F.sum(F.col("v") * F.col("v")).alias("__sxx"),
        F.sum(F.col("vl") * F.col("vl")).alias("__syy"),
        F.sum(F.col("v") * F.col("vl")).alias("__sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    acf = F.when(
        (var_x > 0.0) & (var_y > 0.0),
        (n * sxy - sx * sy) / (F.sqrt(var_x) * F.sqrt(var_y)),
    )
    return agg.select(
        *keys,
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        F.round(acf, round_to).alias("acf"),
    )


def cusum_scores(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    target: float,
    slack: float = 0.0,
    tie_col: str | None = None,
) -> DataFrame:
    """Tabular CUSUM change detection per series: the classic recursions

        S⁺_t = max(0, S⁺_{t-1} + (x_t − target − slack))
        S⁻_t = max(0, S⁻_{t-1} − (x_t − target + slack))

    rewritten into their closed window form (a recursion is not
    expressible as a Spark window; the prefix identity is):

        S⁺_t = M_t − min(0, min_{j≤t} M_j),  M_t = Σ_{i≤t} d_i

    i.e. a cumulative sum plus a running min — two frames over ONE sort
    per key. All state is DECIMAL(18,6)-exact: ``target``/``slack``
    become exact decimal literals and the cumulative sums are decimal,
    so results are independent of how either engine internally
    associates its windowed summation (DuckDB's segment-tree float sums
    would otherwise diverge in the low bits).

    Returns the input keys + ts + value + ``cusum_pos``/``cusum_neg``.
    At 100 TB: one shuffle on the series key; a single series must fit a
    task (the usual per-entity assumption — salt upstream if violated).
    """
    keys = list(key_cols)
    order = [F.col(ts_col).asc()] + ([F.col(tie_col).asc()] if tie_col else [])
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.lit(f"{target:.6f}").cast("decimal(18,6)")
    k = F.lit(f"{slack:.6f}").cast("decimal(18,6)")
    v = F.col(value_col).cast("decimal(18,6)")
    zero = F.lit("0").cast("decimal(28,6)")
    base = df.where(F.col(value_col).isNotNull()).withColumn(
        "__d_pos", (v - t - k).cast("decimal(28,6)")
    ).withColumn("__d_neg", (t - v - k).cast("decimal(28,6)"))
    out = (
        base.withColumn("__m_pos", F.sum("__d_pos").over(w_cum))
        .withColumn("__m_neg", F.sum("__d_neg").over(w_cum))
        .withColumn("__mn_pos", F.least(zero, F.min("__m_pos").over(w_cum)))
        .withColumn("__mn_neg", F.least(zero, F.min("__m_neg").over(w_cum)))
        .withColumn("cusum_pos", F.col("__m_pos") - F.col("__mn_pos"))
        .withColumn("cusum_neg", F.col("__m_neg") - F.col("__mn_neg"))
    )
    return out.select(*keys, ts_col, value_col, "cusum_pos", "cusum_neg")


def seasonal_anomaly(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    season: str = "hour",
    round_to: int = 6,
) -> DataFrame:
    """Seasonal-baseline anomaly scores: each point's z-score against the
    mean/std of its OWN seasonal bucket (hour-of-day or day-of-week) per
    key — the first-line detector for metrics with daily/weekly shape,
    where a global z-score would flag every rush hour.

    Shape: one aggregate builds the per-(key, bucket) baseline from
    exact decimal moments (n, Σv, Σv²); the baseline table is tiny
    (keys × 24) and joins back broadcast-style on the same key columns.
    z = (v − mean)/std is computed per row in a fixed double expression
    (population std from exact moments), so it oracles bit-for-bit.
    Buckets with n < 2 or zero variance yield null z.

    Returns input keys + ts + value + ``bucket`` + ``z``.
    """
    if season == "hour":
        bucket = F.hour(F.col(ts_col))
    elif season == "dow":
        bucket = F.dayofweek(F.col(ts_col))
    else:
        raise ValueError(f"unknown season {season!r} (hour|dow)")
    keys = list(key_cols)
    v6 = F.col(value_col).cast("decimal(18,6)")
    base = df.where(F.col(value_col).isNotNull()).withColumn("bucket", bucket)
    stats = base.groupBy(*keys, "bucket").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(v6).alias("__s"),
        F.sum(v6.cast("decimal(28,6)") * v6.cast("decimal(28,6)")).alias("__ss"),
    )
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    mean = s / n
    var = (n * ss - s * s) / (n * n)
    joined = base.join(stats, keys + ["bucket"], "left")
    z = F.when(
        (F.col("__n") >= 2) & (var > 0.0),
        (F.col(value_col).cast("double") - mean) / F.sqrt(var),
    )
    return joined.select(
        *keys, ts_col, value_col, "bucket", F.round(z, round_to).alias("z")
    )


def seasonal_naive_backtest(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    season_lag: int = 7,
    bucket: str = "day",
    round_to: int = 6,
) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each bucket's aggregate
    with the value from ``season_lag`` buckets earlier (the
    same-day-last-week baseline every real forecaster must beat) and
    score MAE/MAPE per key over the overlap.

    Shape: one resample aggregate to (key, bucket) (map-side combined),
    one lag window over the tiny per-key series, error aggregation with
    exact decimal sums (MAE exact; MAPE from 12dp-rounded per-bucket
    ratios, decimal-summed). Buckets with zero/NULL actuals are excluded
    from MAPE (division guard) but kept in MAE.
    """
    if bucket == "day":
        b = F.col(ts_col).cast("date")
    elif bucket == "hour":
        b = F.date_trunc("hour", F.col(ts_col))
    else:
        raise ValueError(f"unknown bucket {bucket!r} (day|hour)")
    keys = list(key_cols)
    per = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*keys, b.alias("__b"))
        .agg(F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__v"))
    )
    # CALENDAR lag, not row lag: an equi-join on bucket == bucket+season
    # keeps the forecast aligned to the same weekday even when buckets are
    # missing from the data (a row-offset lag silently shifts every bucket
    # after a gap onto the wrong weekday)
    unit = "DAYS" if bucket == "day" else "HOURS"
    lagged = per.select(
        *keys,
        (F.col("__b") + F.expr(f"INTERVAL {int(season_lag)} {unit}")).alias("__b"),
        F.col("__v").alias("__f"),
    )
    fc = per.join(lagged, keys + ["__b"])
    err = F.abs(F.col("__v") - F.col("__f"))
    ape = F.when(
        F.col("__v") != 0,
        F.round(
            err.cast("double") / F.abs(F.col("__v")).cast("double"), 12
        ).cast("decimal(28,12)"),
    )
    agg = fc.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(err).alias("__ae"),
        F.sum(ape).alias("__ape"),
        F.sum(F.when(F.col("__v") != 0, 1).otherwise(0)).alias("__nz"),
    )
    return agg.select(
        *keys,
        "n_buckets",
        F.round(
            F.col("__ae").cast("double") / F.col("n_buckets").cast("double"),
            round_to,
        ).alias("mae"),
        F.round(
            F.when(
                F.col("__nz") > 0,
                F.col("__ape").cast("double") / F.col("__nz").cast("double"),
            ),
            round_to,
        ).alias("mape"),
    )


def interarrival_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tie_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Inter-arrival-time profile per key: mean gap, population std, and
    the coefficient of variation (CV = std/mean) — the burstiness
    diagnostic (CV≈1 Poisson, CV>1 bursty, CV<1 regular). Gaps are exact
    microsecond integers; moments accumulate exactly; floats appear once
    per key in fixed order. Keys with < 2 events drop out (no gaps).

    One window sort per key fused with the moment aggregate's shuffle.
    """
    keys = list(key_cols)
    order = [F.col(ts_col).asc()] + ([F.col(tie_col).asc()] if tie_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (
        df.withColumn("__gap", us - F.lag(us).over(w))
        .where(F.col("__gap").isNotNull())
        .select(*keys, (F.col("__gap").cast("double") / 1e6).cast("decimal(18,6)").alias("__g"))
    )
    agg = gaps.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__g").alias("__s"),
        F.sum(
            F.col("__g").cast("decimal(28,6)") * F.col("__g").cast("decimal(28,6)")
        ).alias("__ss"),
    )
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    mean = s / n
    var = (n * ss - s * s) / (n * n)
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    cv = F.when(mean != 0.0, std / mean)
    return agg.select(
        *keys,
        F.col("__n").cast("long").alias("n_gaps"),
        F.round(mean, round_to).alias("mean_gap_s"),
        F.round(std, round_to).alias("std_gap_s"),
        F.round(cv, round_to).alias("cv"),
    )


def twap(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tie_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Time-weighted average value per key (TWAP): each observation is
    weighted by the time until the NEXT observation of the same key —
    the standard guard against sampling bias when observation density
    varies (a price sampled 100×/min must not out-vote one sampled
    1×/hour). The final observation of a key has no forward interval and
    contributes no weight (the bounded-window convention; pass an
    explicit end-of-window sentinel row to weight it).

    Exact arithmetic: weights are integer microseconds, the weighted sum
    accumulates as DECIMAL(38,6)·µs before ONE double division per key.
    One window (lead) fused with the aggregate's shuffle on the key.
    Keys with a single observation drop out. Returns
    ``(*keys, n_obs, twap, span_s)``.
    """
    keys = list(key_cols)
    order = [F.col(ts_col).asc()] + ([F.col(tie_col).asc()] if tie_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gapped = (
        df.withColumn("__w_us", F.lead(us).over(w) - us)
        .where(F.col("__w_us").isNotNull())
        .select(
            *keys,
            # DECIMAL(18,0) µs weights: 18+18+1 = 37 ≤ 38 keeps the product
            # at scale 6 in BOTH engines (a 20-digit weight would push
            # Spark past precision 38 and silently shrink the scale)
            F.col("__w_us").cast("decimal(18,0)").alias("__w"),
            F.col(value_col).cast("decimal(18,6)").alias("__v"),
        )
    )
    agg = gapped.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__w") * F.col("__v")).alias("__wv"),
        F.sum("__w").alias("__wsum"),
    )
    return agg.select(
        *keys,
        F.col("__n").cast("long").alias("n_obs"),
        F.round(
            F.col("__wv").cast("double") / F.col("__wsum").cast("double"),
            round_to,
        ).alias("twap"),
        F.round(F.col("__wsum").cast("double") / F.lit(1e6), round_to).alias(
            "span_s"
        ),
    )


def ohlc_bars(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 86400,
    tie_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Open/high/low/close bars per key per time bucket — the canonical
    downsampling for monitoring and market data. Open/close are the
    first/last observation by (ts[, tie]) within the bucket via ONE
    min_by/max_by aggregate pass (no window sort); high/low are plain
    min/max. Ties on timestamp are broken by ``tie_col`` (REQUIRED for a
    deterministic result when timestamps can collide — both engines then
    agree on the struct ordering).

    Returns ``(*keys, bucket_start, open, high, low, close, n_obs)``.
    """
    keys = list(key_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket = (
        F.floor(us / F.lit(int(bucket_seconds) * 1_000_000))
        * F.lit(int(bucket_seconds))
    ).cast("long")
    key_sql = _ohlc_key_sql(ts_col, tie_col)
    v = F.col(value_col).cast("double")
    agg = (
        df.withColumn("__b", bucket)
        .groupBy(*keys, "__b")
        .agg(
            F.round(
                F.expr(f"min_by({value_col}, {key_sql})").cast("double"),
                round_to,
            ).alias("open"),
            F.round(F.max(v), round_to).alias("high"),
            F.round(F.min(v), round_to).alias("low"),
            F.round(
                F.expr(f"max_by({value_col}, {key_sql})").cast("double"),
                round_to,
            ).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
        )
    )
    return agg.select(
        *keys,
        F.timestamp_seconds(F.col("__b")).alias("bucket_start"),
        "open", "high", "low", "close", "n_obs",
    )


def _ohlc_key_sql(ts_col: str, tie_col: str | None) -> str:
    """min_by/max_by ordering key: a struct of (epoch µs, tie) compared
    lexicographically — identical semantics in Spark and DuckDB."""
    base = f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
    if tie_col:
        return f"struct({base}, {tie_col})"
    return base


def attribution_touchpoints(
    conversions: DataFrame,
    touches: DataFrame,
    key_col: str,
    conv_ts: str = "ts",
    touch_ts: str = "ts",
    touch_cols: Sequence[str] | None = None,
    window: str = "7 days",
    touch_tie_break: str | None = None,
) -> DataFrame:
    """FIRST-touch and LAST-touch marketing attribution: for each
    conversion, find the earliest and the latest touch event of the same
    key inside the lookback ``window`` ending at the conversion
    (inclusive). The two industry-standard single-touch models, computed
    in the same pass structure.

    Shape: two :func:`~.joins.asof_join` one-window passes — LAST touch
    is the backward as-of with ``tolerance=window``; FIRST touch is the
    FORWARD as-of anchored at ``conv_ts − window`` with the same
    tolerance (earliest touch ≥ window start, and ≤ the conversion by
    the tolerance bound). No conversions × touches range join, so the
    plan stays two shuffles regardless of how many touches fall in each
    window. Ties on the touch timestamp break on greatest
    ``touch_tie_break`` in BOTH directions (the as-of convention).

    Returns the conversions relation + ``<col>_first`` / ``<col>_last``
    for each of ``touch_cols`` (null when no touch in window).
    """
    from .joins import asof_join

    tcols = list(
        touch_cols
        if touch_cols is not None
        else [c for c in touches.columns if c not in (key_col, touch_ts)]
    )
    last = asof_join(
        conversions, touches, on=key_col,
        left_ts=conv_ts, right_ts=touch_ts, right_cols=tcols,
        suffix="_last", tolerance=window,
        right_tie_break=touch_tie_break, direction="backward",
    )
    anchored = last.withColumn(
        "__wstart",
        F.col(conv_ts).cast("timestamp") - F.expr(f"INTERVAL {window}"),
    )
    first = asof_join(
        anchored, touches, on=key_col,
        left_ts="__wstart", right_ts=touch_ts, right_cols=tcols,
        suffix="_first", tolerance=window,
        right_tie_break=touch_tie_break, direction="forward",
    )
    # forward tolerance bounds touches to [conv−window, conv−window+window]
    # = [window start, the conversion itself] — both ends inclusive, no
    # post-filter needed
    return first.drop("__wstart")


def sessionize_capped(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    max_seconds: int = 14400,
    tie_col: str | None = None,
) -> DataFrame:
    """Sessionization with BOTH an idle-gap cut and a MAX-DURATION cut: a
    new session starts when the gap to the previous event exceeds
    ``gap_seconds`` OR when the event would stretch the current session
    past ``max_seconds`` from its start — the production variant (pure
    gap sessionization lets a steady drip of events keep one session
    open for days, breaking duration-based analytics).

    The max-duration rule is inherently SEQUENTIAL within a key (each
    cut moves the anchor the next comparison measures from — a window
    can't express it). Shape: repartition on the user + sort within
    partitions by (user, ts[, tie]), then ONE ``mapInPandas`` pass walks
    each partition's contiguous per-user runs — one Arrow batch per
    PARTITION, not per user (the per-group ``applyInPandas`` form
    measured 3.9 s for a NOOP over 1500 small groups at sf0.1; this
    shape runs the same data in ~1 s). Returns one row PER SESSION:
    ``(user_col, session_id, n_events, session_start, session_end)``
    with 1-based ids in time order.
    """
    import pandas as pd

    out_schema = (
        f"{user_col} long, session_id long, n_events long, "
        "session_start timestamp_ntz, session_end timestamp_ntz"
    )
    gap_us = int(gap_seconds) * 1_000_000
    max_us = int(max_seconds) * 1_000_000

    cols = [user_col, "session_id", "n_events", "session_start", "session_end"]

    def _frame(rows):
        out = pd.DataFrame(rows, columns=cols)
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        return out

    def split(batches):
        # Arrow may hand ONE sorted partition as SEVERAL batches (a user's
        # run can straddle a batch boundary) — the walk state persists
        # across the generator and the open session flushes only at the end
        cur_uid = None
        sid = 0
        anchor = prev = None
        n_in = 0
        for pdf in batches:
            if pdf.empty:
                continue
            uids = pdf["__uid"].to_numpy()
            us = pdf["__us"].to_numpy()
            rows = []
            for k in range(len(us)):
                uid, t = uids[k], us[k]
                if (
                    uid != cur_uid
                    or t - prev > gap_us
                    or t - anchor > max_us
                ):
                    if cur_uid is not None:
                        rows.append((cur_uid, sid, n_in, anchor, prev))
                    sid = 1 if uid != cur_uid else sid + 1
                    cur_uid = uid
                    anchor = t
                    n_in = 0
                prev = t
                n_in += 1
            if rows:
                yield _frame(rows)
        if cur_uid is not None:
            yield _frame([(cur_uid, sid, n_in, anchor, prev)])

    base = (
        df.select(
            F.col(user_col).cast("long").alias("__uid"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
            *([F.col(tie_col).alias("__tie")] if tie_col else []),
        )
        .repartition("__uid")
        .sortWithinPartitions(
            "__uid", "__us", *(["__tie"] if tie_col else [])
        )
    )
    return base.mapInPandas(split, out_schema)


def period_over_period(
    df: DataFrame,
    period_col: str,
    value_col: str,
    group_cols: tuple = (),
    lag_periods: int = 1,
    out_prefix: str = "prev_",
) -> DataFrame:
    """Period-over-period reporting (MoM/QoQ/YoY): per group, each
    period's value next to the value ``lag_periods`` periods earlier and
    the relative growth ``(v - prev) / prev`` (NULL when there is no
    prior period or it is zero — a growth rate off a zero base is
    undefined, not infinite).

    One window per group ordered by the period column — feed it
    POST-aggregation relations (period × group rollups), where the
    partition is a handful of rows per group; growth division runs in
    double off the (exact, if the caller summed decimals) inputs and
    rounds to 6dp.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy(period_col)
    prev = F.lag(value_col, lag_periods).over(w)
    out = df.withColumn(out_prefix + value_col, prev)
    prev_c = F.col(out_prefix + value_col)
    growth = F.when(
        prev_c.isNotNull() & (prev_c.cast("double") != 0.0),
        F.round(
            (F.col(value_col).cast("double") - prev_c.cast("double"))
            / prev_c.cast("double"),
            6,
        ),
    )
    return out.withColumn("growth", growth)


def positional_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    conv_type: str = "purchase",
    touch_types: tuple = ("click", "view"),
    lookback: str = "7 days",
    model: str = "u",
    conv_id_col: str = "event_id",
) -> DataFrame:
    """Positional multi-touch attribution: every conversion's credit is
    split across ALL touches in its lookback window — U-shaped
    (``model='u'``: 40% first touch, 40% last, 20% shared by the
    middles; degenerates to 100%/50-50 for 1-2 touches) or ``linear``
    (equal split). Complements first/last-touch
    (:func:`attribution_touchpoints`) with the fractional-credit models.

    Plan shape: each touch is FORWARD as-of joined to its next
    conversion of the same user within ``lookback``
    (:func:`~.joins.asof_join` — one shuffle + one window, never a
    conversions × touches range join); positions come from one window
    per conversion; credits are rounded to 9dp and summed as exact
    decimals so channel totals are partitioning-independent.

    Returns ``(touch_type, conversions_touched, total_credit)`` — one
    row per touch channel.
    """
    from pyspark.sql.window import Window

    from .joins import asof_join

    conv = events.where(F.col(type_col) == conv_type).select(
        F.col(user_col), F.col(ts_col),
        F.col(conv_id_col).alias("__conv_id"),
    )
    touches = events.where(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col), F.col(ts_col), F.col(type_col).alias("touch_type")
    )
    attached = asof_join(
        touches,
        conv,
        on=user_col,
        left_ts=ts_col,
        right_ts=ts_col,
        right_cols=["__conv_id"],
        suffix="",
        direction="forward",
        tolerance=lookback,
        right_tie_break="__conv_id",
    ).where(F.col("__conv_id").isNotNull())

    w = Window.partitionBy("__conv_id").orderBy(
        F.col(ts_col).asc(), F.col("touch_type").asc()
    )
    wn = Window.partitionBy("__conv_id")
    pos = (
        attached.withColumn("__pos", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
    )
    n, p = F.col("__n"), F.col("__pos")
    if model == "linear":
        credit = F.lit(1.0) / n
    elif model == "u":
        credit = (
            F.when(n == 1, F.lit(1.0))
            .when((n == 2), F.lit(0.5))
            .when(p == 1, F.lit(0.4))
            .when(p == n, F.lit(0.4))
            .otherwise(F.lit(0.2) / (n - 2))
        )
    else:
        raise ValueError(f"unknown attribution model: {model!r}")
    dec = F.round(credit, 9).cast("decimal(18,9)")
    return (
        pos.groupBy("touch_type")
        .agg(
            F.countDistinct("__conv_id").alias("conversions_touched"),
            F.round(F.sum(dec).cast("double"), 6).alias("total_credit"),
        )
        .orderBy("touch_type")
    )
