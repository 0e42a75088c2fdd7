"""Temporal join operators Spark lacks as built-ins: as-of and range joins.

North-star extensions (SURVEY.md §2.13 event/time ops). Both are implemented
as compositions of shuffle-friendly primitives — no nested-loop joins, no
per-row Python:

- :func:`asof_join` uses the union + last-non-null-carry-forward trick:
  ONE shuffle on the key, one window pass. The naive alternative (range
  self-join + argmax) explodes quadratically per key; a BroadcastNestedLoop
  join would be O(n·m). This form scales linearly with key cardinality.
- :func:`range_join_points_to_intervals` buckets both sides on a coarse
  time grid and equi-joins on (key, bucket), then refines with the exact
  range predicate. Intervals spanning multiple buckets are exploded to one
  row per covered bucket. Spark plans raw inequality joins as
  BroadcastNestedLoopJoin — this rewrite turns them into a hash join whose
  cost is |points| + Σ interval_spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance: str | None = None,
    right_tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the latest right row with
    ``right.ts <= left.ts`` (``direction="backward"``, the default) or the
    EARLIEST right row with ``right.ts >= left.ts``
    (``direction="forward"``) within the same ``on`` key (inclusive both
    ways). Forward is the same one-window carry walked in descending
    timestamp order — the last right row seen before a left row is then
    the smallest timestamp ≥ the left's.

    Implementation: tag both sides, union, sort per key by (ts, right-first
    at ties), carry the last seen right ROW forward as a single struct with
    ``last(struct(...), ignorenulls)`` (atomic — NULL columns of the winning
    row stay NULL instead of leaking older rows' values), keep left rows.
    One shuffle, one window, one window function.
    ``tolerance`` (e.g. "1 hour") drops matches older than left.ts - tol.

    Matches DuckDB/pandas ``ASOF JOIN`` semantics (direction=backward).
    When several right rows share the matching timestamp the winner is
    engine-arbitrary (same as DuckDB ASOF); pass ``right_tie_break`` (a
    right-side column, e.g. a unique id) to deterministically pick the row
    with the greatest tie-break value instead.
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col(left_ts).cast("timestamp")
    )
    for c in rcols:
        l_tagged = l_tagged.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    l_tagged = l_tagged.withColumn("__rts", F.lit(None).cast("timestamp"))
    tb_type = dict(right.dtypes)[right_tie_break] if right_tie_break else "int"
    l_tagged = l_tagged.withColumn("__tb", F.lit(None).cast(tb_type))

    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_ts).cast("timestamp").alias("__rts"),
        (F.col(right_tie_break) if right_tie_break else F.lit(0)).alias("__tb"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
    )
    for c in left.columns:
        if c not in (on,):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    # right rows (side=0) sort before left rows at equal ts → inclusive match;
    # among equal-ts right rows the greatest tie-break sorts last and wins
    # the carry (nulls_first keeps left rows' null __tb inert). Forward
    # walks ts DESCENDING with the same side/tie order.
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("__side").asc(), F.asc_nulls_first("__tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # carry the matched right row as ONE struct (null on left rows, so
    # ignorenulls skips them): the winning row's values stay together even
    # when some of its columns are NULL — per-column last(ignorenulls)
    # would fill those from an OLDER right row, yielding a mixed-row match.
    # Also one window function instead of len(rcols)+1.
    rpack = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__rts").alias("__rts"),
            *[F.col(f"__r_{c}").alias(c) for c in rcols],
        ),
    )
    carried = unioned.withColumn("__rpack", F.last(rpack, ignorenulls=True).over(w))

    out = carried.where(F.col("__side") == 1)
    if tolerance:
        if direction == "backward":
            in_tol = F.col("__rpack.__rts") >= F.col("__ts") - F.expr(
                f"INTERVAL {tolerance}"
            )
        else:
            in_tol = F.col("__rpack.__rts") <= F.col("__ts") + F.expr(
                f"INTERVAL {tolerance}"
            )
        out = out.withColumn("__rpack", F.when(in_tol, F.col("__rpack")))
    keep = [*left.columns] + [
        F.col(f"__rpack.{c}").alias(f"{c}{suffix}") for c in rcols
    ]
    return out.select(*keep)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance: str | None = None,
    right_tie_break: str | None = None,
    left_id: str | None = None,
) -> DataFrame:
    """Nearest as-of join: each left row takes whichever of its backward
    (latest ≤) and forward (earliest ≥) matches is CLOSER in time; exact
    ties go backward (pandas ``merge_asof(direction='nearest')``
    convention). Two one-window passes (one per direction) + a map-side
    pick — still no per-row range scan. Distances compare at MICROSECOND
    precision (``unix_micros``), so sub-second timestamps pick correctly
    (a whole-second cast would truncate 0.9s and 0.1s both to 0).

    The matched right row's timestamp is exposed as ``__nearest_ts`` so
    callers (and oracles) can verify the pick; pass ``right_cols`` to
    bound the carried payload exactly as in :func:`asof_join`.

    Pass ``left_id`` naming a UNIQUE left column and the two directional
    passes recombine on that single key (the scale-correct shape: one
    narrow shuffle key, and left rows with NULL payload columns survive).
    Without it the recombine joins null-safely on the full left row —
    left rows must then be unique as a TUPLE, and duplicate left rows
    would fan out.
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    ts_out = "__rts_dir"
    r_with_ts = right.withColumn(ts_out, F.col(right_ts).cast("timestamp"))
    common = dict(
        on=on, left_ts=left_ts, right_ts=right_ts,
        right_cols=[*rcols, ts_out], tolerance=tolerance,
        right_tie_break=right_tie_break,
    )
    back = asof_join(left, r_with_ts, suffix="__b", direction="backward", **common)
    fwd = asof_join(left, r_with_ts, suffix="__f", direction="forward", **common)
    join_keys = [c for c in left.columns]
    fwd_carry = [f"{c}__f" for c in [*rcols, ts_out]]
    if left_id is not None:
        if left_id not in left.columns:
            raise ValueError(f"left_id {left_id!r} is not a left column")
        both = back.join(fwd.select(left_id, *fwd_carry), left_id)
    else:
        # Null-safe recombine on the full left tuple: a plain name-list
        # join drops any left row with a NULL attribute (inner-join null
        # semantics). eqNullSafe keeps them.
        fwd_r = fwd.select(
            *[F.col(c).alias(f"__fw_{c}") for c in join_keys], *fwd_carry
        )
        cond = None
        for c in join_keys:
            term = back[c].eqNullSafe(fwd_r[f"__fw_{c}"])
            cond = term if cond is None else (cond & term)
        both = back.join(fwd_r, cond).drop(*[f"__fw_{c}" for c in join_keys])
    lts = F.col(left_ts).cast("timestamp")
    d_b = F.unix_micros(lts) - F.unix_micros(F.col(f"{ts_out}__b"))
    d_f = F.unix_micros(F.col(f"{ts_out}__f")) - F.unix_micros(lts)
    # backward wins ties and whenever forward is absent; forward wins only
    # when strictly closer or backward is absent
    use_fwd = F.when(
        F.col(f"{ts_out}__b").isNull(), F.col(f"{ts_out}__f").isNotNull()
    ).otherwise(F.col(f"{ts_out}__f").isNotNull() & (d_f < d_b))
    picked = [
        F.when(use_fwd, F.col(f"{c}__f")).otherwise(F.col(f"{c}__b")).alias(
            f"{c}{suffix}"
        )
        for c in rcols
    ]
    nearest_ts = F.when(use_fwd, F.col(f"{ts_out}__f")).otherwise(
        F.col(f"{ts_out}__b")
    )
    return both.select(*join_keys, *picked, nearest_ts.alias("__nearest_ts"))


def range_join_points_to_intervals(
    points: DataFrame,
    intervals: DataFrame,
    on: str | None,
    point_ts: str,
    interval_start: str,
    interval_end: str,
    bucket: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval containing them
    (``start <= ts < end``), optionally also matching on a key column.

    Intervals explode to one row per covered coarse bucket; points map to
    their bucket; equi-join on (key, bucket) then the exact range predicate
    refines. Pick ``bucket`` near the typical interval length: too coarse →
    fat buckets, too fine → interval explosion.
    """
    sec = F.lit(_interval_seconds(bucket))
    p = points.withColumn(
        "__bucket", (F.unix_timestamp(F.col(point_ts)) / sec).cast("long")
    )
    i = intervals.withColumn(
        "__b_start", (F.unix_timestamp(F.col(interval_start)) / sec).cast("long")
    ).withColumn(
        # end is exclusive: a point at exactly `end` is NOT covered
        "__b_end",
        (F.unix_timestamp(F.col(interval_end)) / sec).cast("long"),
    )
    i = i.withColumn(
        "__bucket", F.explode(F.sequence(F.col("__b_start"), F.col("__b_end")))
    ).drop("__b_start", "__b_end")
    join_keys = ["__bucket"] + ([on] if on else [])
    joined = p.join(i, join_keys, how)
    refined = joined.where(
        (F.col(point_ts) >= F.col(interval_start))
        & (F.col(point_ts) < F.col(interval_end))
    )
    return refined.drop("__bucket")


def _interval_seconds(spec: str) -> int:
    n, unit = spec.split()
    mult = {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    }[unit.lower()]
    return int(n) * mult


def range_join_intervals_overlap(
    left: DataFrame,
    right: DataFrame,
    on: str | None,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Interval×interval OVERLAP join (half-open: ``l_start < r_end AND
    r_start < l_end``), optionally keyed — the second temporal-join
    primitive Spark lacks (points-in-intervals being the first).

    Plan: both sides explode to their covered coarse buckets and equi-join
    on (key, bucket) — a hash join, never the BroadcastNestedLoopJoin a raw
    inequality join would plan. A pair overlapping many shared buckets
    would join once per bucket, so each pair is CLAIMED exactly once, at
    the bucket containing ``greatest(l_start, r_start)`` — which both
    sides' ranges provably cover when the intervals overlap — instead of
    an expensive post-join ``distinct`` over the full output.
    """
    sec = F.lit(_interval_seconds(bucket))

    def bucketed(df: DataFrame, start: str, end: str, tag: str) -> DataFrame:
        b_start = (F.unix_timestamp(F.col(start)) / sec).cast("long")
        b_end = (F.unix_timestamp(F.col(end)) / sec).cast("long")
        return df.withColumn(
            f"__{tag}bs", b_start
        ).withColumn(
            "__bucket", F.explode(F.sequence(b_start, b_end))
        )

    l = bucketed(left, left_start, left_end, "l").alias("l")
    r = bucketed(right, right_start, right_end, "r").alias("r")
    keys = ["__bucket"] + ([on] if on else [])
    joined = l.join(r, keys)
    claimed = joined.where(
        (F.col("__bucket") == F.greatest(F.col("__lbs"), F.col("__rbs")))
        & (F.col(f"l.{left_start}") < F.col(f"r.{right_end}"))
        & (F.col(f"r.{right_start}") < F.col(f"l.{left_end}"))
    )
    return claimed.drop("__bucket", "__lbs", "__rbs")


def incremental_join_update(
    prev_join: DataFrame,
    left_old: DataFrame,
    right_old: DataFrame,
    left_delta: DataFrame,
    right_delta: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Incremental (insert-only) INNER-join maintenance: given the
    previously materialized join of (left_old ⋈ right_old) and the new
    row batches ΔL / ΔR, produce the updated join WITHOUT recomputing
    the old×old bulk::

        new = prev ∪ (ΔL ⋈ R_old) ∪ (L_old ⋈ ΔR) ∪ (ΔL ⋈ ΔR)

    — the classic delta rule. The three delta joins each have one tiny
    side, so they broadcast; the 100 TB `prev` is only UNIONED (no
    shuffle, no rescan) — this is the join analogue of the mergeable
    aggregate states in ``operators/aggstate``: refreshing a
    materialized join costs O(Δ), not O(table). Insert-only by design;
    updates/deletes need the CDC path (``star.apply_changelog``)
    upstream instead.
    """
    keys = [on] if isinstance(on, str) else list(on)
    d1 = left_delta.join(right_old, keys)
    d2 = left_old.join(right_delta, keys)
    d3 = left_delta.join(right_delta, keys)
    cols = prev_join.columns
    return (
        prev_join.unionByName(d1.select(*cols))
        .unionByName(d2.select(*cols))
        .unionByName(d3.select(*cols))
    )
