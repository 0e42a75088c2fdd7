"""Incremental aggregate-state maintenance — keep a per-key aggregate
table current by MERGING each new batch's partial state instead of
recomputing over history.

The 100 TB pattern: a full `groupBy` over an append-only fact table costs
a full scan per refresh; a MERGEABLE state (count, sum, min, max, HLL
sketch) costs one scan of the BATCH plus a key-join against the state
table — the same algebra Spark's own partial aggregation uses map-side,
lifted to the storage layer. All components are commutative monoids, so
``merge(state(A), state(B)) == state(A ∪ B)`` exactly (sums carried as
DECIMAL(18,6): float accumulation order would make the invariant
approximate; decimal keeps it bit-exact and engine-portable).

No reference counterpart (the reference recomputes everything —
common.py:525-538 overwrite-only writes); this is the extension surface's
lakehouse-maintenance answer, composing with sources/incremental.py's
MERGE upsert for the write side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: columns a state table carries per key
STATE_COLS = ("cnt", "sum_dec", "min_v", "max_v", "hll")


def agg_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    with_hll: bool = True,
) -> DataFrame:
    """Per-key mergeable aggregate state of one batch/partition of data:
    ``cnt`` (rows with non-null value), ``sum_dec`` (DECIMAL(18,6) sum),
    ``min_v``/``max_v``, and optionally ``hll`` (a mergeable
    hll_sketch_agg binary for approx distinct values)."""
    aggs = [
        F.count(value_col).alias("cnt"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("sum_dec"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    ]
    if with_hll:
        # hll_sketch_agg takes int/bigint/string/binary — hash doubles to a
        # stable string key (distinct-count semantics survive the cast)
        aggs.append(
            F.expr(f"hll_sketch_agg(CAST({value_col} AS STRING))").alias("hll")
        )
    return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def merge_agg_states(
    a: DataFrame, b: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Merge two state tables into one (full outer on keys; every
    component is a monoid so absent sides contribute identity). The merge
    touches only the two state tables — never the underlying facts."""
    klist = list(keys)
    a_hll, b_hll = "hll" in a.columns, "hll" in b.columns
    if a_hll != b_hll:
        # one side would silently lose its approx-distinct sketch — the
        # states were built with different with_hll settings; refuse.
        raise ValueError(
            "merge_agg_states: one state table carries an 'hll' column and "
            "the other does not (built with different with_hll settings); "
            "rebuild the states consistently or drop('hll') explicitly"
        )
    with_hll = a_hll and b_hll
    unioned = a.unionByName(b, allowMissingColumns=False)
    aggs = [
        F.sum("cnt").alias("cnt"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    ]
    if with_hll:
        aggs.append(F.expr("hll_union_agg(hll)").alias("hll"))
    return unioned.groupBy(*klist).agg(*aggs)


def finalize_state(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Render a state table as the user-facing aggregate: count, sum, min,
    max, avg (+ approx distinct when the state carries a sketch). Sum/avg
    come back as doubles rounded 6dp (the decimal carrier is an internal
    exactness device, not an output type)."""
    cols = [
        *keys,
        F.col("cnt").cast("long").alias("n"),
        F.round(F.col("sum_dec").cast("double"), 6).alias("sum_v"),
        F.col("min_v"),
        F.col("max_v"),
        # double division of the exact decimal sum (NOT decimal division:
        # engines disagree on result-scale rounding; double-of-exact is
        # portable)
        F.round(
            F.col("sum_dec").cast("double") / F.col("cnt") + F.lit(1e-9), 6
        ).alias("avg_v"),
    ]
    if "hll" in state.columns:
        cols.append(
            F.expr("hll_sketch_estimate(hll)").cast("long").alias("approx_distinct")
        )
    return state.select(*cols)


def agg_state_hist(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 32,
) -> DataFrame:
    """Per-key mergeable HISTOGRAM state: one ``hist`` array<long> column
    of ``bins`` fixed-boundary counters (clamped edges, NULLs skipped —
    the :func:`~..operators.skew.histogram_sketch` bin math, carried as
    state).

    ONE map-side-combined aggregate: the array is built from ``bins``
    conditional-sum expressions, so the shuffle carries |keys| rows of a
    fixed-width array — keep ``bins`` modest (<= ~128). Merge is
    element-wise addition (:func:`merge_hist_states`), giving the
    distribution the same O(batch) incremental-maintenance property as
    count/sum/min/max/HLL.
    """
    if not (hi > lo) or bins < 1:
        raise ValueError("need hi > lo and bins >= 1")
    x = F.col(value_col).cast("double")
    b = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(bins))
    b = F.least(F.lit(bins - 1), F.greatest(F.lit(0), b)).cast("int")
    flags = F.when(x.isNotNull(), b)
    return df.groupBy(*[F.col(k) for k in keys]).agg(
        F.array(
            *[F.sum((flags == i).cast("long")).alias(f"_b{i}") for i in range(bins)]
        ).alias("hist")
    )


def merge_hist_states(a: DataFrame, b: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Element-wise sum of two histogram state tables built with identical
    (lo, hi, bins); keys absent on one side contribute identity (zeros).
    ``merge(state(A), state(B)) == state(A ∪ B)`` exactly — counters are
    plain longs."""
    klist = list(keys)
    unioned = a.unionByName(b)
    # element-wise array sum as an aggregate: fold the collected (<=2 per
    # key) arrays with zip_with — collect_list is bounded by the number of
    # merged STATES per key, not data volume
    return unioned.groupBy(*klist).agg(
        F.aggregate(
            F.collect_list("hist"),
            F.expr("CAST(array() AS ARRAY<BIGINT>)"),
            lambda acc, h: F.when(F.size(acc) == 0, h).otherwise(
                F.zip_with(acc, h, lambda p, q: p + q)
            ),
        ).alias("hist")
    )


def state_histogram(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Render a histogram state as the ``(keys..., bin, cnt)`` relation
    consumed by :func:`~..operators.skew.quantile_estimate_grouped` —
    per-key quantiles straight from maintained state, no fact rescan."""
    return state.select(
        *keys, F.posexplode("hist").alias("bin", "cnt")
    ).where(F.col("cnt") > 0)


# --------------------------------------------------------------------------
# Exact mergeable distinct counting: bucketed roaring-style bitmaps
# --------------------------------------------------------------------------

def bitmap_distinct_state(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    out_col: str = "bm",
) -> DataFrame:
    """EXACT distinct-count state per key group: Spark's bitmap aggregate
    family packs integer ids into fixed 4 KB bitmaps, bucketed by
    ``id // 32768`` — the mergeable-bitmap pattern (roaring-lite) that
    HLL's approximate rollups can't give you when the count must be
    exact.

    State rows are ``(*keys, bucket, bitmap)``; two states over disjoint
    or overlapping row sets merge with :func:`merge_bitmap_states`
    (bit-or is idempotent, so re-delivered rows don't double-count —
    stronger than count/sum states, which need exactly-once input).
    Requires a non-negative integral ``id_col``; cost is one shuffle on
    ``(keys, bucket)`` with map-side partial construction.
    """
    key = F.col(id_col).cast("long")
    return (
        df.where(key.isNotNull() & (key >= 0))
        .groupBy(*keys, F.bitmap_bucket_number(key).alias("bucket"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position(key)).alias(out_col))
    )


def merge_bitmap_states(
    a: DataFrame, b: DataFrame, keys: Sequence[str], bm_col: str = "bm"
) -> DataFrame:
    """OR-merge two bitmap state tables: union + one bitmap_or_agg per
    ``(keys, bucket)``. Idempotent and commutative — replaying a batch is
    harmless, shard states roll up associatively."""
    return (
        a.unionByName(b)
        .groupBy(*keys, "bucket")
        .agg(F.bitmap_or_agg(bm_col).alias(bm_col))
    )


def bitmap_distinct_counts(
    state: DataFrame, keys: Sequence[str], bm_col: str = "bm"
) -> DataFrame:
    """Resolve a bitmap state to exact per-key distinct counts:
    sum of per-bucket bitmap_count — no rescan of the fact table."""
    return (
        state.groupBy(*keys)
        .agg(F.sum(F.bitmap_count(F.col(bm_col))).cast("long").alias("n_distinct"))
    )


def rolling_distinct_from_bitmaps(
    state: DataFrame,
    day_col: str,
    window_days: int,
    bm_col: str = "bm",
) -> DataFrame:
    """EXACT trailing-N-day distinct counts from a per-day bitmap state:
    join each day to its trailing window's states (bounded fan-out:
    ``window_days`` per row), OR-merge per (day, bucket), sum bucket
    counts. The exact replacement for approximate sliding HLL when the
    id domain is integral — cost scales with state rows × window, never
    with fact rows.

    ``day_col`` must be a date column in ``state``.
    """
    days = state.select(F.col(day_col).alias("__d")).distinct()
    in_window = state.join(
        days,
        (F.col(day_col) <= F.col("__d"))
        & (F.col(day_col) > F.date_sub(F.col("__d"), window_days)),
    )
    merged = in_window.groupBy(F.col("__d").alias(day_col), F.col("bucket")).agg(
        F.bitmap_or_agg(bm_col).alias(bm_col)
    )
    return bitmap_distinct_counts(merged, [day_col], bm_col=bm_col)


def bitmap_intersection_counts(
    state: DataFrame,
    key_col: str,
    bm_col: str = "bm",
) -> DataFrame:
    """EXACT pairwise audience overlap from bitmap states — |A ∩ B| for
    every key pair via inclusion-exclusion: |A∩B| = |A| + |B| − |A∪B|.
    Spark's bitmap family has OR-merge but no AND aggregate; each pair's
    union count comes from one ``bitmap_or_agg`` over the two keys'
    bucket rows, so intersections need NO fact rescan and no bit-level
    AND — the "users who did A and also B" matrix straight from
    mergeable state.

    Input: a state table from :func:`bitmap_distinct_state` keyed by one
    column. Shape: the key-pair relation is k(k−1)/2 rows (broadcast);
    state rows fan out once per pair they belong to (≤ k−1), then one
    OR-aggregate per (pair, bucket) — cost scales with state rows ×
    pairs, never with ids. Returns ``(key_a, key_b, n_a, n_b, n_union,
    n_intersect)`` for key_a < key_b.
    """
    per_key = bitmap_distinct_counts(state, [key_col], bm_col)
    ka = per_key.select(
        F.col(key_col).alias("key_a"), F.col("n_distinct").alias("n_a")
    )
    kb = per_key.select(
        F.col(key_col).alias("key_b"), F.col("n_distinct").alias("n_b")
    )
    pairs = ka.crossJoin(kb).where(F.col("key_a") < F.col("key_b"))
    sa = state.select(F.col(key_col).alias("__k"), "bucket", bm_col)
    tag_a = pairs.select("key_a", "key_b").join(
        sa, F.col("key_a") == F.col("__k")
    ).select("key_a", "key_b", "bucket", bm_col)
    tag_b = pairs.select("key_a", "key_b").join(
        sa, F.col("key_b") == F.col("__k")
    ).select("key_a", "key_b", "bucket", bm_col)
    union_counts = (
        tag_a.unionByName(tag_b)
        .groupBy("key_a", "key_b", "bucket")
        .agg(F.bitmap_count(F.bitmap_or_agg(bm_col)).alias("__c"))
        .groupBy("key_a", "key_b")
        .agg(F.sum("__c").cast("long").alias("n_union"))
    )
    out = pairs.join(union_counts, ["key_a", "key_b"], "left").na.fill(
        {"n_union": 0}
    )
    return out.select(
        "key_a", "key_b", "n_a", "n_b", "n_union",
        (F.col("n_a") + F.col("n_b") - F.col("n_union"))
        .cast("long")
        .alias("n_intersect"),
    )


# --------------------------------------------------------------------------
# Mergeable MOMENTS state: exact decimal power sums -> mean / variance /
# skewness / kurtosis. Power sums are commutative monoids, so
# merge(state(A), state(B)) == state(A ∪ B) bit-exactly — the same
# contract as agg_state, extended to 4th-order shape statistics.
# --------------------------------------------------------------------------

MOMENT_COLS = ("m_cnt", "s1", "s2", "s3", "s4")


def moments_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """Per-key mergeable moments state: count + exact power sums of the
    SCALED INTEGER ``iv = round(v·10^scale)`` — Σiv, Σiv², Σiv³, Σiv⁴ as
    DECIMAL(38,0). Integer powers keep every sum exact in both engines
    (floats would make merge==recompute approximate; fractional-decimal
    powers overflow precision typing).

    Range contract (documented, not silent): per group,
    ``Σ(|v|·10^scale)⁴ < 10³⁸`` — at the default scale 2 that allows
    e.g. a billion rows of |v| ≤ 300 or a million rows of |v| ≤ 10⁵
    (TPC-H prices at any fixture sf fit with 100× headroom). Beyond it
    the decimal sum overflows loudly under ANSI rather than returning a
    wrong number.
    """
    iv = (
        F.round(F.col(value_col).cast("double") * F.lit(float(10 ** scale)))
        .cast("decimal(19,0)")
    )
    i2 = (iv * iv).cast("decimal(38,0)")
    return df.where(F.col(value_col).isNotNull()).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("m_cnt"),
        F.sum(iv.cast("decimal(38,0)")).alias("s1"),
        F.sum(i2).alias("s2"),
        F.sum((i2 * iv).cast("decimal(38,0)")).alias("s3"),
        F.sum((i2 * i2).cast("decimal(38,0)")).alias("s4"),
    )


def merge_moments_states(
    a: DataFrame, b: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Merge two moments states (full outer on keys, component-wise sums
    with zero identities) — equals :func:`moments_state` over the unioned
    inputs exactly."""
    kl = list(keys)
    an = a.select(*kl, *[F.col(c).alias(f"__a_{c}") for c in MOMENT_COLS])
    bn = b.select(*kl, *[F.col(c).alias(f"__b_{c}") for c in MOMENT_COLS])
    j = an.join(bn, kl, "full_outer")
    out = [
        (F.coalesce(F.col(f"__a_{c}"), F.lit(0))
         + F.coalesce(F.col(f"__b_{c}"), F.lit(0))).alias(c)
        for c in MOMENT_COLS
    ]
    return j.select(*kl, *out)


def finalize_moments(
    state: DataFrame, keys: Sequence[str], scale: int = 2
) -> DataFrame:
    """Shape statistics from the scaled-integer power sums (population
    conventions, engine-neutral — Spark's and DuckDB's skewness/kurtosis
    builtins disagree on sample corrections, so both sides compute from
    the SAME exact sums): with ``u = 10^scale``, mean = s1/(n·u);
    var = s2/(n·u²) − mean²; skew = (s3/(n·u³) − 3·mean·var − mean³)
    / var^1.5; excess kurt = (s4/(n·u⁴) − 4·mean·s3/(n·u³) +
    6·mean²·s2/(n·u²) − 3·mean⁴)/var² − 3. Groups with var ≤ 0 or n < 2
    emit NULL shape stats. Exact sums convert to double ONCE, then 6dp.
    """
    u = float(10 ** scale)
    n = F.col("m_cnt").cast("double")
    s1 = F.col("s1").cast("double") / u
    s2 = F.col("s2").cast("double") / (u * u)
    s3 = F.col("s3").cast("double") / (u * u * u)
    s4 = F.col("s4").cast("double") / (u * u * u * u)
    mean = s1 / n
    var = s2 / n - mean * mean
    ok = (F.col("m_cnt") >= 2) & (var > 0)
    skew = (s3 / n - 3 * mean * var - mean * mean * mean) / F.pow(var, 1.5)
    kurt = (
        s4 / n
        - 4 * mean * (s3 / n)
        + 6 * mean * mean * (s2 / n)
        - 3 * F.pow(mean, 4)
    ) / (var * var) - 3
    return state.select(
        *keys,
        F.col("m_cnt").alias("n"),
        F.round(mean, 6).alias("mean"),
        F.when(ok, F.round(var, 6)).alias("variance"),
        F.when(ok, F.round(skew, 6)).alias("skewness"),
        F.when(ok, F.round(kurt, 6)).alias("kurtosis_excess"),
    )
