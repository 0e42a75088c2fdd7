"""Skew mitigation utilities: deterministic salting for hot keys.

At 100 TB a single hot key (null FK, default enum value, bot user) can pin
an entire stage on one task. AQE's skew-join splitting handles sort-merge
joins after the fact; explicit salting handles the cases AQE can't: hot-key
*aggregations* with non-decomposable functions and broadcast-ineligible
joins where one side must replicate.

Salts here are DETERMINISTIC (hash of the row's own columns, never rand()),
so plans stay reproducible, retries are safe, and results are
oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_cols: list[str], buckets: int = 8, out_col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from a hash of ``salt_cols`` —
    columns that are ~unique per row (an id, a timestamp) so the hot key's
    rows spread evenly."""
    return df.withColumn(
        out_col, F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(buckets))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_cols: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side gets a deterministic salt, the
    small side replicates once per salt bucket, and the join key becomes
    (key, salt) — a hot key's rows land on ``buckets`` tasks instead of one.

    Semantically identical to ``big.join(small, on, how)``. Cost: the small
    side is materialized ``buckets``× (use only when the small side is too
    big to broadcast but small enough to replicate; otherwise prefer
    F.broadcast or AQE skew handling).
    """
    b = with_salt(big, salt_cols, buckets)
    # generators must be top-level select expressions (can't nest in cast)
    s = small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("__salt_i")
    ).withColumn("__salt", F.col("__salt_i").cast("long")).drop("__salt_i")
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")


def salted_distinct_count(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase exact COUNT(DISTINCT x) per group for skewed groups:
    phase 1 dedups (group, x) within (group, salt) partitions, phase 2 sums
    partial distinct counts. One hot group spreads over ``buckets`` tasks.

    Output: (group_col, n_distinct).
    """
    # COUNT(DISTINCT x) ignores NULL x — drop nulls before salting or the
    # null would be counted as a distinct value
    salted = with_salt(
        df.where(F.col(distinct_col).isNotNull()), [distinct_col], buckets
    )
    phase1 = (
        salted.select(group_col, distinct_col, "__salt")
        .distinct()  # (group, value, salt) dedup — value determines salt, so
        # each distinct value appears in exactly one salt bucket
        .groupBy(group_col, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    counts = phase1.groupBy(group_col).agg(F.sum("__partial").alias("n_distinct"))
    # SQL keeps groups whose values are ALL null (count 0) — restore them
    all_groups = df.select(group_col).distinct()
    return all_groups.join(counts, group_col, "left").select(
        group_col, F.coalesce("n_distinct", F.lit(0)).alias("n_distinct")
    )
