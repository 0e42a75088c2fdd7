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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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


def heavy_hitters_exact(
    df: DataFrame,
    col: str,
    k: int = 10,
    capacity: int = 4096,
    strict: bool = True,
) -> DataFrame:
    """EXACT top-k most-frequent values in two passes, never shuffling the
    full distinct domain — the heavy-hitter shape for columns whose
    cardinality explodes at 100 TB (urls, user ids, tokens):

    1. **Candidates**: one mapInPandas pass builds a per-partition
       Misra-Gries summary (``capacity`` counters, merged batch-wise with
       the mergeable-summaries rule — add exact batch counts, subtract the
       (capacity+1)-th largest, keep positives; Agarwal et al., PODS'12).
       MG guarantees any value with partition count > n_p/(capacity+1)
       survives its partition; by averaging, every value with GLOBAL count
       > n/(capacity+1) survives in at least one partition, so the union
       of candidates is a provable superset of all such values. Candidate
       volume is bounded by capacity × partitions, independent of the
       domain size.
    2. **Exact recount**: broadcast-semi-join the candidate set back and
       exactly count only those rows — one tiny-domain aggregate instead
       of a full-domain shuffle.

    The result is PROVABLY exact when the k-th returned count exceeds
    n/(capacity+1) (checked post-hoc; ``strict=True`` raises otherwise —
    re-run with a larger capacity). Deterministic tie-break (count desc,
    value asc).
    """
    import pandas as pd

    cap = int(capacity)
    fld = next(f for f in df.schema.fields if f.name == col)
    vtype = fld.dataType.simpleString()

    def mg(batches):
        counters = pd.Series(dtype="float64")
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            if vc.empty:
                continue
            counters = counters.add(vc, fill_value=0.0)
            if len(counters) > cap:
                cut = counters.nlargest(cap + 1).iloc[-1]
                counters = counters[counters > cut] - cut
        vals = (
            pd.Series([], dtype=object)
            if counters.empty
            else counters.index.to_series().reset_index(drop=True)
        )
        yield pd.DataFrame({col: vals})

    cands = df.select(col).mapInPandas(mg, schema=f"{col} {vtype}").distinct()
    counted = (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = (
        counted.orderBy(F.col("cnt").desc(), F.col(col).asc())
        .limit(int(k))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col(col).asc())
            ).cast("long"),
        )
    )
    if strict:
        rows = top.collect()
        n = df.where(F.col(col).isNotNull()).count()
        # certified exact iff a full k rows came back AND the weakest
        # returned count clears the MG support bound — then no pruned
        # (non-candidate) value, all of which sit at or below the bound,
        # could displace any returned row. Fewer than k rows is also a
        # failure: values pruned below the bound might belong in the
        # top-k (use capacity >= expected distinct count for tiny
        # domains).
        if n and (
            len(rows) < min(int(k), n)
            or rows[-1]["cnt"] * (cap + 1) <= n
        ):
            weakest = rows[-1]["cnt"] if rows else 0
            raise ValueError(
                f"heavy_hitters_exact: result of {len(rows)} rows with "
                f"weakest count {weakest} is not provably exact at "
                f"capacity {cap} (support bound {n/(cap+1):.1f}); "
                f"raise capacity"
            )
        spark = df.sparkSession
        return spark.createDataFrame(rows, top.schema)
    return top


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 10,
    broadcast_items: bool | None = None,
    broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """Frequent item PAIRS above an absolute support threshold — the
    a-priori pruned market-basket co-occurrence (Agrawal & Srikant,
    VLDB'94): only items that are themselves frequent can appear in a
    frequent pair, so the pair join runs over the pruned item set.

    Scale design: the candidate explosion of a naive basket self-join is
    Σ|basket|² over ALL items; pruning first with a broadcast semi-join
    of frequent items bounds it to frequent-item co-occurrences only —
    at retail/log scale this is the difference between quadratic-in-tail
    and linear-with-a-small-head. Two aggregate shuffles + one broadcast
    semi-join + one self-join on basket id.

    Returns (item_a, item_b, pair_count) with item_a < item_b,
    pair_count ≥ min_support, deterministic ordering left to the caller.

    ``broadcast_items`` is size-probed by default (same pattern as
    pagerank's rank-vector dispatch): the frequent-item head is tiny at
    any sane ``min_support``, but a very low threshold over a 100 TB
    basket table could exceed broadcast limits — above
    ``broadcast_threshold`` frequent items the prune falls back to a
    shuffle semi-join. The probe costs one extra run of the (small)
    frequent-item aggregate over the checkpointed base.

    Note the base materialization makes this call EAGER (the
    localCheckpoint and the size probe run Spark jobs at construction
    time); the checkpoint blocks are released by the ContextCleaner once
    the returned DataFrame is garbage collected.
    """
    pairs_base = (
        df.select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"))
        .distinct()
        # materialize the narrow distinct base once (round 11, guide §2.4):
        # it feeds the frequent-item aggregate, its size probe (an eager
        # action), and BOTH sides of the pair self-join — unpersisted, the
        # full input scan + distinct re-ran per consumer
        .localCheckpoint()
    )
    return _frequent_pairs_from_base(
        pairs_base, min_support, broadcast_items, broadcast_threshold
    )


def _frequent_pairs_from_base(
    pairs_base: DataFrame,
    min_support: int,
    broadcast_items: bool | None = None,
    broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """:func:`frequent_pairs` body over an ALREADY materialized distinct
    ``(__b, __i)`` base — shared with :func:`association_rules` so its
    checkpointed base is not re-distincted and re-checkpointed a second
    time (round 12, ADVICE r11: one redundant full shuffle + duplicate
    checkpoint per call)."""
    freq_items = (
        pairs_base.groupBy("__i")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= int(min_support))
        .select("__i")
    )
    if broadcast_items is None:
        broadcast_items = freq_items.count() <= broadcast_threshold
    prune_side = F.broadcast(freq_items) if broadcast_items else freq_items
    pruned = pairs_base.join(prune_side, "__i", "left_semi")
    a = pruned.select(F.col("__b"), F.col("__i").alias("item_a"))
    b = pruned.select(F.col("__b"), F.col("__i").alias("item_b"))
    return (
        a.join(b, "__b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= int(min_support))
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    buckets: int = 32,
) -> DataFrame:
    """Shuffle-skew diagnostic: row counts per hash bucket of the join/agg
    key — the distribution a shuffle on ``key_col`` would produce with
    ``buckets`` reducers. Emits per-bucket rows with the share of the
    total; a healthy key shows share ≈ 1/buckets everywhere, a hot key
    shows one bucket holding a multiple of that.

    Uses the repo's portable md5 bucket (engine-replayable) rather than
    Spark's internal Murmur3, so the report itself is oracle-checkable;
    the SHAPE of the skew (max/avg ratio) is hash-invariant for hot-key
    detection even though bucket ids differ from Spark's own partitioner.
    One aggregate, no Python.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("long") % F.lit(int(buckets))
    ).alias("bucket")
    total = df.count()
    return (
        df.groupBy(bucket)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "n_rows",
            F.round(F.col("n_rows") / F.lit(float(total)) + F.lit(1e-9), 6).alias("share"),
        )
    )


def _cms_bucket(col: Column, d: int, width: int, seed: int) -> Column:
    """Row d's count-min bucket for a value: 60-bit md5 hash (engine-portable
    -- DuckDB computes the identical value from the same hex digest) mod
    width. Each depth row gets an independent hash via a distinct salt."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("", F.lit(f"cms{seed}_{d}"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width)).cast("int")


def count_min_sketch(
    df: DataFrame,
    col: str,
    width: int = 256,
    depth: int = 3,
    seed: int = 1,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a mergeable
    ``(d, bucket, cnt)`` table of ``depth * width`` rows.

    The sketch build is ONE map-side-combined aggregate over ``depth``
    exploded (row, bucket) pairs per input row -- the shuffle carries at
    most ``depth * width`` groups regardless of input size or column
    cardinality, so a 100 TB column sketches with a fixed-size exchange.
    Estimates are biased UP only (``est >= true``, whp within
    ``2n/width``); two sketches with the same (width, depth, seed) merge
    by bucket-wise addition (:func:`merge_count_min`) -- the
    partition/day/shard rollup never rescans history. NULLs are not
    counted (SQL COUNT semantics).
    """
    v = F.col(col)
    rows = df.where(v.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cms_bucket(v, d, width, seed).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__e")
    )
    return (
        rows.groupBy(F.col("__e.d").alias("d"), F.col("__e.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_count_min(*sketches: DataFrame) -> DataFrame:
    """Bucket-wise sum of count-min sketches built with identical
    (width, depth, seed). merge(build(A), build(B)) == build(A union B)
    exactly -- counters are plain sums."""
    if not sketches:
        raise ValueError("merge_count_min needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 3,
    seed: int = 1,
) -> DataFrame:
    """Point-frequency estimates for ``keys`` from a count-min sketch:
    min over the depth rows of the key's bucket counters (0 when a bucket
    is empty -- then the true count is provably 0).

    The probe side is the small relation (a key list, not the corpus);
    the join touches ``depth`` sketch rows per key. Output:
    ``(key_col, est)`` with ``est >= true_count`` always.
    """
    k = F.col(key_col)
    # NULL keys were never counted into the sketch — estimating them
    # against salt-only hash buckets would return arbitrary collisions
    keys = keys.where(k.isNotNull())
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cms_bucket(k, d, width, seed).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__e"),
    ).select(key_col, F.col("__e.d").alias("d"), F.col("__e.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def histogram_sketch(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Fixed-boundary histogram sketch: the mergeable quantile summary
    completing the sketch family (HLL = distinct, count-min = frequency,
    this = distribution).

    One map-side-combined aggregate to at most ``bins`` groups — flat
    shuffle at any input size, like :func:`count_min_sketch`. Values are
    clamped into [lo, hi] (out-of-range mass lands in the edge bins, so
    counts are never lost); NULLs are skipped. Bin math is plain IEEE
    arithmetic (no libm), bit-identical across engines, so estimates are
    DuckDB-oracle-able. Merge = bin-wise addition
    (:func:`merge_histograms`); deterministic, unlike sampled t-digests.

    Output: ``(bin, cnt)`` with 0 <= bin < bins.
    """
    if not (hi > lo) or bins < 1:
        raise ValueError("need hi > lo and bins >= 1")
    x = F.col(col).cast("double")
    b = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(bins))
    b = F.least(F.lit(bins - 1), F.greatest(F.lit(0), b)).cast("int")
    return (
        df.where(x.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histograms(*sketches: DataFrame) -> DataFrame:
    """Bin-wise sum of histogram sketches built with identical
    (lo, hi, bins); merge(build(A), build(B)) == build(A union B) exactly."""
    if not sketches:
        raise ValueError("merge_histograms needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def quantile_estimate(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: for each q, the upper
    edge of the first bin whose cumulative count reaches ``q * n``.
    Error is bounded by one bin width ((hi-lo)/bins) for in-range data.

    Runs entirely on the tiny sketch relation (cumulative window over
    <= bins rows, cross join with the literal q list) — no pass over the
    data. Output: ``(q, est)``.
    """
    from pyspark.sql.window import Window as W

    cum = sketch.withColumn(
        "__cum", F.sum("cnt").over(W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0))
    )
    total = sketch.agg(F.sum("cnt").alias("__n"))
    qdf = sketch.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    width = float(hi - lo) / bins
    return (
        qdf.crossJoin(F.broadcast(total))
        .join(
            cum,
            F.col("__cum") >= F.col("q") * F.col("__n") - F.lit(1e-9),
            "left",
        )
        .groupBy("q")
        .agg(F.min("bin").alias("__bin"))
        .select(
            "q",
            (F.lit(float(lo)) + (F.col("__bin") + 1) * F.lit(width)).alias("est"),
        )
    )


def cms_join_size_estimate(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches built on
    the join keys with identical (width, depth, seed): the sketch inner
    product ``min over d of sum_b cntA[d,b] * cntB[d,b]`` (Cormode &
    Muthukrishnan 2005, §4.2) — an upper bound on
    ``|A JOIN B|  =  sum_k fA(k) * fB(k)``, tight when collisions are
    rare.

    This is how an optimizer prices a join WITHOUT scanning either input
    again: both sketches are depth×width rows, the estimate is a join of
    two tiny relations. Output: one row ``(est)``.
    """
    a = sketch_a.select("d", "bucket", F.col("cnt").alias("__ca"))
    b = sketch_b.select("d", "bucket", F.col("cnt").alias("__cb"))
    return (
        a.join(b, ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__ip"))
        .agg(F.min("__ip").alias("est"))
    )


def histogram_sketch_grouped(
    df: DataFrame,
    key_cols: list[str],
    col: str,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Per-group fixed-boundary histogram sketch — the telemetry shape
    (latency distribution per endpoint, value distribution per event
    type): ``(keys..., bin, cnt)``, at most ``bins`` rows per group, one
    map-side-combined aggregate. Same clamping/NULL semantics and
    mergeability as :func:`histogram_sketch`."""
    if not (hi > lo) or bins < 1:
        raise ValueError("need hi > lo and bins >= 1")
    x = F.col(col).cast("double")
    b = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(bins))
    b = F.least(F.lit(bins - 1), F.greatest(F.lit(0), b)).cast("int")
    return (
        df.where(x.isNotNull())
        .groupBy(*key_cols, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantile_estimate_grouped(
    sketch: DataFrame,
    key_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Per-group quantiles from a grouped histogram sketch: cumulative
    window PARTITIONED BY the keys (<= ``bins`` rows per partition — never
    a global window), upper edge of the first bin reaching ``q * n_group``.
    Output: ``(keys..., q, est)``."""
    from pyspark.sql.window import Window as W

    cum = sketch.withColumn(
        "__cum",
        F.sum("cnt").over(
            W.partitionBy(*key_cols).orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
        ),
    ).withColumn("__n", F.sum("cnt").over(W.partitionBy(*key_cols)))
    qdf = sketch.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    width = float(hi - lo) / bins
    return (
        cum.crossJoin(F.broadcast(qdf))
        .where(F.col("__cum") >= F.col("q") * F.col("__n") - F.lit(1e-9))
        .groupBy(*key_cols, "q")
        .agg(F.min("bin").alias("__bin"))
        .select(
            *key_cols,
            "q",
            (F.lit(float(lo)) + (F.col("__bin") + 1) * F.lit(width)).alias("est"),
        )
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 10,
) -> DataFrame:
    """Association rules from frequent pairs (Agrawal & Srikant VLDB'94,
    rule-generation step): each frequent pair {a, b} yields the two rules
    a→b and b→a with

    - ``support``     pair baskets / all baskets,
    - ``confidence``  pair baskets / antecedent baskets,
    - ``lift``        confidence / (consequent baskets / all baskets).

    Costs :func:`frequent_pairs` + one distinct-basket item count + a
    broadcast of the (tiny) pair table against it — no new corpus-scale
    shuffles. Output: ``(antecedent, consequent, pair_count, support,
    confidence, lift)`` rounded to 6dp.
    """
    clean = df.where(F.col(item_col).isNotNull() & F.col(basket_col).isNotNull())
    # one checkpointed distinct (basket, item) base (round 11, guide §2.4)
    # serves the pair mining, both item-count broadcasts, and the basket
    # count — previously each consumer re-scanned and re-distincted df.
    # Built directly in frequent_pairs' (__b, __i) shape and handed to
    # _frequent_pairs_from_base (round 12, ADVICE r11): the public
    # frequent_pairs() entry used to re-distinct + re-checkpoint this very
    # relation — one redundant full shuffle and a duplicate checkpoint
    # materialization per call, now gone.
    base = (
        clean.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .distinct()
        .localCheckpoint()
    )
    pairs = _frequent_pairs_from_base(base, min_support=min_support)
    item_counts = (
        base.groupBy(F.col("__i").alias("__item"))
        .agg(F.count(F.lit(1)).alias("__n_item"))
    )
    n_baskets = base.select("__b").distinct().count()
    both = pairs.unionByName(
        pairs.select(
            F.col("item_b").alias("item_a"),
            F.col("item_a").alias("item_b"),
            "pair_count",
        )
    ).select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_count",
    )
    return (
        both.join(
            F.broadcast(item_counts.withColumnRenamed("__item", "antecedent")), "antecedent"
        )
        .withColumnRenamed("__n_item", "__n_a")
        .join(
            F.broadcast(item_counts.withColumnRenamed("__item", "consequent")), "consequent"
        )
        .withColumnRenamed("__n_item", "__n_c")
        .select(
            "antecedent",
            "consequent",
            "pair_count",
            F.round(F.col("pair_count") / F.lit(float(n_baskets)), 6).alias("support"),
            F.round(F.col("pair_count") / F.col("__n_a"), 6).alias("confidence"),
            F.round(
                (F.col("pair_count") / F.col("__n_a"))
                / (F.col("__n_c") / F.lit(float(n_baskets))),
                6,
            ).alias("lift"),
        )
    )


def cooccurrence_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 10,
    min_cosine: float = 0.0,
    top_per_item: int | None = None,
) -> DataFrame:
    """Item–item COSINE similarity over basket co-occurrence — the
    classic collaborative-filtering neighborhood model (Sarwar et al.,
    WWW'01): ``cos(i,j) = n_ij / sqrt(n_i * n_j)`` where ``n_i`` counts
    baskets containing i. Normalizing the raw pair counts kills the
    popularity bias that makes :func:`frequent_pairs` rank ubiquitous
    items together.

    Same a-priori-pruned shape as frequent_pairs (only frequent items can
    reach ``min_support`` pairs), plus two broadcast joins of the
    (small, pruned) item-count table to attach n_i / n_j. Optional
    top-``top_per_item`` by (cosine desc, item_b) per item_a via one
    window over the (already reduced) pair rows.

    Returns ``(item_a, item_b, pair_count, cosine)`` with item_a < item_b
    string order, cosine rounded 6dp.
    """
    pairs_base = (
        df.select(
            F.col(basket_col).alias("__b"),
            F.col(item_col).cast("string").alias("__i"),
        )
        .distinct()
        # same narrow-base checkpoint as frequent_pairs (round 11, guide
        # §2.4): four consumers (item counts + both self-join sides via
        # the prune, and item_counts again for na/nb) re-ran the input
        # scan + distinct otherwise
        .localCheckpoint()
    )
    item_counts = (
        pairs_base.groupBy("__i")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= int(min_support))
    )
    pruned = pairs_base.join(
        F.broadcast(item_counts.select("__i")), "__i", "left_semi"
    )
    a = pruned.select(F.col("__b"), F.col("__i").alias("item_a"))
    b = pruned.select(F.col("__b"), F.col("__i").alias("item_b"))
    pair_counts = (
        a.join(b, "__b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_count"))
        .where(F.col("pair_count") >= int(min_support))
    )
    na = item_counts.select(
        F.col("__i").alias("item_a"), F.col("__n").alias("__na")
    )
    nb = item_counts.select(
        F.col("__i").alias("item_b"), F.col("__n").alias("__nb")
    )
    scored = (
        pair_counts.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .select(
            "item_a",
            "item_b",
            "pair_count",
            F.round(
                F.col("pair_count") / F.sqrt(F.col("__na") * F.col("__nb")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= float(min_cosine))
    )
    if top_per_item is not None:
        w = Window.partitionBy("item_a").orderBy(
            F.col("cosine").desc(), F.col("item_b").asc()
        )
        scored = (
            scored.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= int(top_per_item))
            .drop("__rk")
        )
    return scored


# ---------------------------------------------------------------------------
# KMV (k minimum values) distinct sketch — the mergeable distinct-count
# summary that, unlike HLL, also supports INTERSECTION estimates
# (Beyer et al., SIGMOD'07). Hashing is md5-derived (no RNG), so sketches,
# merges, and estimates are bit-deterministic and SQL-replicable.
# ---------------------------------------------------------------------------

KMV_HASH_BITS = 48


def _kmv_hash(col: Column) -> Column:
    """Uniform [0, 1) hash of a value: first 12 md5 hex chars / 2^48."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10)
        .cast("double")
        / F.lit(float(2 ** KMV_HASH_BITS))
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest distinct hash values of
    ``value_col`` (one row per retained hash — a bounded k-row relation
    per group). Build is one distinct + one bounded per-group window;
    merge two sketches by unioning rows and re-taking the k smallest
    (:func:`kmv_merge`) — the classic mergeable-summary contract.

    NULL values are excluded (COUNT DISTINCT semantics).

    Scale shape: a direct per-group top-k window would move EVERY
    distinct hash of a group through one task. Instead the k smallest
    are taken in two stages — per (group, 32-bucket salt) first (fully
    parallel), then over the surviving ≤ 32·k rows per group — the
    standard parallel top-k contraction; the result set is identical
    (the k global minima always survive their bucket's top-k).
    """
    from pyspark.sql.window import Window

    n_buckets = 32
    hashed = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, _kmv_hash(F.col(value_col)).alias("kmv_hash"))
        .distinct()
        .withColumn(
            "__b", F.pmod(F.xxhash64(F.col("kmv_hash")), F.lit(n_buckets))
        )
    )
    w1 = Window.partitionBy(*group_cols, "__b").orderBy("kmv_hash")
    pruned = (
        hashed.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= k)
        .drop("__rn", "__b")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("kmv_hash")
    return (
        pruned.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= k)
        .select(*group_cols, "kmv_hash")
    )


def kmv_merge(a: DataFrame, b: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Merge two KMV sketches: union the retained hashes per group and
    keep the k smallest distinct — exactly the sketch of the unioned
    inputs (KMV's merge is lossless w.r.t. rebuild)."""
    from pyspark.sql.window import Window

    u = a.unionByName(b).distinct()
    w = Window.partitionBy(*group_cols).orderBy("kmv_hash")
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(*group_cols, "kmv_hash")
    )


def kmv_distinct_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Distinct-count estimate per group: ``(k-1)/h_k`` where ``h_k`` is
    the k-th smallest retained hash; EXACT (the retained count) when the
    group holds fewer than k distinct values. Deterministic — both the
    sketch and the estimator are pure hash arithmetic, so a SQL oracle
    reproduces the estimate bit-for-bit (unlike RNG-seeded sketches)."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"), F.max("kmv_hash").alias("__hk")
    )
    est = F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
        F.lit(float(k - 1)) / F.col("__hk")
    )
    return agg.select(
        *group_cols, F.round(est, 4).alias("distinct_estimate")
    )


def kmv_intersection_estimate(
    a: DataFrame,
    b: DataFrame,
    k: int = 64,
    label_a: str = "a",
    label_b: str = "b",
) -> DataFrame:
    """Intersection-size estimate between two UNGROUPED sketches (each a
    1-group relation of ``kmv_hash`` rows): take the k smallest hashes of
    the union; the fraction ρ of those present in BOTH sketches estimates
    the Jaccard, and ``|A∩B| ≈ ρ · D(A∪B)`` with ``D`` the union's KMV
    estimate — the Beyer et al. estimator. This is the operation HLL
    cannot do (inclusion-exclusion on HLL compounds errors; KMV
    intersects natively).

    Returns one row: ``(k_used, jaccard_estimate, union_estimate,
    intersection_estimate)``. Deterministic and SQL-replicable.
    """
    from pyspark.sql.window import Window

    ta = a.select(F.col("kmv_hash")).distinct().withColumn("__ina", F.lit(1))
    tb = b.select(F.col("kmv_hash")).distinct().withColumn("__inb", F.lit(1))
    u = (
        ta.join(tb, "kmv_hash", "full_outer")
        .select(
            "kmv_hash",
            F.coalesce(F.col("__ina"), F.lit(0)).alias("__ina"),
            F.coalesce(F.col("__inb"), F.lit(0)).alias("__inb"),
        )
    )
    w = Window.orderBy("kmv_hash")
    topu = u.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)
    agg = topu.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("kmv_hash").alias("__hk"),
        F.sum((F.col("__ina") * F.col("__inb"))).alias("__both"),
    )
    d_union = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("__hk"))
    jac = F.col("__both").cast("double") / F.col("k_used")
    return agg.select(
        "k_used",
        F.round(jac, 6).alias("jaccard_estimate"),
        F.round(d_union, 4).alias("union_estimate"),
        F.round(jac * d_union, 4).alias("intersection_estimate"),
    )
