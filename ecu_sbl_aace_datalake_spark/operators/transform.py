"""Column-level transforms: casts, null handling, renames, index columns.

Reference parity (common.py):
- ``castColumns`` / ``castColumnsToInt`` (836-878) → :func:`cast_columns`.
  Same semantics (null-on-failure cast, ``{col}_orig`` kept when casts fail,
  new column at the original ordinal position) but validation is a SINGLE
  aggregate pass over all columns instead of one count() job per column
  (SURVEY.md §8 #10).
- ``setNullToZero`` (772-779) → :func:`set_null_to_zero` (fillna; silently
  skips absent columns like the reference common.py:775).
- ``setDFTextWhenNull`` (762-764) → :func:`set_text_when_null` (coalesce).
- ``addIndexCol`` (888-897) → :func:`add_index_col`: contiguous ids via
  ``row_number()`` window instead of ``monotonically_increasing_id`` which is
  partition-encoded and non-contiguous (SURVEY.md §8 #4).
- ``rename_columns_with_prefix`` (807-810), ``rename_columns_strip_prefix``
  (818-828) → same names.
- ``createExtraRow`` (787-799) → :func:`create_extra_row`.
- ``dfShape`` (905-908) → :func:`df_shape`.
- ``insertValueIntoList`` (593-607, mutates input — SURVEY.md §8 #7) →
  :func:`insert_value_into_list`, pure. ``replaceValueInList`` (615-616) →
  :func:`replace_value_in_list`.

Scale notes:
- cast validation: one job, one aggregate row, instead of N full scans.
- ``add_index_col`` with no partition key is a global row_number → single
  task for the final window. That is correct-but-serial by design: use it
  for *small* dimension tables (its reference use case). For fact-scale data
  pass ``partition_by`` or use ``zipWithIndex``-free monotonic ids.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def set_text_when_null(df: DataFrame, col_name: str, text: str) -> DataFrame:
    """Replace NULLs in one string column with a literal (reference
    ``setDFTextWhenNull`` common.py:762-764) — as coalesce, not when/otherwise."""
    return df.withColumn(col_name, F.coalesce(F.col(col_name), F.lit(text)))


def set_null_to_zero(df: DataFrame, col_names: str | Sequence[str]) -> DataFrame:
    """Replace NULLs with 0 across listed columns, silently skipping columns
    not present (reference ``setNullToZero`` common.py:772-779)."""
    cols = [col_names] if isinstance(col_names, str) else list(col_names)
    present = [c for c in cols if c in df.columns]
    if not present:
        return df
    return df.fillna(0, subset=present)


def cast_columns(
    df: DataFrame,
    col_names: str | Sequence[str],
    cast: str = "int",
    keep_failed_orig: bool = True,
) -> tuple[DataFrame, dict[str, int]]:
    """Safe cast with validation (reference ``castColumns`` common.py:836-869).

    Per column: stale ``{c}_orig`` is dropped, the original is renamed to
    ``{c}_orig``, and a cast column is added at the original ordinal position
    with null-on-failure semantics (Spark non-ANSI cast). Validation counts
    rows where the original was non-null but the cast is null — computed for
    ALL columns in ONE aggregate job (the reference ran a count() per column,
    SURVEY.md §8 #10). Columns with zero failures get their ``_orig``
    dropped; failing columns keep it (matching the reference's behavior).

    Returns (new_df, {col: n_failed}).
    """
    cols = [col_names] if isinstance(col_names, str) else list(col_names)
    out = df
    for c in cols:
        orig = f"{c}_orig"
        if orig in out.columns:
            out = out.drop(orig)
        ordered = list(out.columns)
        out = out.withColumnRenamed(c, orig).withColumn(c, F.col(orig).cast(cast))
        # restore original ordinal position: the new cast col replaces the
        # original's slot, _orig goes right after it (reference keeps both
        # adjacent, common.py:846-852)
        new_order = []
        for name in ordered:
            if name == c:
                new_order.extend([c, orig])
            else:
                new_order.append(name)
        out = out.select(*new_order)

    # single validation pass for all columns
    agg_exprs = [
        F.sum(
            (F.col(f"{c}_orig").isNotNull() & F.col(c).isNull()).cast("long")
        ).alias(c)
        for c in cols
    ]
    failures_row = out.agg(*agg_exprs).first()
    failures = {c: int(failures_row[c] or 0) for c in cols}

    for c in cols:
        if failures[c] == 0 or not keep_failed_orig:
            out = out.drop(f"{c}_orig")
    return out, failures


def cast_columns_to_int(df: DataFrame, col_names: str | Sequence[str]) -> tuple[DataFrame, dict[str, int]]:
    """Reference ``castColumnsToInt`` common.py:877-878."""
    return cast_columns(df, col_names, cast="int")


def add_index_col(
    df: DataFrame,
    col_name: str = "index",
    index_start: int = 0,
    order_by: str | Sequence[str] | None = None,
    new_col_pos: int = 0,
) -> DataFrame:
    """Add a CONTIGUOUS surrogate index column ``index_start+1, +2, ...`` at
    ordinal ``new_col_pos``, case-insensitively replacing an existing column
    of that name (reference ``addIndexCol`` common.py:888-897).

    The reference used ``monotonically_increasing_id()+1+indexStart`` which
    is partition-encoded and non-contiguous (SURVEY.md §8 #4); contiguous,
    run-stable ids require ``row_number()`` over an explicit order. With
    ``order_by=None`` the first column is used. The final window is a single
    partition — intended for small (post-aggregation dimension) tables.
    """
    keep = [c for c in df.columns if c.lower() != col_name.lower()]
    out = df.select(*keep)
    order_cols = (
        [order_by] if isinstance(order_by, str)
        else list(order_by) if order_by is not None
        else [keep[0]]
    )
    w = Window.orderBy(*[F.col(c).asc() for c in order_cols])
    out = out.withColumn(col_name, (F.row_number().over(w) + index_start).cast("long"))
    cols = [c for c in out.columns if c != col_name]
    cols.insert(new_col_pos, col_name)
    return out.select(*cols)


def add_index_col_distributed(
    df: DataFrame,
    col_name: str = "index",
    index_start: int = 0,
    order_by: str | Sequence[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous global ids WITHOUT a single-partition window — the
    fact-scale complement to :func:`add_index_col`.

    Two-phase (the classic zipWithIndex shape, kept in the DataFrame API):

    1. ``repartitionByRange`` on the order keys, so partition p holds keys
       ≤ partition p+1's, then count rows per partition — ONE extra pass
       producing one row per partition (collected: KBs even at 10⁵ tasks).
    2. ``row_number()`` windowed per partition + the partition's cumulative
       offset (a broadcast literal map) — fully parallel, no global sort
       bottleneck.

    Ids are ``index_start+1 … index_start+count`` in ``order_by`` order,
    exactly like :func:`add_index_col`; ties at range-partition boundaries
    get arbitrary-but-contiguous ids (same caveat as any row_number over a
    non-total order). Cost: one extra job for the counts; at 100 TB this is
    the difference between a 1000-task stage and one task sorting the world.

    The ranged intermediate is locally checkpointed (MEMORY_AND_DISK)
    because range-partition bounds come from sampling that is NOT
    seed-stable across jobs — without pinning it, the counts pass and the
    id pass could see different partitionings and silently mis-offset.
    """
    order_cols = (
        [order_by] if isinstance(order_by, str)
        else list(order_by) if order_by is not None
        else [df.columns[0]]
    )
    keep = [c for c in df.columns if c.lower() != col_name.lower()]
    out = df.select(*keep)
    n_part = num_partitions or out.sparkSession.sparkContext.defaultParallelism
    ranged = out.repartitionByRange(
        n_part, *[F.col(c).asc() for c in order_cols]
    ).withColumn("__pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=False)
    counts = dict(
        ranged.groupBy("__pid").count().orderBy("__pid")
        .select("__pid", "count").collect()
    )
    offsets: dict[int, int] = {}
    acc = index_start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_map = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = Window.partitionBy("__pid").orderBy(*[F.col(c).asc() for c in order_cols])
    out = (
        ranged.withColumn(
            col_name,
            (F.row_number().over(w) + F.element_at(offset_map, F.col("__pid"))).cast("long"),
        )
        .drop("__pid")
    )
    return out.select(col_name, *keep)


def add_index_col_quantile(
    df: DataFrame,
    order_by: str,
    col_name: str = "index",
    index_start: int = 0,
    num_partitions: int | None = None,
    relative_error: float = 0.001,
) -> DataFrame:
    """Contiguous global ids with NO materialization — the
    :func:`add_index_col_distributed` variant from NEXT.md #12.

    The checkpointed variant pins its range partitioning because
    ``repartitionByRange`` bounds come from non-seed-stable sampling. Here
    the partition id is instead a PURE FUNCTION of the (numeric) order key:
    bucket bounds are driver-computed once via ``approxQuantile`` (a
    deterministic Greenwald–Khanna pass over one column), and every
    downstream job recomputes identical assignments — so the counts pass
    and the id pass can both re-scan the source without pinning anything.

    Trade: two source scans (counts + ids) instead of one materialized
    intermediate; at 100 TB the counts scan reads a single column and the
    cluster keeps no copy of the table in memory/disk cache. Skewed keys
    make buckets uneven (quantile bounds collapse) but never incorrect —
    equal keys always share a bucket. Nulls sort first (bucket 0).

    Ids are ``index_start+1 … index_start+count`` ordered by ``order_by``
    (ties arbitrary-but-contiguous, as any row_number over a non-total
    order).
    """
    keep = [c for c in df.columns if c.lower() != col_name.lower()]
    out = df.select(*keep)
    n_part = num_partitions or out.sparkSession.sparkContext.defaultParallelism
    probs = [i / n_part for i in range(1, n_part)]
    bounds = sorted(
        set(out.stat.approxQuantile(order_by, probs, relative_error))
    )
    if bounds:
        b_arr = F.array(*[F.lit(b).cast("double") for b in bounds])
        pid = F.size(
            F.filter(b_arr, lambda b: F.col(order_by).cast("double") > b)
        )
    else:
        pid = F.lit(0)
    bucketed = out.withColumn("__pid", pid)
    counts = dict(
        bucketed.groupBy("__pid").count().select("__pid", "count").collect()
    )
    offsets: dict[int, int] = {}
    acc = index_start
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    offset_map = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = Window.partitionBy("__pid").orderBy(F.col(order_by).asc())
    indexed = bucketed.withColumn(
        col_name,
        (F.row_number().over(w) + F.element_at(offset_map, F.col("__pid"))).cast(
            "long"
        ),
    ).drop("__pid")
    return indexed.select(col_name, *keep)


def rename_columns_with_prefix(df: DataFrame, prefix: str) -> DataFrame:
    """Prefix every column ``{prefix}_{col}`` (reference common.py:807-810)."""
    return df.toDF(*[f"{prefix}_{c}" for c in df.columns])


def rename_columns_strip_prefix(df: DataFrame, prefixes: str | Sequence[str]) -> DataFrame:
    """Strip prefix(es) plus a leading ``_`` from matching columns, skipping
    a rename that would produce an empty name (reference common.py:818-828)."""
    prefix_list = [prefixes] if isinstance(prefixes, str) else list(prefixes)
    new_names = []
    for c in df.columns:
        new = c
        for p in prefix_list:
            if new.startswith(p):
                candidate = new[len(p):].lstrip("_")
                if candidate:
                    new = candidate
                break
        new_names.append(new)
    return df.toDF(*new_names)


def create_extra_row(
    spark: Any,
    df: DataFrame,
    leading_values: Sequence[Any],
    zero_fill_cols: str | Sequence[str] = (),
) -> DataFrame:
    """Synthesize one row (given leading values, remaining columns None),
    zero-fill the listed columns, union it on, re-sort by the first column
    (reference ``createExtraRow`` common.py:787-799; union at 797).

    Positional union with the schema copied from the target, exactly like the
    reference's ``T.Row`` + union."""
    n_missing = len(df.columns) - len(leading_values)
    row_data = list(leading_values) + [None] * n_missing
    extra = spark.createDataFrame([tuple(row_data)], df.schema)
    out = df.unionByName(extra)
    if zero_fill_cols:
        out = set_null_to_zero(out, zero_fill_cols)
    return out.orderBy(df.columns[0])


def df_shape(df: DataFrame) -> tuple[int, int, list[str]]:
    """(row_count, n_cols, columns) — triggers one count() action (reference
    ``dfShape`` common.py:905-908)."""
    return df.count(), len(df.columns), list(df.columns)


def split_by_hash(
    df: DataFrame,
    id_col: str,
    ratios: dict[str, float],
    out_col: str = "split",
    salt: str = "split",
) -> DataFrame:
    """Deterministic dataset split (train/val/test) by content hash.

    The assignment depends only on the row's id and the salt — stable
    across runs, machines, partitionings, and engine versions (md5, not
    xxhash, so any system can reproduce the split). This is the
    training-data splitting pattern: never rand() (unstable under retries),
    never row_number (unstable under repartitioning).

    ``ratios`` e.g. ``{"train": 0.9, "val": 0.05, "test": 0.05}``; must sum
    to ~1. The first 8 hex chars of md5(salt || id) map to [0, 1).
    """
    total = sum(ratios.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"ratios must sum to 1, got {total}")
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("double") / F.lit(float(0xFFFFFFFF))
    expr = None
    cumulative = 0.0
    items = list(ratios.items())
    for name, frac in items[:-1]:
        cumulative += frac
        cond = bucket < cumulative
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last_name = items[-1][0]
    expr = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn(out_col, expr)


def insert_value_into_list(values: Sequence[Any], old_val: Any, new_val: Any) -> list[Any]:
    """Insert ``new_val`` before ``old_val`` then move ``old_val`` to the end;
    append ``old_val`` absent; no-op if ``new_val`` already present.
    PURE — reference ``insertValueIntoList`` common.py:593-607 mutated its
    input in two branches (SURVEY.md §8 #7)."""
    out = list(values)
    if new_val in out:
        return out
    if old_val not in out:
        out.append(new_val)
        return out
    idx = out.index(old_val)
    out.remove(old_val)
    out.insert(idx, new_val)
    out.append(old_val)
    return out


def replace_value_in_list(values: Sequence[Any], old_val: Any, new_val: Any) -> list[Any]:
    """Elementwise replace (reference common.py:615-616)."""
    return [new_val if v == old_val else v for v in values]


def hash_bucket(id_col: str, salt: str) -> Column:
    """Deterministic uniform [0,1) bucket from ``md5(salt || id)`` — the
    engine-reproducible randomness primitive shared by :func:`split_by_hash`
    and :func:`stratified_sample_by_hash` (md5, not xxhash, so any system —
    including a SQL oracle — reproduces the assignment bit-for-bit)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("double") / F.lit(float(0xFFFFFFFF))


def stratified_sample_by_hash(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its hash bucket
    falls below its stratum's fraction.

    Unlike ``df.sampleBy`` (Bernoulli on a partition-seeded RNG — different
    rows on every retry/repartition), the kept set depends only on
    (salt, id, fractions): stable across runs, engines, and cluster layouts,
    which is what training-data pipelines need for reproducible subsampling.
    Strata absent from ``fractions`` fall back to ``default_fraction``.

    Scale: a pure narrow filter — no shuffle, pushes to the scan when
    ``strata_col``/``id_col`` are scan columns.
    """
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0,1], got {frac}")
    frac_col: Column = F.lit(float(default_fraction))
    expr = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        expr = F.when(cond, float(frac)) if expr is None else expr.when(cond, float(frac))
    if expr is not None:
        frac_col = expr.otherwise(float(default_fraction))
    return df.where(hash_bucket(id_col, salt) < frac_col)


def sample_fixed_n(
    df: DataFrame,
    id_col: str,
    n: int,
    salt: str = "sample",
    weight_col: str | None = None,
) -> DataFrame:
    """Deterministic fixed-size sample without replacement: the global ``n``
    rows with the smallest hash priority. With ``weight_col`` the priority is
    ``-ln(u)/w`` (Efraimidis–Spirakis exponential keys on a hash-derived
    uniform), giving weight-proportional inclusion — the reproducible
    replacement for reservoir sampling in training pipelines, where rand()
    resampling under retries silently changes the dataset.

    Scale: orderBy+limit plans as TakeOrderedAndProject — each partition
    keeps a local n-row heap, one tiny merge at the end. No full sort, no
    full shuffle; cost is a scan + n·log(n) heap work per partition.
    u ∈ (0,1] via (h+1)/2^32 so ln(u) is finite; ties (hash collisions)
    break on id for full determinism.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(1 << 32))
    if weight_col:
        # rows with non-positive/null weight are unsampleable by definition
        df = df.where(F.col(weight_col) > 0)
        pri = -F.log(u) / F.col(weight_col).cast("double")
    else:
        pri = u
    return (
        df.withColumn("__pri", pri)
        .orderBy(F.col("__pri").asc(), F.col(id_col).asc())
        .limit(n)
        .drop("__pri")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str] | str,
    cap: int,
    id_col: str,
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-group contribution cap (VERDICT r05 item #5):
    keep at most ``cap`` rows per group, chosen by md5-hash priority
    (salt + id; id tiebreak) — how RefinedWeb/C4-style curation bounds
    any single domain/source's share of the corpus without a global sort.

    Selection depends only on (salt, id, cap): stable across runs,
    engines, retries, and partitionings — the same reproducibility
    contract as :func:`stratified_sample_by_hash`. Groups under the cap
    pass through whole.

    Scale: ONE window over the group key (one shuffle on ``group_cols``,
    rank-limited map-side by the WindowGroupLimit pushdown since the
    filter is rn <= cap) — never a global order. Skewed groups cost what
    any per-group operator costs; the cap itself is the skew REMEDY
    downstream.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    pri = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(*groups).orderBy(pri.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(cap))
        .drop("__rn")
    )


def cap_per_group_bytes(
    df: DataFrame,
    group_cols: Sequence[str] | str,
    bytes_col: str,
    budget: int,
    id_col: str,
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-group BYTE budget — the size-aware sibling of
    :func:`cap_per_group`: admit rows in md5-hash priority order (salt +
    id; id tiebreak) while the group's cumulative admitted bytes stay
    within ``budget``. The admission rule is the prefix cumsum: a row is
    kept iff the inclusive running sum of ``bytes_col`` over all
    earlier-priority rows (kept or not) is ≤ ``budget`` — so the kept
    set is a PREFIX of the priority order, replayable from (salt, id,
    budget) alone. A later small row does NOT back-fill around an
    earlier over-budget row (knapsack back-fill would make admission
    depend on the whole group, breaking the prefix/replay property the
    streaming ingest relies on — see ``foreach_batch_corpus_ingest``'s
    cross-batch byte state).

    Rows with NULL/negative byte counts are rejected (a crawl record
    with unknown size cannot be budgeted). A single row larger than the
    whole budget blocks its group's tail by design — the same contract
    as a stream that admits in arrival order.

    Scale: ONE window over the group key (one shuffle on ``group_cols``)
    computing the running sum; no global order, no second pass.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    pri = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    b = F.col(bytes_col).cast("long")
    w = (
        Window.partitionBy(*groups)
        .orderBy(pri.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.where(b.isNotNull() & (b >= 0))
        .withColumn("__cum", F.sum(b).over(w))
        .where(F.col("__cum") <= int(budget))
        .drop("__cum")
    )


def cap_per_group_bytes_map(
    df: DataFrame,
    group_col: str,
    bytes_col: str,
    budgets: dict[str, int],
    id_col: str,
    default_budget: int | None = None,
    salt: str = "cap",
) -> DataFrame:
    """:func:`cap_per_group_bytes` with a PER-GROUP budget table — the
    data-recipe form ("200 GB of en, 50 GB of de, everything else
    uncapped") used for per-language corpus budgets. ``budgets`` maps
    group value → byte budget; groups absent from the map get
    ``default_budget`` (``None`` = unlimited — admission still rejects
    NULL/negative byte rows, the budgeting contract).

    Identical admission rule (md5-priority prefix cumsum, replayable
    from (salt, id, budget) alone) with the budget resolved per row
    from a literal CASE — the budget table is constant and tiny, so the
    plan stays ONE window over the group key, zero extra joins.
    """
    pri = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    b = F.col(bytes_col).cast("long")
    w = (
        Window.partitionBy(group_col)
        .orderBy(pri.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget_expr = F.lit(
        None if default_budget is None else int(default_budget)
    ).cast("long")
    for g, lim in budgets.items():
        if lim < 0:
            raise ValueError(f"budget for {g!r} must be >= 0")
        budget_expr = F.when(
            F.col(group_col) == g, F.lit(int(lim)).cast("long")
        ).otherwise(budget_expr)
    return (
        df.where(b.isNotNull() & (b >= 0))
        .withColumn("__cum", F.sum(b).over(w))
        .withColumn("__lim", budget_expr)
        .where(F.col("__lim").isNull() | (F.col("__cum") <= F.col("__lim")))
        .drop("__cum", "__lim")
    )


def schema_diff(old: DataFrame, new: DataFrame) -> dict[str, list]:
    """Schema drift report between two table versions: added / removed /
    type-changed columns (by name; order changes are not drift). The
    guardrail an append pipeline checks before writing a batch whose
    upstream may have changed shape.
    """
    old_types = {f.name: f.dataType for f in old.schema.fields}
    new_types = {f.name: f.dataType for f in new.schema.fields}
    return {
        "added": sorted(set(new_types) - set(old_types)),
        "removed": sorted(set(old_types) - set(new_types)),
        "type_changed": sorted(
            (c, old_types[c].simpleString(), new_types[c].simpleString())
            for c in set(old_types) & set(new_types)
            if old_types[c] != new_types[c]
        ),
    }


def conform_to_schema(
    df: DataFrame, target: "StructType", strict_extras: bool = True
) -> DataFrame:
    """Reshape a batch to a target schema: missing columns appear as typed
    nulls, matching columns cast to the target type (null-on-failure in
    non-ANSI mode, consistent with :func:`cast_columns`), columns ordered as
    the target. Extra columns raise by default (silent data loss otherwise)
    or are dropped with ``strict_extras=False``.

    Pure projection — no shuffle; pushes into the scan like any select.
    """
    have = set(df.columns)
    extras = have - {f.name for f in target.fields}
    if extras and strict_extras:
        raise ValueError(
            f"batch has columns not in target schema: {sorted(extras)} "
            "(pass strict_extras=False to drop)"
        )
    cols = [
        (
            F.col(f.name).cast(f.dataType)
            if f.name in have
            else F.lit(None).cast(f.dataType)
        ).alias(f.name)
        for f in target.fields
    ]
    return df.select(*cols)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
    by_col: str | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in a split
    by hash bucket, with bucket boundaries proportional to ``weights`` —
    reproducible across runs/engines/partitionings (no RNG), unlike
    ``randomSplit`` whose assignment changes with partition layout.

    ``by_col`` switches the hash to a GROUP key (e.g. source domain or
    cluster id): every row of a group gets the same split, the standard
    leakage guard so near-duplicates sharing a group never straddle
    train/test. Pure narrow projection — no shuffle, no action.
    """
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    key = F.col(by_col if by_col else id_col).cast("string")
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), key)), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(1 << 32))
    )
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = u < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1])
    )
    return df.withColumn(out_col, expr)


def negative_samples_ring(
    df: DataFrame,
    id_col: str,
    k: int = 2,
    n_buckets: int = 32,
    seed: int = 1,
) -> DataFrame:
    """Deterministic pseudo-random negative sampling for contrastive
    training pairs: each id gets ``k`` negatives, reproducibly, with no
    RNG and no global sort.

    Ids are hashed (md5, seeded) into ``n_buckets`` rings; within a
    bucket, ids are ordered by hash and each takes the next ``k``
    neighbors (wrapping). The hash order is a fixed pseudo-random
    permutation, so neighbors are unrelated ids — the standard cheap
    negative pool. Windows are PARTITIONED by bucket (each ~n/buckets
    rows), never global: at 100 TB, raise ``n_buckets`` so per-bucket
    sort stays in-memory; determinism is unaffected.

    Buckets with a single id yield no negatives; buckets with fewer than
    ``k+1`` ids yield fewer (duplicates collapse, self excluded).
    Output: ``(id_col, neg_id)``.
    """
    from pyspark.sql.window import Window as W

    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("", F.lit(f"neg{seed}_"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    base = df.select(F.col(id_col)).where(F.col(id_col).isNotNull()).distinct().select(
        id_col,
        F.pmod(h, F.lit(n_buckets)).cast("int").alias("__b"),
        h.alias("__h"),
    )
    w = W.partitionBy("__b").orderBy("__h", id_col)
    ranked = base.select(
        id_col,
        "__b",
        (F.row_number().over(w) - 1).alias("__r"),
        F.count(F.lit(1)).over(W.partitionBy("__b")).alias("__n"),
    )
    probes = ranked.select(
        id_col,
        "__b",
        "__r",
        F.explode(
            F.array_distinct(
                F.array(*[F.pmod(F.col("__r") + F.lit(j), F.col("__n")) for j in range(1, k + 1)])
            )
        ).alias("__nr"),
    ).where(F.col("__nr") != F.col("__r"))
    peers = ranked.select(
        F.col(id_col).alias("neg_id"), F.col("__b"), F.col("__r").alias("__nr")
    )
    return probes.join(peers, ["__b", "__nr"]).select(id_col, "neg_id")


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """2-D Pareto frontier (skyline): rows not dominated by any other —
    dominated means another row has lower-or-equal x and higher-or-equal
    y, strict in at least one. Minimizes x, maximizes y; negate columns
    on the way in for other orientations. Identical duplicate points all
    survive (domination needs a strict edge).

    Sort-based, not the O(n²) NOT-EXISTS join: collapse to per-x maxima
    (one aggregate), then one running-max window over the DISTINCT x rows
    (strictly-preceding ROWS frame — no float epsilons) decides which x
    groups survive; the original rows matching (x, ymax) join back. The
    distinct-x window is global — use on aggregated / dimension-sized
    inputs (the documented single-partition-window tradeoff); the oracle
    cross-checks with an independent NOT EXISTS formulation.
    """
    clean = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    per_x = clean.groupBy(F.col(x_col).alias("__x")).agg(
        F.max(F.col(y_col)).alias("__ymax")
    )
    w = Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)
    frontier_x = per_x.withColumn("__prev", F.max("__ymax").over(w)).where(
        F.col("__prev").isNull() | (F.col("__prev") < F.col("__ymax"))
    )
    return clean.join(
        frontier_x,
        (clean[x_col] == frontier_x["__x"]) & (clean[y_col] == frontier_x["__ymax"]),
    ).drop("__x", "__ymax", "__prev")


_US = chr(31)   # unit separator: joins canonical row fields
_NULMARK = chr(0)  # distinguishes SQL NULL from empty string


def _row_hash60(use: list[str]) -> Column:
    # canonical row string: unit-separator joined, NUL marking nulls, so
    # ("a", null) and ("a", "") hash differently; first 15 md5 hex chars
    # parsed to a 60-bit integer (conv base 16 -> 10)
    canon = F.concat_ws(
        _US,
        *[F.coalesce(F.col(c).cast("string"), F.lit(_NULMARK)) for c in use],
    )
    return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("decimal(38,0)")


def table_fingerprint(
    df: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Order-independent content checksum of a table: per-row md5 over the
    canonicalized column string, the first 15 hex chars parsed to a 60-bit
    integer, SUMMED into one DECIMAL(38,0) — plus the row count. Two
    tables hold identical row multisets iff (n_rows, checksum) match
    (modulo negligible collision odds in the 60-bit sum).

    The integrity primitive behind migration/replication verification at
    100 TB: one pass, map-side partial aggregation, no sort — only tiny
    (count, sum) partial states move; checksums of SHARDS ADD, so
    per-shard fingerprints roll up to the table fingerprint for free
    (sum/count are the mergeable state).

    Callers pre-cast floating/temporal columns to an explicitly formatted
    type (e.g. ``CAST(x AS DECIMAL(18,2))``) so the string form is
    engine-portable.
    """
    use = cols or df.columns
    return df.select(_row_hash60(use).alias("__h")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("__h").cast("decimal(38,0)").alias("checksum"),
    )


def grouped_fingerprint(
    df: DataFrame, group_col: str, cols: list[str] | None = None
) -> DataFrame:
    """Per-group content checksums (same row hash as
    :func:`table_fingerprint`, grouped): diffing two table versions by
    partition key narrows a mismatch to the partitions that changed
    without comparing any row data — the incremental-verification
    companion to snapshot_diff."""
    use = cols or [c for c in df.columns if c != group_col]
    return (
        df.select(F.col(group_col), _row_hash60(use).alias("__h"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("__h").cast("decimal(38,0)").alias("checksum"),
        )
    )


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    n_folds: int = 5,
    fold_key: str | None = None,
    prior_weight: float = 10.0,
    hash_algo: str = "xxhash64",
) -> DataFrame:
    """Leakage-free (out-of-fold) target encoding: each row's category is
    encoded with the label mean computed from the OTHER folds only, plus
    additive smoothing toward the global mean (``prior_weight`` pseudo
    counts) — the standard tabular-ML categorical encoder, done without
    ever training on a row's own label.

    Deterministic folds: ``hash(fold_key) pmod n_folds`` (fold_key
    defaults to cat_col — pass the row id for proper row-level folds);
    ``hash_algo`` picks xxhash64 (fastest) or an md5-prefix bucket
    (bit-replicable by any engine with md5, for cross-engine checks).
    All-aggregate implementation: one (cat, fold) aggregate, one global
    aggregate, and the out-of-fold mean is (cat_total - own_fold) /
    (cat_cnt - own_fold_cnt) via a broadcast-sized join — no per-fold
    re-scan, no window over the fact table. Adds ``(fold, te_<cat_col>)``.
    """
    key = F.col(fold_key) if fold_key else F.col(cat_col)
    if hash_algo == "md5":
        h = F.conv(
            F.substring(F.md5(key.cast("string")), 1, 15), 16, 10
        ).cast("long")
        fold = F.pmod(h, F.lit(n_folds)).cast("int")
    elif hash_algo == "xxhash64":
        fold = F.pmod(F.xxhash64(key), F.lit(n_folds)).cast("int")
    else:
        raise ValueError(f"unknown hash_algo {hash_algo!r}")
    tagged = df.withColumn("fold", fold)
    # count only labeled rows so numerator and denominator cover the same
    # set — NULL labels add nothing to sums and must add nothing to counts
    # (keeps the OOF means consistent with the avg()-based global mean)
    per_fold = tagged.groupBy(cat_col, "fold").agg(
        F.sum(F.col(label_col).cast("double")).alias("__s"),
        F.count(F.col(label_col)).alias("__c"),
    )
    per_cat = per_fold.groupBy(cat_col).agg(
        F.sum("__s").alias("__cat_s"), F.sum("__c").alias("__cat_c")
    )
    glob = df.agg(
        F.avg(F.col(label_col).cast("double")).alias("__gmean")
    )
    enc = (
        per_fold.join(per_cat, cat_col)
        .crossJoin(F.broadcast(glob))
        .select(
            cat_col,
            "fold",
            (
                (
                    F.col("__cat_s") - F.col("__s")
                    + F.lit(float(prior_weight)) * F.col("__gmean")
                )
                / (F.col("__cat_c") - F.col("__c") + F.lit(float(prior_weight)))
            ).alias(f"te_{cat_col}"),
        )
    )
    return tagged.join(F.broadcast(enc), [cat_col, "fold"], "left")


def weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Per-group weighted median: the smallest value whose cumulative
    weight reaches half the group's total weight.

    Deterministic under ties by construction: the cumulative weight uses
    a RANGE frame ordered by value, so every row of an equal-value run
    sees the same cumulative weight (no arbitrary intra-tie order), and
    the median is the MIN qualifying value. Weights accumulate as exact
    decimals. One shuffle on the group key; the per-group sort is the
    irreducible cost of any exact quantile.
    """
    keys = list(by or [])
    part = [F.col(k) for k in keys] if keys else [F.lit(1)]
    w_rng = (
        Window.partitionBy(*part)
        .orderBy(F.col(value_col).asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*part)
    wd = F.col(weight_col).cast("decimal(18,6)")
    base = df.where(
        F.col(value_col).isNotNull()
        & F.col(weight_col).isNotNull()
        & (F.col(weight_col) > 0)
    )
    cum = base.withColumn("__cw", F.sum(wd).over(w_rng)).withColumn(
        "__tw", F.sum(wd).over(w_all)
    )
    qual = cum.where(F.col("__cw") * 2 >= F.col("__tw"))
    return qual.groupBy(*keys).agg(
        F.min(F.col(value_col)).alias("weighted_median")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group winsorization: clamp values at interpolated lower/upper
    quantiles — the standard heavy-tail tamer before means/regressions.

    The quantile interpolation is spelled out explicitly (rank windows +
    ``lo + (hi − lo)·frac`` on decimal-cast values) instead of relying on
    ``percentile``/``quantile_cont`` builtins, so both engines execute
    the IDENTICAL float expression — builtin quantiles differ across
    engines in internal summation order. Equal values make any intra-tie
    row order irrelevant (position k's value is unique). Adds
    ``{out_col}`` (default ``{value_col}_wins``) plus the per-group
    bounds ``__lo``/``__hi`` are dropped from the output.

    Two window passes over one per-group sort + a broadcast-sized bounds
    join — at 100 TB the bounds table is |groups| rows.
    """
    keys = list(by or [])
    part = [F.col(k) for k in keys] if keys else [F.lit(1)]
    out_col = out_col or f"{value_col}_wins"
    w_rn = Window.partitionBy(*part).orderBy(F.col(value_col).asc())
    base = df.where(F.col(value_col).isNotNull())
    ranked = base.select(
        *keys,
        F.col(value_col).cast("decimal(18,6)").alias("__v"),
        F.row_number().over(w_rn).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*part)).alias("__n"),
    )

    def _bound(q: float, name: str):
        # 1-based interpolation index: i = 1 + (n-1)q; lo=floor, hi=ceil
        idx = F.lit(1.0) + (F.col("__n") - 1).cast("double") * F.lit(q)
        lo_i = F.floor(idx).cast("long")
        frac = idx - F.floor(idx)
        lo_v = F.max(F.when(F.col("__rn") == lo_i, F.col("__v")))
        hi_v = F.max(
            F.when(F.col("__rn") == F.ceil(idx).cast("long"), F.col("__v"))
        )
        return (
            lo_v.cast("double")
            + (hi_v.cast("double") - lo_v.cast("double")) * F.max(frac)
        ).alias(name)

    bounds = ranked.groupBy(*keys).agg(
        _bound(lower_q, "__lo"), _bound(upper_q, "__hi")
    )
    joined = (
        base.join(F.broadcast(bounds), keys) if keys
        else base.crossJoin(F.broadcast(bounds))
    )
    clamped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.col("__lo")), F.col("__hi")
    )
    return joined.withColumn(out_col, clamped).drop("__lo", "__hi")


def quantile_normalize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Quantile normalization across groups: map each value onto the
    GLOBAL distribution at its within-group midrank percentile — after
    this, every group has (interpolated) the same distribution. The
    dataset-mixing primitive for making per-source scores comparable
    before global thresholds (e.g. quality scores from differently
    calibrated sources).

    Determinism: the within-group percentile uses MIDRANKS computed from
    counts (p = (2·|<v| + |=v|) / 2n — pure integers; no tie-arbitrary
    row_number), and the global target is the explicit interpolation
    lo + (hi−lo)·frac over decimal-cast order statistics, so both
    engines execute identical float expressions.

    Shape: two count windows per group ordering + one global rank table
    joined twice on integer positions. The global row_number here runs
    single-partition (fine to ~10⁷ rows); at real scale build the
    position table with ``add_index_col_distributed`` (range-partitioned
    ranks) — the join shape is unchanged.
    """
    out_col = out_col or f"{value_col}_qnorm"
    keys = list(group_cols)
    v = F.col(value_col).cast("decimal(18,6)")
    base = df.where(F.col(value_col).isNotNull()).withColumn("__v", v)
    w_leq = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__v").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tie = Window.partitionBy(*keys, "__v")
    w_grp = Window.partitionBy(*keys)
    ranked = (
        base.withColumn("__leq", F.count(F.lit(1)).over(w_leq))
        .withColumn("__tie", F.count(F.lit(1)).over(w_tie))
        .withColumn("__n", F.count(F.lit(1)).over(w_grp))
    )
    # midrank percentile p = (2·below + ties) / (2n)  — exact integers
    p = (
        (2 * (F.col("__leq") - F.col("__tie")) + F.col("__tie")).cast("double")
        / (2 * F.col("__n")).cast("double")
    )
    glob = base.select("__v").withColumn(
        "__pos",
        F.row_number().over(Window.partitionBy(F.lit(1)).orderBy(F.col("__v").asc())),
    )
    # global size as a LAZY 1-row broadcast scalar (max position of the
    # rank table) — an eager base.count() here would cost a full extra
    # scan at plan-build time
    scalar = glob.agg(F.max("__pos").alias("__ng"))
    ranked = ranked.crossJoin(F.broadcast(scalar))
    idx = F.lit(1.0) + (F.col("__ng") - 1).cast("double") * p
    with_idx = (
        ranked.withColumn("__lo_i", F.floor(idx).cast("long"))
        .withColumn("__hi_i", F.ceil(idx).cast("long"))
        .withColumn("__frac", idx - F.floor(idx))
    )
    lo = glob.select(F.col("__pos").alias("__lo_i"), F.col("__v").alias("__lo_v"))
    hi = glob.select(F.col("__pos").alias("__hi_i"), F.col("__v").alias("__hi_v"))
    joined = with_idx.join(lo, "__lo_i").join(hi, "__hi_i")
    target = F.col("__lo_v").cast("double") + (
        F.col("__hi_v").cast("double") - F.col("__lo_v").cast("double")
    ) * F.col("__frac")
    return joined.withColumn(out_col, F.round(target, round_to)).drop(
        "__v", "__leq", "__tie", "__n", "__ng", "__lo_i", "__hi_i", "__frac",
        "__lo_v", "__hi_v",
    )


def stratified_split(
    df: DataFrame,
    strata_cols: list[str],
    test_frac: float = 0.2,
    hash_col: str | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic stratified train/test split with EXACT per-stratum
    proportions: within each stratum, rows order by an md5 hash (of
    ``hash_col``, which should be a stable unique id) and the first
    ``floor(n·test_frac)`` become ``test`` — unlike Bernoulli sampling
    (``randomSplit``), every stratum lands exactly on the requested
    fraction, reproducibly, at any partitioning.

    One window rank per stratum (single shuffle on the strata). The md5
    order is uniform and independent of the data values, so the split is
    unbiased; re-running on the same ids yields the same split (the
    feature-store reproducibility requirement).
    """
    if not (0.0 < test_frac < 1.0):
        raise ValueError("test_frac must be in (0, 1)")
    if hash_col is None:
        raise ValueError("pass hash_col: a stable unique id column")
    h = F.md5(F.col(hash_col).cast("string"))
    w = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(h.asc())
    wn = Window.partitionBy(*[F.col(c) for c in strata_cols])
    ranked = df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    # EXACT floor(n*frac): integer arithmetic on the fraction quantized to
    # 6dp — floor(double(n)*double(frac)) undercounts when the product
    # rounds just below an integer (e.g. 100*0.29 -> 28.999999999999996)
    frac_ppm = round(float(test_frac) * 1_000_000)
    cut = F.expr(f"(__n * {frac_ppm}) DIV 1000000")
    return ranked.withColumn(
        out_col, F.when(F.col("__rn") <= cut, F.lit("test")).otherwise(F.lit("train"))
    ).drop("__rn", "__n")


def hierarchical_shares(
    df: DataFrame,
    levels: list[str],
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Percent-of-parent OLAP rollup: aggregate ``value_col`` at every
    prefix of the ``levels`` hierarchy and report each node's share of
    its PARENT (region share of total, nation share of its region, ...).

    One ROLLUP aggregate (single shuffle; Spark expands grouping sets
    map-side) + a parent self-join on the prefix key — the parent
    relation is the rollup's own coarser rows, broadcast-small. Sums are
    exact decimals; the share is one double division. Grand total has
    share 1. Returns ``(level, <levels...>, total, share)`` where unused
    level columns are null, like SQL ROLLUP output.
    """
    v = F.col(value_col).cast("decimal(18,6)")
    rolled = (
        df.where(F.col(value_col).isNotNull())
        .rollup(*levels)
        .agg(F.sum(v).alias("__t"), F.grouping_id().alias("__gid"))
    )
    n = len(levels)
    # grouping_id: bit i set => level i is rolled up; depth = n - popcount
    depth = F.lit(n) - sum(
        F.shiftright(F.col("__gid"), i).bitwiseAND(F.lit(1)) for i in range(n)
    )
    rolled = rolled.withColumn("__depth", depth.cast("int"))
    out_cols = [F.col("__depth").alias("level")] + [F.col(c) for c in levels]
    child = rolled.select(*out_cols, F.col("__t"))
    shares = None
    for d in range(0, n + 1):
        c = child.where(F.col("level") == d)
        if d == 0:
            part = c.withColumn("share", F.lit(1.0))
        else:
            parent_keys = levels[: d - 1]
            p = child.where(F.col("level") == d - 1).select(
                *[F.col(k).alias(f"__p_{k}") for k in parent_keys],
                F.col("__t").alias("__pt"),
            )
            cond = [
                c[k].eqNullSafe(p[f"__p_{k}"]) for k in parent_keys
            ] or None
            joined = c.crossJoin(F.broadcast(p)) if cond is None else c.join(
                F.broadcast(p), cond
            )
            part = joined.select(
                *[c[x] for x in ["level"] + levels + ["__t"]],
                F.round(
                    F.col("__t").cast("double") / F.col("__pt").cast("double"), round_to
                ).alias("share"),
            )
        shares = part if shares is None else shares.unionByName(part)
    return shares.select(
        "level", *levels,
        F.round(F.col("__t"), 2).alias("total"),
        F.round(F.col("share"), round_to).alias("share"),
    )


def shuffle_corpus(
    df: DataFrame,
    id_col: str,
    salt: str = "shuffle",
    pos_col: str = "shuffle_pos",
) -> DataFrame:
    """DETERMINISTIC global shuffle for training-data ordering: every row
    gets a contiguous 0-based ``pos_col`` in md5-priority order (salt +
    id; id tiebreak) — the reproducible replacement for
    ``df.orderBy(rand())``, whose order changes on every retry /
    partitioning and silently breaks run-to-run training comparisons.
    Change ``salt`` per epoch for a fresh permutation.

    Scale: delegates to :func:`add_index_col_distributed` — range
    partition on the priority + per-partition row_number + broadcast
    offsets; no single-partition global sort. The priority is a pure
    function of (salt, id), so the permutation is stable across engines,
    retries, and cluster layouts.
    """
    pri = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    out = add_index_col_distributed(
        df.withColumn("__pri", pri),
        col_name=pos_col,
        index_start=0,
        order_by=["__pri", id_col],
    )
    return out.drop("__pri").withColumn(
        pos_col, (F.col(pos_col) - F.lit(1)).cast("long")
    )


def neyman_allocation(
    df: DataFrame,
    strata_col: str,
    value_col: str,
    total_n: int,
    scale: int = 2,
) -> DataFrame:
    """Neyman-optimal sample allocation: split a total sample budget
    across strata proportional to ``N_h · σ_h`` (stratum size × stratum
    std-dev) — variance-minimizing for estimating the mean of
    ``value_col`` (Neyman 1934, the survey-sampling classic). The
    data-profiling half of stratified sampling: high-variance strata
    earn more budget than proportional allocation would give them.

    σ_h comes from exact scaled-integer power sums (the
    :func:`~.aggstate.moments_state` determinism contract) so the
    allocation is partitioning-independent and SQL-replicable.
    Allocations are integer: floor at the proportional stage, the
    remainder distributed by largest fractional part (stratum name
    tie-break) so ``Σ n_h == total_n`` exactly; single-value strata get
    σ 0 and draw budget only via the remainder path. Each ``n_h`` is
    also capped at ``N_h`` (can't sample more rows than exist; the
    freed budget is NOT redistributed — documented simplification).

    ONE aggregate on the strata key + one tiny window over the strata
    relation. Feed the result to :func:`cap_per_group` (cap = n_h per
    stratum) to materialize the deterministic draw.

    Returns ``(strata, n_rows, stddev, allocation)``.
    """
    from pyspark.sql.window import Window

    u = float(10 ** scale)
    iv = (
        F.round(F.col(value_col).cast("double") * F.lit(u))
        .cast("decimal(19,0)")
    )
    st = df.where(F.col(value_col).isNotNull()).groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(iv.cast("decimal(38,0)")).alias("__s1"),
        F.sum((iv * iv).cast("decimal(38,0)")).alias("__s2"),
    )
    n = F.col("n_rows").cast("double")
    mean = F.col("__s1").cast("double") / u / n
    var = F.greatest(
        F.col("__s2").cast("double") / (u * u) / n - mean * mean, F.lit(0.0)
    )
    st = st.withColumn("__sd", F.sqrt(var))
    tot = st.agg(
        F.sum(F.col("n_rows").cast("double") * F.col("__sd")).alias("__t"),
        F.sum("n_rows").alias("__ntot"),
    )
    # all-constant strata (Σ N_h·σ_h == 0) fall back to PROPORTIONAL
    # allocation — Neyman's degenerate case
    raw = st.crossJoin(F.broadcast(tot)).withColumn(
        "__raw",
        F.when(
            F.col("__t") > 0,
            F.lit(float(total_n)) * n * F.col("__sd") / F.col("__t"),
        ).otherwise(
            F.lit(float(total_n)) * n / F.col("__ntot").cast("double")
        ),
    )
    floored = raw.withColumn("__floor", F.floor("__raw").cast("long"))
    short = floored.agg(
        (F.lit(total_n) - F.sum("__floor")).alias("__short")
    )
    w = Window.orderBy(
        (F.col("__raw") - F.col("__floor")).desc(), F.col(strata_col).asc()
    )
    out = (
        floored.crossJoin(F.broadcast(short))
        .withColumn("__rk", F.row_number().over(w))
        .withColumn(
            "allocation",
            F.least(
                F.col("__floor")
                + F.when(F.col("__rk") <= F.col("__short"), 1).otherwise(0),
                F.col("n_rows"),
            ),
        )
    )
    return out.select(
        strata_col,
        "n_rows",
        F.round(F.col("__sd"), 6).alias("stddev"),
        "allocation",
    )


def augment_token_dropout(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    rate: float = 0.15,
    salt: str = "aug",
    out_col: str = "augmented",
) -> DataFrame:
    """Deterministic token-dropout augmentation: drop each whitespace
    token whose md5(salt ‖ id ‖ position ‖ token) bucket falls below
    ``rate`` — the contrastive-view generator (SimCSE-style word
    dropout) with this repo's reproducibility contract instead of an
    RNG: the same (salt, id) always yields the same view, two salts
    yield two views of one document, and retries/repartitions change
    nothing.

    Pure higher-order array expressions (split → keyed filter → rejoin)
    — zero shuffles, map-side at any scale. Position is part of the key
    so repeated tokens drop independently.

    Returns ``df`` + ``out_col`` + ``n_dropped``.
    """
    toks = F.split(F.col(text_col), r"\s+")
    idc = F.col(id_col).cast("string")

    def bucket(w, i):
        h = F.md5(
            F.concat(
                F.lit(salt), F.lit("|"), idc, F.lit("|"),
                i.cast("string"), F.lit("|"), w,
            )
        )
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(
            float(2 ** 32)
        )

    kept = F.filter(toks, lambda w, i: bucket(w, i) >= F.lit(float(rate)))
    out = F.when(
        F.col(text_col).isNull(), F.lit(None).cast("string")
    ).otherwise(F.array_join(kept, " "))
    n_dropped = F.when(
        F.col(text_col).isNull(), F.lit(None).cast("int")
    ).otherwise(F.size(toks) - F.size(kept))
    return df.withColumn(out_col, out).withColumn("n_dropped", n_dropped)


def waterfill_allocation(
    df: DataFrame,
    group_col: str,
    cap_col: str,
    total_budget: int,
    round_to: int = 6,
) -> DataFrame:
    """Max-min fair (water-filling) budget allocation across groups
    (round 11): given each group's CAP (e.g. available tokens per
    source) and one total budget, find the water level ``L`` with
    ``Σ min(cap_i, L) = total_budget`` and give every group
    ``min(cap_i, L)`` — the standard fair-division rule for "share the
    token budget, but never give a source more than it has" (the same
    allocation rule as max-min fairness in link scheduling; the
    mixture-design complement of :func:`neyman_allocation`, which
    optimizes variance instead of fairness).

    Plan: one ascending sort window over the GROUPS (group-cardinality
    rows, never data), prefix sums, the candidate level
    ``L_i = (T − prefix_i)/(k − i)`` per sorted position, and a 1-row
    broadcast of the unique valid level (``c_(i) ≤ L_i ≤ c_(i+1)``).
    When ``Σ caps ≤ T`` every group is capped and the level is NULL.
    All comparisons run on exact integer prefix sums; the level is one
    integer quotient in double (a 7th-decimal exact-half can never be
    a dyadic double, so 6dp rounding is engine-safe).

    Expects ONE ROW PER GROUP (pre-aggregate fact tables first).
    Returns ``(group_col, cap, allocation, capped, water_level)``
    ordered by group.
    """
    from pyspark.sql.window import Window

    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    caps = df.select(
        F.col(group_col), F.col(cap_col).cast("long").alias("__cap")
    )
    w = Window.orderBy(F.col("__cap").asc(), F.col(group_col).asc())
    ranked = (
        caps.withColumn("__i", F.row_number().over(w))
        .withColumn(
            "__prefix",
            F.sum("__cap").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .withColumn("__prefix", F.coalesce("__prefix", F.lit(0)))
    )
    k = caps.agg(
        F.count(F.lit(1)).alias("__k"), F.sum("__cap").alias("__sum")
    )
    T = F.lit(int(total_budget)).cast("long")
    with_k = ranked.crossJoin(F.broadcast(k))
    # candidate level at sorted position i (1-based): the remaining
    # budget spread over this and all LARGER groups; valid when it sits
    # in [c_i, next cap) — i.e. group i itself is NOT capped but all
    # earlier (smaller) groups are
    rem = (F.col("__k") - F.col("__i") + 1).cast("double")
    level_i = (T - F.col("__prefix")).cast("double") / rem
    # rows BELOW the true boundary are filtered by level_i < c_i (their
    # group is really capped, so spreading the remainder lands at or
    # above c_i); rows ABOVE it under-subtract and yield levels BELOW
    # the true one — so the true level is the MAX of passing candidates
    # (caps [1,5,10], T=8: candidates 3.5 and 2.0 → L=3.5)
    cand = with_k.where(
        (F.col("__sum") > T)
        & (level_i < F.col("__cap").cast("double"))
    ).agg(F.max(level_i).alias("__level"))
    out = (
        with_k.crossJoin(F.broadcast(cand))
        .select(
            F.col(group_col),
            F.col("__cap").alias("cap"),
            F.when(
                F.col("__sum") <= T, F.col("__cap").cast("double")
            ).otherwise(
                F.least(F.col("__cap").cast("double"), F.col("__level"))
            ).alias("__alloc"),
            F.col("__level"),
            F.col("__sum"),
        )
    )
    return out.select(
        group_col,
        "cap",
        F.round("__alloc", round_to).alias("allocation"),
        (
            (F.col("__sum") <= T)
            | (F.col("cap").cast("double") <= F.col("__level"))
        ).alias("capped"),
        F.round("__level", round_to).alias("water_level"),
    ).orderBy(group_col)
