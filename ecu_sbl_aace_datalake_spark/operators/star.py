"""Star-schema kit: dimension builder + null-safe broadcast key mapping.

Reference parity (common.py):
- ``getDistinctValsFromDataRowsInt`` (732-754) → :func:`build_dimension`:
  optional not-null filter (the reference hard-coded column "RawScore",
  SURVEY.md §8 #9 — parameterized here), groupBy(cols) with either a count
  measure or pure distinct, orderBy asc, prepend a CONTIGUOUS surrogate
  index column named ``index{Cols}``.
- ``simpleMap`` (932-964) → :func:`simple_map`: null-safe broadcast
  equi-join of a fact table to a 2-column dimension slice, replacing the
  natural key column with the surrogate index at the same ordinal position;
  row-count fan-out guard; idempotent (skips if already mapped); raises if
  the surrogate column is already present for a different key.
- ``getJoinCondition`` (918-924) → :func:`null_safe_eq` — Spark's
  ``eqNullSafe`` (<=>) replaces the reference's hand-rolled
  ``(a=b) OR (a IS NULL AND b IS NULL)``; both plan as a null-safe hash
  equi-join, eqNullSafe is the idiomatic guarantee.
- ``aliasColumns`` (972-973) / ``insertColumnAndAlias`` (981-991) are
  select-list builders subsumed by the positional swap in
  :func:`simple_map`.

Scale notes (100 TB):
- The dimension slice is explicitly ``F.broadcast``-ed (reference used
  ``.hint('broadcast')`` common.py:952): dims are small post-aggregation, so
  fact-side data NEVER shuffles for the map — the join is map-side against a
  broadcast hash table. This is the only strategy that survives a
  600M→600B-row fact table.
- The count-guard costs two actions over the fact table; it's opt-in
  (``validate=``) so production pipelines skip it and CI keeps it.
- Surrogate ids: ``row_number()`` over the dimension's natural order — a
  single-partition window, fine because dims are post-aggregation small.
  (Reference used monotonically_increasing_id: non-contiguous, unstable —
  SURVEY.md §8 #4.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def index_col_name(col_names: str | Sequence[str]) -> str:
    """Surrogate column name exactly as the reference composes it
    (common.py:749: ``"index" + "".join(colNames).replace('_','')`` —
    underscores REMOVED, original casing kept, no capitalization)."""
    cols = [col_names] if isinstance(col_names, str) else list(col_names)
    return "index" + "".join(cols).replace("_", "")


def build_dimension(
    df: DataFrame,
    col_names: str | Sequence[str],
    row_count_col: str | None = None,
    index_start: int = 0,
    not_null_col: str | None = None,
) -> DataFrame:
    """Build a dimension table with a contiguous surrogate key.

    Reference ``getDistinctValsFromDataRowsInt`` common.py:732-754. Output
    schema: ``[index{Cols}, *cols]`` or ``[index{Cols}, *cols,
    row_count_col]`` when a count measure is requested; rows ordered by the
    natural key asc, surrogate = index_start + 1, +2, ...

    ``not_null_col`` generalizes the reference's hard-coded
    ``suppressNullRawScore`` filter (common.py:739, SURVEY.md §8 #9).
    """
    cols = [col_names] if isinstance(col_names, str) else list(col_names)
    out = df
    if not_null_col:
        out = out.filter(F.col(not_null_col).isNotNull())
    if row_count_col:
        out = out.groupBy(*cols).agg(F.count(row_count_col).alias(row_count_col))
    else:
        out = out.select(*cols).distinct()
    order = [F.col(c).asc() for c in cols]
    idx = index_col_name(cols)
    # dimension is small post-aggregation: single-partition window is fine
    out = out.withColumn(idx, (F.row_number().over(Window.orderBy(*order)) + index_start).cast("long"))
    keep = [idx] + cols + ([row_count_col] if row_count_col else [])
    return out.select(*keep).orderBy(*order)


def null_safe_eq(left: Column, right: Column) -> Column:
    """Null-safe equality ``<=>`` (reference ``getJoinCondition``
    common.py:918-924 hand-rolled the OR-of-IS-NULLs form)."""
    return left.eqNullSafe(right)


def simple_map_multi(
    fact_df: DataFrame,
    dim_df: DataFrame,
    join_cols: Sequence[str],
    join_type: str = "inner",
    index_col: str | None = None,
    validate: bool = True,
) -> DataFrame:
    """Composite-key variant of :func:`simple_map`: the dimension's natural
    key spans several columns; after the null-safe broadcast join the
    surrogate takes the FIRST key column's ordinal position and the
    remaining key columns are dropped (they're recoverable from the
    dimension — that's the point of the mapping).

    Extension beyond the reference (whose simpleMap was single-column,
    common.py:932) — required to round-trip the multi-column dimensions
    its own getDistinctValsFromDataRowsInt could build.
    """
    cols = list(join_cols)
    if len(cols) == 1:
        return simple_map(fact_df, dim_df, cols[0], join_type, index_col, validate)
    idx = index_col or index_col_name(cols)
    if idx in fact_df.columns and not any(c in fact_df.columns for c in cols):
        return fact_df
    if idx in fact_df.columns:
        raise ValueError(
            f"surrogate column {idx!r} already present alongside natural key columns"
        )
    missing = [c for c in cols if c not in fact_df.columns]
    if missing:
        raise ValueError(f"join columns {missing!r} not on fact table")

    dim_slice = dim_df.select(
        F.col(idx), *[F.col(c).alias(f"__dim_{c}") for c in cols]
    )
    cond = fact_df[cols[0]].eqNullSafe(dim_slice[f"__dim_{cols[0]}"])
    for c in cols[1:]:
        cond = cond & fact_df[c].eqNullSafe(dim_slice[f"__dim_{c}"])
    before = fact_df.count() if validate else None
    joined = fact_df.join(F.broadcast(dim_slice), cond, join_type)
    select_list = [
        idx if c == cols[0] else c for c in fact_df.columns if c not in cols[1:]
    ]
    out = joined.select(*select_list)
    if validate:
        after = out.count()
        if before != after:
            raise ValueError(
                f"simple_map_multi fan-out: fact rows changed {before} -> {after}"
            )
    return out


def simple_map(
    fact_df: DataFrame,
    dim_df: DataFrame,
    join_col: str,
    join_type: str = "inner",
    index_col: str | None = None,
    validate: bool = True,
) -> DataFrame:
    """Replace ``join_col`` on the fact table with the dimension's surrogate
    index via a null-safe **broadcast** equi-join, keeping ordinal position.

    Reference ``simpleMap`` common.py:932-964:
    - idempotent: if the surrogate column is already on the fact table and
      the natural key is gone, returns the fact unchanged (common.py:938-941);
    - raises if the surrogate is present alongside the natural key
      (common.py:944-945);
    - ``validate=True`` re-checks the row-count invariant (fan-out guard,
      common.py:947/956-963) with two count() actions — opt-out for
      production (the dimension key is unique by construction, so fan-out is
      impossible when built via :func:`build_dimension`).
    """
    idx = index_col or index_col_name(join_col)
    if idx in fact_df.columns and join_col not in fact_df.columns:
        return fact_df  # already mapped — idempotent re-map is a no-op
    if idx in fact_df.columns:
        raise ValueError(
            f"surrogate column {idx!r} already present on fact table while "
            f"natural key {join_col!r} still exists"
        )
    if join_col not in fact_df.columns:
        raise ValueError(f"join column {join_col!r} not on fact table")

    dim_slice = dim_df.select(F.col(idx), F.col(join_col).alias(f"__dim_{join_col}"))
    before = fact_df.count() if validate else None

    joined = fact_df.join(
        F.broadcast(dim_slice),
        fact_df[join_col].eqNullSafe(dim_slice[f"__dim_{join_col}"]),
        join_type,
    )
    # swap the natural key for the surrogate at the same ordinal position
    select_list = [idx if c == join_col else c for c in fact_df.columns]
    out = joined.select(*select_list)

    if validate:
        after = out.count()
        if before != after:
            raise ValueError(
                f"simple_map fan-out: fact rows changed {before} -> {after} "
                f"mapping {join_col!r} (duplicate keys in dimension?)"
            )
    return out


def scd2_from_events(
    events: DataFrame,
    key_cols: str | Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Build a Type-2 slowly-changing dimension from an attribute event log:
    one row per (key, consecutive run of equal attributes) with
    ``valid_from`` / ``valid_to`` / ``is_current``.

    Gaps-and-islands in two window passes over the same (key, ts)
    partitioning: a change flag (``lag(attrs) is distinct from attrs``), a
    running sum to number runs, then groupBy(key, run) for valid_from and
    one lead() for the exclusive valid_to. ONE shuffle on the key — both
    windows and the aggregation share it.

    ``tiebreak_cols`` makes same-timestamp ordering deterministic (pass a
    unique event id); required for oracle-stable output when ts has ties.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = F.coalesce(
        ~attrs.eqNullSafe(F.lag(attrs).over(w)), F.lit(True)
    ).cast("int")
    runs = events.withColumn("__chg", changed).withColumn(
        "__run", F.sum("__chg").over(w)
    )
    versions = runs.groupBy(*keys, "__run", *attr_cols).agg(
        F.min(ts_col).alias("valid_from")
    )
    # order successor lookup by run number, not valid_from: runs are strictly
    # monotone per key even when tie-broken same-timestamp events split runs
    w2 = Window.partitionBy(*keys).orderBy(F.col("__run").asc())
    return (
        versions.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__run")
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: str | Sequence[str],
    attr_cols: Sequence[str],
    effective_ts_col: str,
) -> DataFrame:
    """Apply one batch of changes to an SCD Type-2 dimension built by
    :func:`scd2_from_events` (columns: keys + attrs + valid_from/valid_to/
    is_current). ``changes`` carries one row per key (its latest state) with
    an effective timestamp.

    Semantics per change row:
    - key absent from the dimension → insert an open version;
    - current attrs differ → close the current version at the effective ts
      and insert a new open version;
    - current attrs equal → no-op (idempotent re-application).

    Plan: one equi-join of the current slice against the (small) change
    batch — broadcast when the batch is; historical (closed) rows pass
    through untouched, so at 100 TB with the dimension partitioned on
    ``is_current`` the rewrite touches only the current partition.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    attrs = lambda side: F.struct(*[F.col(f"{side}.{c}") for c in attr_cols])  # noqa: E731

    hist = dim.where(~F.col("is_current"))
    cur = dim.where(F.col("is_current")).alias("cur")
    chg = changes.alias("chg")
    joined = cur.join(chg, keys, "full_outer")
    differs = ~attrs("cur").eqNullSafe(attrs("chg"))
    has_cur = F.col("cur.valid_from").isNotNull()
    has_chg = F.col(f"chg.{effective_ts_col}").isNotNull()

    # current rows: closed if a differing change arrived, else unchanged
    kept_cur = joined.where(has_cur).select(
        *keys,
        *[F.col(f"cur.{c}") for c in attr_cols],
        F.col("cur.valid_from").alias("valid_from"),
        F.when(has_chg & differs, F.col(f"chg.{effective_ts_col}"))
        .otherwise(F.col("cur.valid_to"))
        .alias("valid_to"),
        F.when(has_chg & differs, F.lit(False))
        .otherwise(F.lit(True))
        .alias("is_current"),
    )
    # new open versions: brand-new keys, or keys whose attrs changed
    inserts = joined.where(has_chg & (~has_cur | differs)).select(
        *keys,
        *[F.col(f"chg.{c}") for c in attr_cols],
        F.col(f"chg.{effective_ts_col}").alias("valid_from"),
        F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    out_cols = [*keys, *attr_cols, "valid_from", "valid_to", "is_current"]
    return (
        hist.select(*out_cols)
        .unionByName(kept_cur.select(*out_cols))
        .unionByName(inserts.select(*out_cols))
    )


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str = "ts",
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """CDC apply (SCD Type-1 / last-writer-wins): merge an I/U/D changelog
    into a snapshot and return the new snapshot.

    ``changes`` rows carry ``op_col`` in {'I','U','D'} and ``ts_col``;
    snapshot rows rank below every change of the same key (a change always
    supersedes the base row). Per key the LATEST row by (ts, seq) wins;
    a winning 'D' removes the key. Deterministic given a ``seq_col`` (or
    unique timestamps).

    Plan: union + one window on the key — the standard relational CDC
    compaction; at 100 TB this is one shuffle of snapshot+changes on the
    key, the same cost MERGE INTO pays, with no table format required.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    data_cols = [c for c in snapshot.columns if c not in keys]
    base = snapshot.select(
        *keys,
        *data_cols,
        F.lit(None).cast("timestamp").alias("__ts"),
        F.lit(0).cast("long").alias("__seq"),
        F.lit("I").alias("__op"),
    )
    chg = changes.select(
        *keys,
        *data_cols,
        F.col(ts_col).cast("timestamp").alias("__ts"),
        (F.col(seq_col) if seq_col else F.lit(0)).cast("long").alias("__seq"),
        F.col(op_col).alias("__op"),
    )
    # nulls-first ordering ranks the snapshot's null ts below every change
    w = Window.partitionBy(*keys).orderBy(
        F.col("__ts").desc_nulls_last(), F.col("__seq").desc()
    )
    return (
        base.unionByName(chg)
        .withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("__op") != "D"))
        .select(*keys, *data_cols)
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Point-in-time dimension lookup against a Type-2 history: attach
    the dimension attributes that were valid AT each fact's event time —
    the feature-store / as-was-reporting join (fact.ts ∈ [valid_from,
    valid_to)). Facts before a key's first version (or keys absent from
    the dimension) get null attributes.

    Implemented as an equi-join on the key plus the interval predicate —
    at most ONE version matches by SCD2 construction (validated by the
    scd2_from_events non-overlap invariant), so the fan-out is exactly 1
    and the join shuffles once on the key. A RANGE/ASOF rewrite isn't
    needed: the interval predicate prunes inside the same hash join.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    d = dim.select(
        *keys, "valid_from", "valid_to", *attr_cols
    )
    for c in attr_cols:
        d = d.withColumnRenamed(c, f"dim_{c}")
    cond = [facts[k] == d[k] for k in keys] + [
        facts[ts_col] >= d["valid_from"],
        d["valid_to"].isNull() | (facts[ts_col] < d["valid_to"]),
    ]
    joined = facts.join(d, cond, "left")
    return joined.select(
        *[facts[c] for c in facts.columns],
        *[d[f"dim_{c}"] for c in attr_cols],
    )
