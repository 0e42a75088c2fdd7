"""Profiling & relationship discovery — open replacement for SemPy.

Reference parity: ``findAndDiagramRelationships`` (common.py:995-1076)
collected EVERY session table to pandas (common.py:1008,1018 — SURVEY.md §8
#11) and called Fabric-proprietary ``sempy`` relationship detection. This
module recomputes the same outputs on open Spark, entirely distributed:

- candidate column pairs: name-similarity (difflib ratio, same threshold
  idea as SemPy's name_similarity_threshold) over column *metadata* only —
  driver-side, O(cols²), trivial.
- per-column uniqueness: one aggregate pass per table
  (``countDistinct/count``) → candidate keys.
- FK coverage: for each candidate (from, to) pair, the fraction of distinct
  non-null `from` values present in `to` — computed with a left-anti join on
  DISTINCT projections (both sides pre-shrunk, broadcast when small).

Returns a relationships DataFrame; graphviz rendering is optional and only
consumes the (tiny) result.
"""

from __future__ import annotations

import difflib
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RelationshipCandidate:
    from_table: str
    from_col: str
    to_table: str
    to_col: str
    name_similarity: float


def _name_similarity(a: str, b: str) -> float:
    """Column-name similarity ignoring common table-prefix conventions
    (c_custkey vs o_custkey share 'custkey')."""
    strip = lambda s: s.split("_", 1)[1] if "_" in s and len(s.split("_", 1)[0]) <= 2 else s
    a2, b2 = strip(a.lower()), strip(b.lower())
    if a2 == b2:
        return 1.0
    return difflib.SequenceMatcher(None, a2, b2).ratio()


def candidate_pairs(
    tables: dict[str, DataFrame], name_similarity_threshold: float = 0.8
) -> list[RelationshipCandidate]:
    """All cross-table column pairs whose names are similar enough to be a
    plausible FK→PK pair. Metadata-only: no data touched."""
    out = []
    names = list(tables)
    for i, ta in enumerate(names):
        for tb in names:
            if ta == tb:
                continue
            for ca in tables[ta].columns:
                for cb in tables[tb].columns:
                    sim = _name_similarity(ca, cb)
                    if sim >= name_similarity_threshold:
                        out.append(RelationshipCandidate(ta, ca, tb, cb, sim))
    return out


def column_uniqueness(
    df: DataFrame, cols: list[str] | None = None, exact: bool = False
) -> dict[str, float]:
    """distinct/count ratio per column in ONE aggregate job (the candidate-key
    detector). approx_count_distinct keeps this a single streaming pass at
    100 TB (exact countDistinct would need one shuffle per column);
    ``exact=True`` switches to exact count_distinct — deterministic output
    for fixture-scale runs and the SQL-oracle path."""
    cols = cols or df.columns
    cd = F.count_distinct if exact else F.approx_count_distinct
    row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[cd(c).alias(c) for c in cols],
    ).first()
    n = row["__n"] or 1
    return {c: min(row[c] / n, 1.0) for c in cols}


def _uniqueness_all(
    tables: dict[str, DataFrame],
    exact: bool,
    cols_by_table: dict[str, list[str]] | None = None,
) -> dict[str, dict[str, float]]:
    """Per-column uniqueness for EVERY table in ONE action: each (table,
    column) contributes a 1-row single-column aggregate and the union
    executes all branches inside a single job. For ``exact=True`` this
    avoids the multi-``count_distinct`` EXPAND (one wide aggregate
    multiplies every row by the column count — measured 7.9 s for the
    TPC-H set vs ~2 s batched); each branch scans only its own parquet
    column, so total I/O matches the wide form while the row blow-up and
    the job-per-table serialization both disappear. ``cols_by_table``
    restricts the branches (find_relationships only needs the columns
    that appear in candidate pairs — distinct-counting a 600k-row
    comment column nobody gates on was the measured top cost)."""
    from functools import reduce

    cd = F.count_distinct if exact else F.approx_count_distinct
    parts = []
    for t, df in tables.items():
        wanted = (
            df.columns if cols_by_table is None else cols_by_table.get(t, [])
        )
        parts.append(
            df.agg(F.count(F.lit(1)).alias("d")).select(
                F.lit(t).alias("t"), F.lit("__n").alias("c"),
                F.col("d").cast("double").alias("d"),
            )
        )
        for c in wanted:
            parts.append(
                df.agg(cd(c).alias("d")).select(
                    F.lit(t).alias("t"), F.lit(c).alias("c"),
                    F.col("d").cast("double").alias("d"),
                )
            )
    rows = reduce(lambda a, b: a.unionByName(b), parts).collect()
    counts: dict[str, float] = {}
    dists: dict[str, dict[str, float]] = {t: {} for t in tables}
    for r in rows:
        if r["c"] == "__n":
            counts[r["t"]] = r["d"] or 1.0
        else:
            dists[r["t"]][r["c"]] = r["d"]
    return {
        t: {c: min(d / max(counts.get(t, 1.0), 1.0), 1.0) for c, d in cols.items()}
        for t, cols in dists.items()
    }


def find_relationships(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    coverage_threshold: float = 0.95,
    name_similarity_threshold: float = 0.8,
    uniqueness_threshold: float = 0.95,
    exact_uniqueness: bool = False,
) -> DataFrame:
    """Infer FK→PK relationships across the given tables.

    A relationship (from_table.from_col → to_table.to_col) is reported when
    to_col is a candidate key of to_table (uniqueness >= threshold) and the
    distinct from_col values are covered by to_col values at >=
    coverage_threshold. Output columns: from_table, from_col, to_table,
    to_col, coverage, to_uniqueness, many_to_one.
    """
    cands = candidate_pairs(tables, name_similarity_threshold)
    needed: dict[str, list[str]] = {t: [] for t in tables}
    for c in cands:
        for t, col in ((c.to_table, c.to_col), (c.from_table, c.from_col)):
            if col not in needed[t]:
                needed[t].append(col)
    uniq = _uniqueness_all(tables, exact=exact_uniqueness, cols_by_table=needed)
    survivors = [
        cand
        for cand in cands
        if uniq[cand.to_table].get(cand.to_col, 0.0) >= uniqueness_threshold
    ]
    # ONE action for ALL candidate pairs: each pair contributes a 1-row
    # (pair, total, uncovered) aggregate and the union executes every
    # branch inside a single job, scheduled across the cluster — the
    # per-pair .first() loop this replaces ran N sequential jobs
    # (measured ~10 s -> ~2 s on the 38-pair TPC-H fixture set)
    stats_parts = []
    for i, cand in enumerate(survivors):
        from_vals = (
            tables[cand.from_table]
            .select(F.col(cand.from_col).alias("v"))
            .where(F.col(cand.from_col).isNotNull())
            .distinct()
        )
        to_vals = (
            tables[cand.to_table]
            .select(F.col(cand.to_col).alias("v"))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        # total + uncovered in ONE aggregate (left join), not two
        stats_parts.append(
            from_vals.join(to_vals, "v", "left")
            .agg(
                F.count(F.lit(1)).alias("total"),
                F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).alias("uncovered"),
            )
            .select(F.lit(i).alias("__i"), "total", "uncovered")
        )
    all_stats: dict[int, tuple] = {}
    if stats_parts:
        from functools import reduce

        unioned = reduce(lambda a, b: a.unionByName(b), stats_parts)
        all_stats = {r["__i"]: r for r in unioned.collect()}
    rows = []
    for i, cand in enumerate(survivors):
        to_uniq = uniq[cand.to_table].get(cand.to_col, 0.0)
        stats = all_stats.get(i)
        total = stats["total"] if stats is not None else 0
        if total == 0:
            continue
        coverage = (total - int(stats["uncovered"] or 0)) / total
        if coverage >= coverage_threshold:
            rows.append(
                (
                    cand.from_table,
                    cand.from_col,
                    cand.to_table,
                    cand.to_col,
                    round(coverage + 1e-9, 4),
                    round(to_uniq + 1e-9, 4),
                    uniq[cand.from_table].get(cand.from_col, 0.0) < uniqueness_threshold,
                )
            )
    return spark.createDataFrame(
        rows,
        "from_table string, from_col string, to_table string, to_col string, "
        "coverage double, to_uniqueness double, many_to_one boolean",
    )


def to_graphviz(relationships: DataFrame) -> str:
    """Render the (tiny) relationships result as graphviz DOT text — the open
    stand-in for the reference's SemPy ER diagram (common.py:1067-1072)."""
    lines = ["digraph relationships {", "  rankdir=LR;", "  node [shape=box];"]
    for r in relationships.collect():
        lines.append(
            f'  "{r.from_table}" -> "{r.to_table}" '
            f'[label="{r.from_col} → {r.to_col} ({r.coverage:.0%})"];'
        )
    lines.append("}")
    return "\n".join(lines)


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile — the summarize/describe surface of a data
    catalog: one wide aggregate pass computes row count, null count,
    exact distinct count, and min/max per column, then unpivots to one
    row per column.

    ONE job, one shuffle (the aggregate); nothing collects. Exact
    ``count(distinct)`` per column makes Spark expand the aggregate per
    distinct spec — fine for the handful of profiled columns; use
    ``approx=True`` to switch to HLL ``approx_count_distinct`` when
    profiling very wide/high-cardinality tables at scale.

    min/max are rendered as strings so heterogeneous column types share
    one schema: doubles via DECIMAL(18,4) (engine-stable formatting),
    dates/timestamps via ISO text, everything else via plain CAST.
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)

    def _as_str(c: str, agg) -> F.Column:
        t = dtypes[c]
        if t in ("double", "float"):
            return agg(F.col(c)).cast("decimal(18,4)").cast("string")
        return agg(F.col(c)).cast("string")

    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nul_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dis_{c}"))
        aggs.append(_as_str(c, F.min).alias(f"__min_{c}"))
        aggs.append(_as_str(c, F.max).alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nul_{c}").alias("n_nulls"),
                F.col(f"__dis_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def table_diff(
    df_a: DataFrame,
    df_b: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two versions of a table keyed by
    ``key_cols``: one row per key present in either side, with
    ``diff_status`` ∈ {added, removed, changed, unchanged} — the
    data-ops audit behind snapshot comparisons and CDC validation.

    Non-key columns are compared via one md5 over a null-sentinel
    concat (a single 32-char hash crosses the join instead of the full
    row), so the FULL OUTER join carries keys + two hashes regardless of
    table width. One shuffle per side on the key.
    """
    if compare_cols is None:
        compare_cols = [c for c in df_a.columns if c not in key_cols]

    def _sig(df: DataFrame, alias: str) -> DataFrame:
        h = F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in compare_cols
                ],
            )
        )
        return df.select(*key_cols, h.alias(alias))

    a = _sig(df_a, "__ha")
    b = _sig(df_b, "__hb")
    joined = a.join(b, key_cols, "full_outer")
    status = (
        F.when(F.col("__ha").isNull(), F.lit("added"))
        .when(F.col("__hb").isNull(), F.lit("removed"))
        .when(F.col("__ha") != F.col("__hb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*key_cols, status.alias("diff_status"))


def benford_audit(
    df: DataFrame,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-data / unit-mixing audit for financial-style
    measures. Returns one row per digit 1..9: observed count, observed
    share, Benford-expected share log10(1+1/d), and the χ² contribution
    (n_d − n·p_d)²/(n·p_d), each rounded.

    One aggregate pass: the first digit is pure math on the double
    (v / 10^floor(log10(v))) — no string formatting, which engines
    render differently. Zero/null values are excluded (they have no
    leading digit).
    """
    v = F.abs(F.col(value_col).cast("double"))
    raw_digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("int")
    # log10 can round across an integer at power-of-ten boundaries
    # (v=9.99...e-28 -> digit 0 means the true digit is 9; an exact-10
    # quotient means the true digit is 1) — remap instead of emitting an
    # out-of-range digit row with a null expected share
    digit = (
        F.when(raw_digit == 0, F.lit(9))
        .when(raw_digit == 10, F.lit(1))
        .otherwise(raw_digit)
    ).cast("int")
    counts = (
        df.where(F.col(value_col).isNotNull() & (v > 0))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    from pyspark.sql import Window

    n_tot = F.sum("n_obs").over(Window.partitionBy(F.lit(1)))
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    n = n_tot.cast("double")
    dev = F.col("n_obs").cast("double") - n * expected
    chi2_term = (dev * dev) / (n * expected)
    return counts.select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs").cast("double") / n, round_to).alias("share"),
        F.round(expected, round_to).alias("expected"),
        F.round(chi2_term, round_to).alias("chi2_term"),
    )


def concentration_metrics(
    df: DataFrame,
    by: list[str],
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group market-concentration metrics over per-entity values
    (one row per entity, e.g. revenue per supplier): HHI (Σ share²,
    the antitrust standard) and the Gini coefficient via the rank
    formula G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n — the inequality audit
    for data/revenue skew.

    Exact discipline: values are 6dp decimals; Σx, Σx² and Σ i·x₍ᵢ₎
    accumulate exactly (rank × decimal stays decimal), floats appear
    once per group in a fixed expression. Ties in the rank ordering are
    harmless: equal values make Σ i·x invariant under any tie order.
    Negative values are rejected (Gini is undefined there).

    One per-group sort (the rank window) + one aggregate.
    """
    from pyspark.sql import Window

    keys = list(by)
    v = F.col(value_col).cast("decimal(18,6)")
    base = df.where(F.col(value_col).isNotNull()).select(
        *keys, v.alias("__v")
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col("__v").asc())
    ranked = base.withColumn("__i", F.row_number().over(w))
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("__v").alias("__mn"),
        F.sum("__v").alias("__sx"),
        F.sum((F.col("__v").cast("decimal(28,6)") * F.col("__v").cast("decimal(28,6)"))).alias("__sxx"),
        F.sum(F.col("__i") * F.col("__v").cast("decimal(28,6)")).alias("__six"),
    )
    # persist the tiny per-group aggregate BEFORE the validation action so
    # the guard's materialization is reused by the caller's query — without
    # it the full rank-window pipeline executes twice
    agg = agg.persist()
    bad = agg.where(F.col("__mn") < 0).limit(1).count()
    if bad:
        agg.unpersist()
        raise ValueError("concentration_metrics requires non-negative values")
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    six = F.col("__six").cast("double")
    hhi = F.when(sx > 0.0, sxx / (sx * sx))
    gini = F.when(
        sx > 0.0, (F.lit(2.0) * six) / (n * sx) - (n + F.lit(1.0)) / n
    )
    return agg.select(
        *keys,
        "n",
        F.round(hhi, round_to).alias("hhi"),
        F.round(gini, round_to).alias("gini"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_identifiers: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns: the
    privacy pre-release check for training/analytics exports. Returns
    one row per equivalence class SIZE bucket: ``(class_size, n_classes,
    n_rows, violates)`` where ``violates`` marks classes smaller than k
    (those rows are re-identifiable to ≤ class_size candidates).

    One groupBy on the quasi-identifiers (partial-agg shuffle), then a
    tiny re-aggregation by class size. Nulls count as a value (a null
    ZIP is itself identifying).
    """
    classes = df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).alias("__sz")
    )
    return (
        classes.groupBy(F.col("__sz").alias("class_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_classes"))
        .withColumn(
            "n_rows", (F.col("class_size") * F.col("n_classes")).cast("long")
        )
        .withColumn("violates", F.col("class_size") < k)
        .select("class_size", "n_classes", "n_rows", "violates")
    )


def data_contract_report(
    checks: list[tuple[str, DataFrame]],
) -> DataFrame:
    """Data-contract validation: run a list of named violation queries
    (each a DataFrame whose ROW COUNT is the number of violations) and
    return one row per check: ``(check, n_violations, passed)`` — the
    CI-gate shape for pipeline data quality (not-null, uniqueness,
    referential integrity, ranges).

    Each check DataFrame reduces to a count aggregate; the counts union
    into one tiny report relation — k independent scans, no driver-side
    collection of violating rows (point failures are re-queried ad hoc,
    the report only gates).
    """
    if not checks:
        raise ValueError("no checks given")
    parts = []
    for name, df in checks:
        parts.append(
            df.groupBy().agg(
                F.lit(name).alias("check"),
                F.count(F.lit(1)).cast("long").alias("n_violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)


def contract_checks_star(
    orders: DataFrame, lineitem: DataFrame, customer: DataFrame
) -> list[tuple[str, DataFrame]]:
    """Standard star-schema contract suite over the TPC-H-ish tables:
    duplicate PKs, FK orphans (lineitem→orders, orders→customer),
    not-null and range violations — each as a violations DataFrame for
    :func:`data_contract_report`."""
    dup_pk = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )
    li_orphans = lineitem.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_anti",
    )
    ord_orphans = orders.join(
        customer.select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey",
        "left_anti",
    )
    null_price = lineitem.where(F.col("l_extendedprice").isNull())
    bad_discount = lineitem.where(
        (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
    )
    return [
        ("orders_pk_unique", dup_pk),
        ("lineitem_fk_orders", li_orphans),
        ("orders_fk_customer", ord_orphans),
        ("lineitem_price_not_null", null_price),
        ("lineitem_discount_range", bad_discount),
    ]
