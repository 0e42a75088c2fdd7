"""Declarative data-quality checks (dbt-tests / expectations style).

The validation layer a lakehouse runs before publishing a table: each rule
compiles to a violation-count expression, ALL rules evaluate in a single
aggregate pass over the table (no per-rule jobs — same batching principle
as transform.cast_columns), and referential checks add one anti-join each.

Rules:
- ``not_null(col)``
- ``unique(col, ...)``        (composite keys supported)
- ``accepted_values(col, [...])``
- ``in_range(col, lo, hi)``   (inclusive)
- ``matches(col, regex)``
- ``references(col, other_df, other_col)``  (FK integrity)

Returns a report DataFrame ``(rule, column, violations, passed)`` and an
overall ``ok`` flag; ``expect`` raises on failure for pipeline gating.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    kind: str
    column: str
    params: tuple = field(default_factory=tuple)

    @property
    def label(self) -> str:
        return f"{self.kind}({self.column})"


def not_null(col: str) -> Rule:
    return Rule("not_null", col)


def unique(*cols: str) -> Rule:
    return Rule("unique", ",".join(cols), tuple(cols))


def accepted_values(col: str, values: list[Any]) -> Rule:
    return Rule("accepted_values", col, tuple(values))


def in_range(col: str, lo: Any, hi: Any) -> Rule:
    return Rule("in_range", col, (lo, hi))


def matches(col: str, pattern: str) -> Rule:
    return Rule("matches", col, (pattern,))


def references(col: str, other: DataFrame, other_col: str) -> Rule:
    return Rule("references", col, (other, other_col))


def _violation_expr(rule: Rule) -> Column | None:
    """Single-pass violation counter for row-local rules; None for rules
    needing their own plan (unique, references)."""
    c = F.col(rule.column) if rule.kind != "unique" else None
    if rule.kind == "not_null":
        return F.sum(c.isNull().cast("long"))
    if rule.kind == "accepted_values":
        allowed = F.array(*[F.lit(v) for v in rule.params])
        return F.sum(
            (c.isNotNull() & ~F.array_contains(allowed, c)).cast("long")
        )
    if rule.kind == "in_range":
        lo, hi = rule.params
        return F.sum((c.isNotNull() & ~c.between(lo, hi)).cast("long"))
    if rule.kind == "matches":
        (pattern,) = rule.params
        return F.sum((c.isNotNull() & ~c.rlike(pattern)).cast("long"))
    return None


def check_table(
    spark: SparkSession, df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, bool]:
    """Evaluate all rules; returns (report_df, ok). Row-local rules share
    ONE aggregate job; each unique/references rule adds one more."""
    results: list[tuple[str, str, int]] = []

    agg_rules = [(r, _violation_expr(r)) for r in rules]
    single_pass = [(r, e) for r, e in agg_rules if e is not None]
    if single_pass:
        row = df.agg(
            *[e.alias(f"__r{i}") for i, (_, e) in enumerate(single_pass)]
        ).first()
        for i, (r, _) in enumerate(single_pass):
            results.append((r.kind, r.column, int(row[f"__r{i}"] or 0)))

    for r in rules:
        if r.kind == "unique":
            cols = list(r.params)
            dup_rows = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > 1)
                .agg(F.coalesce(F.sum("__n"), F.lit(0)).alias("v"))
                .first()["v"]
            )
            results.append((r.kind, r.column, int(dup_rows)))
        elif r.kind == "references":
            other, other_col = r.params
            orphans = (
                df.select(F.col(r.column).alias("__k"))
                .where(F.col(r.column).isNotNull())
                .join(
                    other.select(F.col(other_col).alias("__k")).distinct(),
                    "__k",
                    "left_anti",
                )
                .count()
            )
            results.append((r.kind, r.column, int(orphans)))

    report = spark.createDataFrame(
        [(k, c, v, v == 0) for k, c, v in results],
        "rule string, column string, violations long, passed boolean",
    )
    return report, all(v == 0 for _, _, v in results)


def expect(spark: SparkSession, df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Gate form: raises ValueError listing failed rules; returns the report
    when clean — drop it at the end of a pipeline before write_table."""
    report, ok = check_table(spark, df, rules)
    if not ok:
        failed = [
            f"{r.rule}({r.column})={r.violations}"
            for r in report.collect()
            if not r.passed
        ]
        raise ValueError(f"data-quality check failed: {', '.join(failed)}")
    return report


def psi_drift(
    reference: DataFrame,
    current: DataFrame,
    col: str,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index per bin between a reference distribution
    and a current batch — the standard data-drift monitor a training
    pipeline runs before accepting new data (rule of thumb: total PSI
    < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).

    Equi-width bins over the REFERENCE min/max (a 1-row broadcast scalar);
    out-of-range current values clamp to the edge bins. Shares are
    ``eps``-smoothed so empty bins contribute finitely. Everything is one
    aggregation per side over the bin id plus a ≤``bins``-row join — the
    two input scans dominate at any scale.

    Output: (bin, n_ref, n_cur, p_ref, p_cur, psi) — one row per bin;
    ``SUM(psi)`` is the headline index.
    """
    from pyspark.sql.window import Window

    stats = reference.agg(
        F.min(F.col(col).cast("double")).alias("mn"),
        F.max(F.col(col).cast("double")).alias("mx"),
    )

    def binned(df: DataFrame, name: str) -> DataFrame:
        width = (F.col("mx") - F.col("mn")) / float(bins)
        raw = F.floor((F.col(col).cast("double") - F.col("mn")) / width)
        bin_id = F.least(
            F.lit(bins - 1), F.greatest(F.lit(0), raw.cast("int"))
        )
        return (
            df.crossJoin(F.broadcast(stats))
            .where(F.col(col).isNotNull())
            .select(bin_id.alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias(name))
        )

    spine = reference.sparkSession.range(bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        spine.join(binned(reference, "n_ref"), "bin", "left")
        .join(binned(current, "n_cur"), "bin", "left")
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    w = Window.partitionBy()
    p = F.col("n_ref") / F.sum("n_ref").over(w) + eps
    q = F.col("n_cur") / F.sum("n_cur").over(w) + eps
    return joined.select(
        "bin",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(p, 6).alias("p_ref"),
        F.round(q, 6).alias("p_cur"),
        F.round((p - q) * F.log(p / q), 6).alias("psi"),
    ).orderBy("bin")


def ks_drift(
    df: DataFrame,
    value_col: str,
    sample_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic per group — the
    distribution-shape complement to the binned PSI monitor:
    ``D = max_x |F_a(x) - F_b(x)|`` where ``sample_col`` (boolean) tags
    which sample a row belongs to (true → a / reference, false → b /
    current).

    Plan: one groupBy on (group, value) collapses rows to distinct values
    with per-sample counts, then a window ORDERED BY VALUE inside each
    group builds both empirical CDFs in a single cumulative pass; D is the
    max absolute gap. The window partitions by ``group_cols``, so each
    group's distinct values stream through one partition — fine when
    groups are monitoring dimensions; for one giant ungrouped sample at
    100 TB, pre-bin values (as :func:`psi table drift<psi>` does) or
    quantile-sketch both sides instead of exact-sweeping.

    Returns per group: ``ks_stat``, ``n_a``, ``n_b``.
    """
    from pyspark.sql import Window

    groups = list(group_cols or [])
    a_cnt = F.sum(F.when(F.col(sample_col), 1).otherwise(0))
    b_cnt = F.sum(F.when(~F.col(sample_col), 1).otherwise(0))
    per_value = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*groups, F.col(value_col).alias("__v"))
        .agg(a_cnt.alias("__na"), b_cnt.alias("__nb"))
    )
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*groups)
    cdf = per_value.select(
        *groups,
        (F.sum("__na").over(w_cum) / F.sum("__na").over(w_all)).alias("__fa"),
        (F.sum("__nb").over(w_cum) / F.sum("__nb").over(w_all)).alias("__fb"),
        F.sum("__na").over(w_all).alias("__ta"),
        F.sum("__nb").over(w_all).alias("__tb"),
    )
    return cdf.groupBy(*groups).agg(
        F.round(F.max(F.abs(F.col("__fa") - F.col("__fb"))), round_to).alias(
            "ks_stat"
        ),
        F.max("__ta").cast("long").alias("n_a"),
        F.max("__tb").cast("long").alias("n_b"),
    )


def chi2_drift(
    df: DataFrame,
    cat_col: str,
    sample_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Chi-squared homogeneity drift for CATEGORICAL columns — completes
    the drift toolkit (PSI: binned numeric, KS: continuous numeric, chi²:
    categories): are the category frequencies of sample a (``sample_col``
    true) and sample b drawn from the same distribution?

    ``X² = Σ_cells (observed - expected)² / expected`` over the 2×C table
    per group, ``expected = row_total·col_total/n``. Also emits the degrees
    of freedom (C-1) so callers can look up the p-value threshold.

    One groupBy on (group, category) then a tiny per-group aggregation —
    categories per group are bounded, so nothing sweeps a single partition.
    """
    groups = list(group_cols or [])
    per_cat = (
        df.where(F.col(cat_col).isNotNull())
        .groupBy(*groups, F.col(cat_col).alias("__c"))
        .agg(
            F.sum(F.when(F.col(sample_col), 1).otherwise(0)).alias("__oa"),
            F.sum(F.when(~F.col(sample_col), 1).otherwise(0)).alias("__ob"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*groups)
    with_tot = per_cat.select(
        *groups, "__c", "__oa", "__ob",
        F.sum("__oa").over(w).alias("__ta"),
        F.sum("__ob").over(w).alias("__tb"),
    )
    n = (F.col("__ta") + F.col("__tb")).cast("double")
    ea = (F.col("__oa") + F.col("__ob")) * F.col("__ta") / n
    eb = (F.col("__oa") + F.col("__ob")) * F.col("__tb") / n
    cell = F.when(ea > 0, F.pow(F.col("__oa") - ea, 2) / ea).otherwise(0.0) + F.when(
        eb > 0, F.pow(F.col("__ob") - eb, 2) / eb
    ).otherwise(0.0)
    return with_tot.groupBy(*groups).agg(
        F.round(F.sum(cell), round_to).alias("chi2"),
        (F.count("*") - 1).cast("long").alias("dof"),
        F.max("__ta").cast("long").alias("n_a"),
        F.max("__tb").cast("long").alias("n_b"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    k: float = 3.0,
    out_col: str = "is_outlier",
) -> DataFrame:
    """Robust outlier flags via median absolute deviation: per group,
    ``median`` and ``MAD = median(|x - median|)``; a row is an outlier
    when ``|x - median| > k · 1.4826 · MAD`` (1.4826 scales MAD to σ for
    normal data). Unlike the z-score flagger, a few extreme points cannot
    drag the threshold — the estimator the anomaly literature actually
    recommends for heavy-tailed telemetry.

    Two exact-percentile aggregates + two broadcast-joins back; group
    medians are exact (interpolated), not approximate — drift monitoring
    wants reproducible flags. Adds ``group_median``, ``group_mad`` (6dp)
    and ``out_col``. Groups where MAD = 0 (over half the values identical)
    flag any deviation at all as an outlier.
    """
    gcols = list(group_cols)
    med = df.groupBy(*gcols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    j1 = df.join(F.broadcast(med), gcols) if gcols else df.crossJoin(F.broadcast(med))
    j1 = j1.withColumn("__adev", F.abs(F.col(value_col) - F.col("__med")))
    mad = j1.groupBy(*gcols).agg(
        F.expr("percentile(__adev, 0.5)").alias("__mad")
    )
    j2 = (
        j1.join(F.broadcast(mad), gcols)
        if gcols
        else j1.crossJoin(F.broadcast(mad))
    )
    thresh = F.lit(float(k) * 1.4826) * F.col("__mad")
    return (
        j2.withColumn(
            out_col,
            F.when(F.col("__mad") > 0, F.col("__adev") > thresh)
            .otherwise(F.col("__adev") > 0),
        )
        .withColumn("group_median", F.round(F.col("__med") + F.lit(1e-9), 6))
        .withColumn("group_mad", F.round(F.col("__mad") + F.lit(1e-9), 6))
        .drop("__med", "__mad", "__adev")
    )


def drift_report(
    reference: DataFrame,
    current: DataFrame,
    columns: list[str],
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Multi-column drift report: total PSI per numeric column between a
    reference snapshot and a current batch, with the rule-of-thumb
    verdict ('stable' < 0.1 ≤ 'drifting' < 0.25 ≤ 'shifted') — the
    one-page table a pipeline gate reads before admitting new data,
    built by unioning :func:`psi_drift`'s per-bin relation per column.

    Per-bin PSI terms are rounded to 9dp and summed as exact decimals so
    the total is partitioning-independent. Each column costs the two
    input scans; columns are independent plan branches (Spark runs them
    as one job per action — pass few, wide columns lists belong in a
    profiling sweep).

    Returns ``(column, psi_total, verdict)``, one row per column.
    """
    parts = []
    for c in columns:
        per_bin = psi_drift(reference, current, c, bins=bins, eps=eps)
        parts.append(
            per_bin.agg(
                F.round(
                    F.sum(
                        F.round(F.col("psi"), 9).cast("decimal(18,9)")
                    ).cast("double"),
                    6,
                ).alias("psi_total")
            ).select(F.lit(c).alias("column"), "psi_total")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    verdict = (
        F.when(F.col("psi_total") < 0.1, F.lit("stable"))
        .when(F.col("psi_total") < 0.25, F.lit("drifting"))
        .otherwise(F.lit("shifted"))
    )
    return out.select("column", "psi_total", verdict.alias("verdict"))
