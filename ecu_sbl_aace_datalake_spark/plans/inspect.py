"""Physical-plan inspection: assert the plan you'd want at 100 TB.

The engine delegates optimization to Catalyst (SURVEY.md §4) — these helpers
make the delegated properties *testable*: filter pushdown reached the scan,
column pruning narrowed the read schema, the dimension join is broadcast,
aggregation is partial (map-side combine), no cartesian products hide in a
plan. CI asserts them on the flagship queries so a regression that silently
de-optimizes a plan (e.g. a UDF blocking pushdown) fails loudly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanAudit:
    plan: str

    @classmethod
    def of(cls, df: DataFrame) -> "PlanAudit":
        return cls(formatted_plan(df))

    def has_pushed_filter(self, column: str) -> bool:
        """True if some pushed data filter mentions ``column`` (predicate
        reached the parquet/delta scan)."""
        for m in re.finditer(r"PushedFilters: \[(.*?)\]", self.plan):
            if column in m.group(1):
                return True
        return False

    def read_schema_only(self, columns: set[str]) -> bool:
        """True if every scan's ReadSchema is a subset of ``columns`` —
        column pruning worked; nothing extra is read off disk."""
        for m in re.finditer(r"ReadSchema: struct<(.*?)>", self.plan):
            read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
            if not read_cols <= columns:
                return False
        return True

    def scan_columns(self) -> list[set[str]]:
        return [
            {c.split(":")[0] for c in m.group(1).split(",") if c}
            for m in re.finditer(r"ReadSchema: struct<(.*?)>", self.plan)
        ]

    @property
    def broadcast_joins(self) -> int:
        return self.plan.count("BroadcastHashJoin")

    @property
    def sort_merge_joins(self) -> int:
        return self.plan.count("SortMergeJoin")

    @property
    def cartesian_products(self) -> int:
        return self.plan.count("CartesianProduct") + self.plan.count(
            "BroadcastNestedLoopJoin"
        )

    @property
    def has_partial_aggregation(self) -> bool:
        """Map-side combine before the shuffle (HashAggregate partial)."""
        return bool(re.search(r"HashAggregate.*\n(.|\n)*partial", self.plan)) or (
            "partial_" in self.plan
        )

    @property
    def wholestage_codegen_spans(self) -> int:
        return len(re.findall(r"WholeStageCodegen", self.plan))

    @staticmethod
    def codegen_subtrees(df: DataFrame, execute: bool = True) -> int:
        """Number of whole-stage-codegen subtrees. Under AQE the plan is not
        final until THIS DataFrame executes, so by default a collect() is
        triggered first (use on small/test data)."""
        if execute:
            df.collect()
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "codegen"
        )
        m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
        return int(m.group(1)) if m else 0

    @property
    def python_udf_nodes(self) -> int:
        """Python evaluation nodes in the plan — should be zero for hot-path
        reference-parity queries (Arrow/pandas nodes count too: they're the
        sanctioned slow path, flagged so their use stays deliberate)."""
        return (
            self.plan.count("BatchEvalPython")
            + self.plan.count("ArrowEvalPython")
            + self.plan.count("MapInPandas")
        )

    @property
    def exchanges(self) -> int:
        """Shuffle count — every Exchange is a full data materialization;
        fewer is better at fixed semantics. Matches both the formatted
        explain style ('(7) Exchange') and simple-plan style
        ('Exchange hashpartitioning(...)'); broadcast exchanges are NOT
        counted (they move only the small side)."""
        formatted = len(re.findall(r"\(\d+\) Exchange\b", self.plan))
        simple = len(
            re.findall(
                r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)",
                self.plan,
            )
        )
        return max(formatted, simple)


def audit_summary(df: DataFrame) -> dict[str, object]:
    """One-call scale audit — what a reviewer checks before shipping a query."""
    a = PlanAudit.of(df)
    return {
        "broadcast_joins": a.broadcast_joins,
        "sort_merge_joins": a.sort_merge_joins,
        "cartesian_products": a.cartesian_products,
        "exchanges": a.exchanges,
        "wholestage_codegen_spans": a.wholestage_codegen_spans,
        "python_udf_nodes": a.python_udf_nodes,
        "scan_columns": [sorted(s) for s in a.scan_columns()],
    }
