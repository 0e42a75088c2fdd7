"""Execution metrics: measure, don't guess.

After a DataFrame action, the executed physical plan carries SQLMetrics
(rows output, files/bytes read, shuffle bytes written, spill sizes) per
operator. This module walks the executed plan tree and aggregates them —
the numbers you check before claiming a query is scale-ready: how much was
actually read (pruning working?), how much shuffled (join strategy right?),
whether anything spilled.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame

# metric names worth surfacing, normalized
_INTERESTING = {
    "number of output rows": "output_rows",
    "number of files read": "files_read",
    "size of files read": "bytes_read",
    "shuffle bytes written": "shuffle_bytes_written",
    "shuffle records written": "shuffle_records_written",
    "data size": "broadcast_data_size",
    "spill size": "spill_bytes",
    "number of partitions": "partitions",
}


def execution_metrics(df: DataFrame, execute: bool = True) -> dict[str, int]:
    """Aggregate SQLMetrics across the executed plan. Triggers a collect()
    by default (metrics only exist after execution of THIS DataFrame)."""
    if execute:
        df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    totals: dict[str, int] = defaultdict(int)

    def walk(node) -> None:
        metrics = node.metrics()
        it = metrics.iterator()
        while it.hasNext():
            entry = it.next()
            name = entry._2().name().get() if entry._2().name().isDefined() else entry._1()
            key = _INTERESTING.get(str(name))
            if key:
                totals[key] += int(entry._2().value())
        children = node.children()
        cit = children.iterator()
        while cit.hasNext():
            walk(cit.next())
        # AQE wraps the real plan; descend into materialized subtrees
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        elif cls.endswith("QueryStageExec"):  # Result/Shuffle/Broadcast/TableCache...
            walk(node.plan())
        elif cls == "ReusedExchangeExec":
            pass  # metrics belong to the original exchange

    walk(plan)
    return dict(totals)
