"""Scoped cache management for operators that persist intermediates.

Several operators persist intermediate DataFrames because the returned plan
consumes them more than once (MinHash signature tables, BM25 postings).
Those persists are correct for one-shot batch use — the session's storage
is reclaimed when it ends — but LEAK when the operator runs repeatedly in
one long-lived session: a ``foreachBatch`` streaming sink or a retrieval
service would accumulate executor storage per call, forever.

:class:`CacheScope` makes the persist lifetime explicit: operators persist
THROUGH the scope, and the caller releases everything once the returned
plan has been materialized (written, collected, counted)::

    scope = CacheScope()
    pairs = neardup_pairs_against_corpus(batch, corpus, "id", scope=scope)
    pairs.write.parquet(out)      # materialize first —
    scope.unpersist()             # — then release the intermediates

Operators keep ``scope=None`` defaults (persist-and-forget, batch
behavior); long-lived callers opt in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CacheScope:
    """Registry of DataFrames persisted on behalf of a caller.

    ``persist(df)`` persists and records; ``unpersist()`` releases every
    recorded DataFrame and empties the scope (idempotent; safe to call in a
    ``finally``). Unpersisting before the dependent plan is materialized is
    safe in Spark — the data just recomputes — but forfeits the reuse the
    persist existed for, so always materialize first.
    """

    def __init__(self) -> None:
        self._dfs: list[DataFrame] = []

    def persist(self, df: DataFrame) -> DataFrame:
        self._dfs.append(df.persist())
        return df

    def add(self, df: DataFrame) -> DataFrame:
        """Record an already-persisted DataFrame for release."""
        self._dfs.append(df)
        return df

    def unpersist(self, blocking: bool = False) -> None:
        for df in self._dfs:
            try:
                df.unpersist(blocking)
            except Exception:  # session already stopped — nothing to free
                pass
        self._dfs.clear()

    def __len__(self) -> int:
        return len(self._dfs)


def persist_in(scope: CacheScope | None, df: DataFrame) -> DataFrame:
    """Persist ``df`` into ``scope`` when given, else persist-and-forget
    (the one-shot batch default)."""
    if scope is not None:
        return scope.persist(df)
    return df.persist()
