"""Stateful streaming op: run under a real streaming query (availableNow
file source → memory sink) and compare final state to the batch oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ecu_sbl_aace_datalake_spark.sources.io import load_table
from ecu_sbl_aace_datalake_spark.streaming.stateful import (
    running_user_stats,
    running_user_stats_batch,
)


def test_stateful_stream_matches_batch_oracle(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "src")
    # several files → several input splits; availableNow drains them all
    events.repartition(4).write.parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 2
    ).parquet(src)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive

    # multiple micro-batches emit multiple updates per user: final state =
    # the row with the max n_events per user
    final = (
        spark.table("user_stats")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
    )
    got = {r.user_id: (r.n_events, r.total_value) for r in final.collect()}
    expected = {
        r.user_id: (r.n_events, r.total_value)
        for r in running_user_stats_batch(events).collect()
    }
    assert got == expected


def test_batch_oracle_shape(spark, sf_dir):
    # applyInPandasWithState is stream-only in Spark 4.x; the batch oracle
    # is the non-streaming equivalent users run on static data
    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    out = running_user_stats_batch(events)
    assert out.columns == ["user_id", "n_events", "total_value", "last_ts"]
    assert out.agg(F.sum("n_events")).first()[0] == events.count()


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python runner needs protobuf (not in container)",
)
def test_transform_with_state_matches_batch_oracle(spark, sf_dir, tmp_path):
    from ecu_sbl_aace_datalake_spark.streaming.stateful import (
        running_type_counts,
        running_type_counts_batch,
    )

    events = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    src = str(tmp_path / "src_tws")
    events.repartition(4).write.parquet(src)

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(events.schema).option(
            "maxFilesPerTrigger", 2
        ).parquet(src)
        q = (
            running_type_counts(stream)
            .writeStream.format("memory")
            .queryName("type_counts")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert not q.isActive
    finally:
        if prev_provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    final = (
        spark.table("type_counts")
        .groupBy("user_id")
        .agg(
            F.max("n_event_types").alias("n_event_types"),
            F.max("n_events").alias("n_events"),
        )
    )
    got = {r.user_id: (r.n_event_types, r.n_events) for r in final.collect()}
    expected = {
        r.user_id: (r.n_event_types, r.n_events)
        for r in running_type_counts_batch(events).collect()
    }
    assert got == expected


def test_type_counts_batch_oracle_shape(spark, sf_dir):
    from ecu_sbl_aace_datalake_spark.streaming.stateful import (
        running_type_counts_batch,
    )

    events = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    out = running_type_counts_batch(events)
    assert out.columns == ["user_id", "n_event_types", "n_events"]
    assert out.agg(F.sum("n_events")).first()[0] == events.count()
