"""Stateful streaming op: run under a real streaming query (availableNow
file source → memory sink) and compare final state to the batch oracle."""

from __future__ import annotations

import pyspark.sql.functions as F

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
