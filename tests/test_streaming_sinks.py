"""Streaming dedup, stream-stream join, and the foreachBatch upsert sink —
all run as real streaming queries (availableNow) on file sources."""

from __future__ import annotations

import tempfile

import pytest

import pyspark.sql.functions as F

from ecu_sbl_aace_datalake_spark.sources.catalog import Lakehouse
from ecu_sbl_aace_datalake_spark.sources.io import load_table, read_path
from ecu_sbl_aace_datalake_spark.streaming.sinks import (
    foreach_batch_upsert,
    stream_stream_join,
    streaming_dedup,
)


def _stream_from(spark, df, tmp_path, name):
    src = str(tmp_path / name)
    df.write.parquet(src)
    return spark.readStream.schema(df.schema).parquet(src)


class TestStreamingDedup:
    def test_duplicates_within_watermark_dropped(self, spark, sf_dir, tmp_path):
        events = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
        doubled = events.union(events)  # every key duplicated
        stream = _stream_from(spark, doubled, tmp_path, "dd_src")
        q = (
            streaming_dedup(stream, ["event_id"], "ts", "1 hour")
            .writeStream.format("memory")
            .queryName("dd_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        out = spark.table("dd_out")
        assert out.count() == events.count()
        assert out.select("event_id").distinct().count() == out.count()


class TestStreamStreamJoin:
    def test_range_join_matches_batch_equivalent(self, spark, sf_dir, tmp_path):
        events = load_table(spark, sf_dir, "events").withColumn(
            "ts", F.date_trunc("second", "ts")
        )
        clicks = events.where("event_type = 'click'").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        errors = events.where("event_type = 'error'").select(
            "user_id", F.col("ts").alias("err_ts"), F.col("event_id").alias("err_id")
        )
        ls = _stream_from(spark, clicks, tmp_path, "ss_l")
        rs = _stream_from(spark, errors, tmp_path, "ss_r")
        joined = stream_stream_join(
            ls, rs, on="user_id", left_ts="ts", right_ts="err_ts",
            watermark_delay="2 hours", range_within="10 minutes",
        ).select("click_id", "err_id")
        q = (
            joined.writeStream.format("memory")
            .queryName("ss_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {(r.click_id, r.err_id) for r in spark.table("ss_out").collect()}
        expected = {
            (r.click_id, r.err_id)
            for r in clicks.join(
                errors,
                (clicks.user_id == errors.user_id)
                & (errors.err_ts >= clicks.ts - F.expr("INTERVAL 10 minutes"))
                & (errors.err_ts <= clicks.ts + F.expr("INTERVAL 10 minutes")),
            ).collect()
        }
        assert got == expected and len(got) > 0


class TestForeachBatchUpsert:
    def test_stream_merges_into_lakehouse(self, spark, sf_dir, tmp_path):
        lh = Lakehouse("s", tempfile.mkdtemp())
        nation = load_table(spark, sf_dir, "nation")
        updates = nation.withColumn(
            "n_name", F.when(F.col("n_nationkey") == 0, "STREAMED").otherwise(F.col("n_name"))
        ).union(
            spark.createDataFrame([(99, "NEWSTREAM", 1)], nation.schema)
        )
        stream = _stream_from(spark, updates, tmp_path, "fb_src")
        q = foreach_batch_upsert(
            stream, lh, "nation", keys=["n_nationkey"],
            checkpoint_dir=str(tmp_path / "fb_ckpt"),
        )
        q.awaitTermination(180)
        back = read_path(spark, f"{lh.tables_path}/nation", "parquet")
        rows = {r.n_nationkey: r.n_name for r in back.collect()}
        assert rows[0] == "STREAMED"
        assert rows[99] == "NEWSTREAM"
        assert len(rows) == 26


class TestWatermarkLateData:
    def test_late_event_dropped_from_windowed_agg(self, spark, tmp_path):
        """Watermark semantics end-to-end: after batch 1 advances the
        watermark past a window's close, a batch-2 event older than the
        watermark must NOT reopen that window (append mode only emits
        closed windows once)."""
        import os

        from pyspark.sql import functions as SF

        src = str(tmp_path / "wm_src")
        ckpt = str(tmp_path / "wm_ckpt")
        os.makedirs(src)
        schema = "event_id long, ts string, value double"

        out_dir = str(tmp_path / "wm_out")

        def run():
            stream = (
                spark.readStream
                .schema("event_id long, ts timestamp, value double")
                .parquet(src + "/*")
            )
            agg = (
                stream.withWatermark("ts", "10 minutes")
                .groupBy(SF.window("ts", "1 hour").alias("w"))
                .agg(SF.sum("value").alias("total"))
                .select(SF.col("w.start").cast("string").alias("ws"), "total")
            )
            # parquet sink: append-mode + checkpoint-recoverable (memory
            # sink can't resume from a checkpoint)
            q = (
                agg.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append").trigger(availableNow=True).start()
            )
            q.awaitTermination(180)
            return {r.ws: r.total for r in spark.read.parquet(out_dir).collect()}

        # run 1: events in hour 10 and hour 13 → watermark reaches 12:50,
        # the 10:00 window closes and is emitted with batch-1 totals
        spark.createDataFrame(
            [(1, "2024-01-01 10:05:00", 1.0),
             (2, "2024-01-01 10:20:00", 2.0),
             (3, "2024-01-01 13:00:00", 5.0)],
            schema,
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) AS ts", "value"
        ).coalesce(1).write.parquet(src + "/b1")
        first = run()
        assert first.get("2024-01-01 10:00:00") == 3.0, first

        # run 2 (same checkpoint → persisted watermark): a LATE event for
        # the closed 10:00 window must be DROPPED — no re-emission
        spark.createDataFrame(
            [(4, "2024-01-01 10:40:00", 100.0)], schema
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) AS ts", "value"
        ).coalesce(1).write.parquet(src + "/b2")
        second = run()  # cumulative sink contents; the closed window must
        # still show ONLY batch-1 totals — the late 100.0 was dropped
        assert second.get("2024-01-01 10:00:00") == 3.0, second


class TestForeachBatchAggState:
    def test_streamed_state_equals_batch_recompute(self, spark, sf_dir, tmp_path):
        import os

        from ecu_sbl_aace_datalake_spark.operators import aggstate
        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            foreach_batch_agg_state,
        )

        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        src = str(tmp_path / "aggstate_src")
        os.makedirs(src)
        # two micro-batches (one file each, maxFilesPerTrigger=1)
        orders.where("o_orderkey % 2 = 0").coalesce(1).write.parquet(src + "/b1")
        orders.where("o_orderkey % 2 = 1").coalesce(1).write.parquet(src + "/b2")
        stream = (
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        lh = Lakehouse("ag", tempfile.mkdtemp())
        q = foreach_batch_agg_state(
            stream, lh, "order_state", keys=["o_custkey"],
            value_col="o_totalprice",
            checkpoint_dir=str(tmp_path / "ag_ckpt"), with_hll=False,
        )
        q.awaitTermination(180)
        from ecu_sbl_aace_datalake_spark.sources.io import read_table

        streamed = aggstate.finalize_state(
            read_table(spark, lh, "order_state"), ["o_custkey"]
        )
        recomputed = aggstate.finalize_state(
            aggstate.agg_state(orders, ["o_custkey"], "o_totalprice",
                               with_hll=False),
            ["o_custkey"],
        )
        assert sorted(map(tuple, streamed.collect())) == \
            sorted(map(tuple, recomputed.collect()))

    def test_replayed_batch_is_skipped(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.operators import aggstate
        from ecu_sbl_aace_datalake_spark.sources.io import read_table
        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            merge_batch_into_state,
        )

        orders = load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_totalprice"
        )
        lh = Lakehouse("agr", tempfile.mkdtemp())
        assert merge_batch_into_state(
            lh, "st", ["o_custkey"], "o_totalprice", orders, 0, with_hll=False
        )
        once = sorted(map(tuple, aggstate.finalize_state(
            read_table(spark, lh, "st"), ["o_custkey"]).collect()))
        # foreachBatch crash-replay of the SAME batch id must be a no-op
        assert merge_batch_into_state(
            lh, "st", ["o_custkey"], "o_totalprice", orders, 0, with_hll=False
        ) is False
        again = sorted(map(tuple, aggstate.finalize_state(
            read_table(spark, lh, "st"), ["o_custkey"]).collect()))
        assert again == once


class TestForeachBatchDedupIngest:
    def test_corpus_grows_only_by_novel_content(self, spark, tmp_path):
        import os

        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            foreach_batch_dedup_ingest,
        )

        base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
        other = "one two three four five six seven eight nine ten eleven twelve"
        src = str(tmp_path / "ingest_src")
        os.makedirs(src)
        schema = "doc_id long, text string"
        # one parquet file per micro-batch (maxFilesPerTrigger=1)
        spark.createDataFrame(
            [(1, base), (2, other)], schema
        ).coalesce(1).write.parquet(src + "/b1", mode="overwrite")
        spark.createDataFrame(
            [(10, base),                 # exact dup of doc 1
             (11, base + " kilo"),       # near-dup of doc 1
             (12, "genuinely novel words never seen before anywhere")],
            schema,
        ).coalesce(1).write.parquet(src + "/b2", mode="overwrite")
        import glob
        import shutil

        for i, sub in enumerate(("b1", "b2")):
            part = glob.glob(f"{src}/{sub}/part-*.parquet")[0]
            shutil.move(part, f"{src}/batch{i}.parquet")
            shutil.rmtree(f"{src}/{sub}")
            os.utime(f"{src}/batch{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        lh = Lakehouse("x", str(tmp_path / "lh"))
        q = foreach_batch_dedup_ingest(
            stream, lh, "corpus", "doc_id",
            checkpoint_dir=str(tmp_path / "ckpt"), threshold=0.5,
        )
        q.awaitTermination(240)
        corpus = read_path(spark, str(tmp_path / "lh") + "/Tables/corpus")
        kept = {r.doc_id for r in corpus.collect()}
        # batch1 both kept; batch2 only the novel doc survives the door
        assert kept == {1, 2, 12}


class TestForeachBatchDedupIngestIndexed:
    def test_indexed_sink_matches_plain_and_maintains_index(self, spark, tmp_path):
        import glob
        import os
        import shutil

        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            foreach_batch_dedup_ingest_indexed,
        )

        base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
        other = "one two three four five six seven eight nine ten eleven twelve"
        src = str(tmp_path / "ingest_src_idx")
        os.makedirs(src)
        schema = "doc_id long, text string"
        spark.createDataFrame([(1, base), (2, other)], schema).coalesce(
            1
        ).write.parquet(src + "/b1", mode="overwrite")
        spark.createDataFrame(
            [(10, base),                 # exact dup of doc 1
             (11, base + " kilo"),       # near-dup of doc 1
             (12, "genuinely novel words never seen before anywhere")],
            schema,
        ).coalesce(1).write.parquet(src + "/b2", mode="overwrite")
        for i, sub in enumerate(("b1", "b2")):
            part = glob.glob(f"{src}/{sub}/part-*.parquet")[0]
            shutil.move(part, f"{src}/batch{i}.parquet")
            shutil.rmtree(f"{src}/{sub}")
            os.utime(f"{src}/batch{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        lh = Lakehouse("x", str(tmp_path / "lh_idx"))
        try:
            q = foreach_batch_dedup_ingest_indexed(
                stream, lh, "corpus_i", "doc_id",
                checkpoint_dir=str(tmp_path / "ckpt_idx"), threshold=0.5,
                bands=32,
            )
            q.awaitTermination(240)
            corpus = read_path(spark, str(tmp_path / "lh_idx") + "/Tables/corpus_i")
            kept = {r.doc_id for r in corpus.collect()}
            assert kept == {1, 2, 12}
            # side tables cover exactly the accepted corpus
            n_hashes = spark.table("corpus_i_nd_hashes").count()
            assert n_hashes == 3
            sh_ids = {
                r.corpus_id for r in spark.table("corpus_i_nd_shingles").collect()
            }
            assert sh_ids == {1, 2, 12}
            # band rows: bands per accepted doc
            assert spark.table("corpus_i_nd_bands").count() == 3 * 32
        finally:
            for t in ("corpus_i_nd_hashes", "corpus_i_nd_bands",
                      "corpus_i_nd_shingles"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


class TestForeachBatchCdcApply:
    def test_changelog_stream_equals_batch_apply(self, spark, sf_dir, tmp_path):
        from ecu_sbl_aace_datalake_spark.operators.star import apply_changelog
        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            foreach_batch_cdc_apply,
        )

        lh = Lakehouse("s", tempfile.mkdtemp())
        nation = load_table(spark, sf_dir, "nation")
        # bootstrap the snapshot via an initial all-insert changelog, then a
        # second logical wave with updates, a delete and a competing pair
        boot = nation.select(
            "n_nationkey", "n_name", "n_regionkey",
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
            F.lit(0).alias("seq"),
            F.lit("I").alias("op"),
        )
        wave = spark.createDataFrame(
            [
                (0, "FIRST", 0, "2024-02-01 00:00:00", 1, "U"),
                (0, "SECOND", 0, "2024-02-01 00:00:00", 2, "U"),   # wins
                (1, None, None, "2024-02-01 00:00:00", 1, "D"),    # delete
                (99, "BRANDNEW", 3, "2024-02-01 00:00:00", 1, "I"),
            ],
            "n_nationkey long, n_name string, n_regionkey long, ts string, seq long, op string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        changelog = boot.unionByName(wave)

        stream = _stream_from(spark, changelog, tmp_path, "cdc_src")
        q = foreach_batch_cdc_apply(
            stream, lh, "nation_cdc", keys=["n_nationkey"],
            checkpoint_dir=str(tmp_path / "cdc_ckpt"), seq_col="seq",
        )
        q.awaitTermination(180)

        back = read_path(spark, f"{lh.tables_path}/nation_cdc", "parquet")
        want = apply_changelog(
            nation.select("n_nationkey", "n_name", "n_regionkey").limit(0),
            changelog, "n_nationkey", seq_col="seq",
        )
        got_rows = {r.n_nationkey: r.n_name for r in back.collect()}
        want_rows = {r.n_nationkey: r.n_name for r in want.collect()}
        assert got_rows == want_rows
        assert got_rows[0] == "SECOND"
        assert 1 not in got_rows
        assert got_rows[99] == "BRANDNEW"
        assert len(got_rows) == 25  # 25 nations - 1 deleted + 1 inserted


class TestStreamedTrending:
    def test_trending_from_streamed_state_equals_batch(self, spark, sf_dir, tmp_path):
        """Trend detection over INCREMENTALLY accumulated state: per-(type,
        day) counts built by the replay-safe agg-state sink across two
        micro-batches, then lag ratios over the state — must equal
        ev.trending_counts on the full batch data (the stream/batch-parity
        contract for the trending pipeline)."""
        import os

        from pyspark.sql import functions as F

        from ecu_sbl_aace_datalake_spark.operators import aggstate
        from ecu_sbl_aace_datalake_spark.streaming import events as ev
        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            foreach_batch_agg_state,
        )

        evts = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "event_type",
            F.col("ts").cast("date").alias("day"),
        )
        src = str(tmp_path / "trend_src")
        os.makedirs(src)
        evts.where("event_id % 2 = 0").coalesce(1).write.parquet(src + "/b1")
        evts.where("event_id % 2 = 1").coalesce(1).write.parquet(src + "/b2")
        stream = (
            spark.readStream.schema(evts.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        lh = Lakehouse("tr", tempfile.mkdtemp())
        q = foreach_batch_agg_state(
            stream, lh, "trend_state", keys=["event_type", "day"],
            value_col="event_id",
            checkpoint_dir=str(tmp_path / "tr_ckpt"), with_hll=False,
        )
        q.awaitTermination(180)
        from ecu_sbl_aace_datalake_spark.sources.io import read_table

        state = read_table(spark, lh, "trend_state")
        counts = state.select(
            F.col("event_type").alias("type"), F.col("day").alias("bucket"),
            F.col("cnt").cast("long").alias("n"),
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("type").orderBy("bucket")
        prev = F.lag("n").over(w)
        streamed = counts.select(
            "type", "bucket", "n", prev.alias("n_prev"),
            F.round(
                F.when(prev >= 1, F.col("n").cast("double") / prev.cast("double")),
                6,
            ).alias("trend_ratio"),
        )
        batch = ev.trending_counts(
            load_table(spark, sf_dir, "events"), bucket="day"
        )
        assert sorted(map(tuple, streamed.collect())) == \
            sorted(map(tuple, batch.collect()))


class TestForeachBatchCorpusIngest:
    def test_gates_dedup_and_cross_batch_caps(self, spark, tmp_path):
        import glob
        import hashlib
        import os
        import shutil

        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            foreach_batch_corpus_ingest,
        )

        schema = "doc_id long, text string, source string"
        b1 = [
            (1, "the quick brown fox jumps over the lazy dog", "s0"),
            (2, "the cat and the hat went off to the market", "s0"),
            (3, "the sun and the moon and all of the stars", "s0"),
            (4, "the rain in spain falls mostly on the plain", "s1"),
            (5, "uno dos tres cuatro cinco seis siete ocho", "s1"),  # und
        ]
        b2 = [
            (10, "the quick brown fox jumps over the lazy dog", "s0"),  # dup
            (11, "the wind and the waves and also the tide", "s0"),  # cap full
            (12, "the bird and the bee and also the tree", "s1"),
        ]
        src = str(tmp_path / "ci_src")
        os.makedirs(src)
        for i, rows in enumerate((b1, b2)):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                src + f"/b{i}", mode="overwrite"
            )
            part = glob.glob(f"{src}/b{i}/part-*.parquet")[0]
            shutil.move(part, f"{src}/batch{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
            os.utime(
                f"{src}/batch{i}.parquet",
                (1_700_000_000 + i, 1_700_000_000 + i),
            )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        lh = Lakehouse("x", str(tmp_path / "ci_lh"))
        q = foreach_batch_corpus_ingest(
            stream, lh, "corpus", "doc_id",
            checkpoint_dir=str(tmp_path / "ci_ckpt"),
            keep_langs=("en",), min_quality=0.0,
            cap_per_source=2, near_dup=False,
        )
        q.awaitTermination(240)
        corpus = read_path(spark, str(tmp_path / "ci_lh") + "/Tables/corpus")
        kept = {r.doc_id for r in corpus.collect()}
        # batch-1 s0 admits the 2 smallest md5('cap'||id) priorities of {1,2,3}
        pri = lambda i: int(hashlib.md5(f"cap{i}".encode()).hexdigest()[:15], 16)
        s0_expect = set(sorted([1, 2, 3], key=lambda i: (pri(i), i))[:2])
        assert kept == s0_expect | {4, 12}, kept
        # provenance columns present; per-source cap invariant holds
        assert {"lang_pred", "quality_score"} <= set(corpus.columns)
        per_src = {
            r["source"]: r["n"]
            for r in corpus.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert per_src == {"s0": 2, "s1": 2}
        # counts state reflects the accepted totals
        counts = read_path(
            spark, str(tmp_path / "ci_lh") + "/Tables/corpus_src_counts"
        )
        got = {r["source"]: r["cnt"] for r in counts.collect()}
        assert got == {"s0": 2, "s1": 2}

    def test_decontamination_doors_across_batches(self, spark, tmp_path):
        """Round 7 (VERDICT_r06 item #4): the static benchmark's BOTH
        decontamination doors fire at ingest — a verbatim leak is rejected
        in batch 0 by the exact 8-gram door, and a PARAPHRASED leak
        (marker word injected after every 6th word in the benchmark copy:
        no shared word-8-gram, bigram Jaccard ≈ 0.68) arriving in a LATER
        batch is rejected by the fuzzy MinHash door; clean docs in both
        batches survive."""
        import glob
        import os
        import shutil

        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            foreach_batch_corpus_ingest,
        )

        exact_bench = (
            "sierra tango uniform victor whiskey xray yankee zulu "
            "one two three four five six seven eight"
        )
        fuzzy_orig = (
            "alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo"
        )
        w = fuzzy_orig.split()
        fuzzy_bench = " ".join(
            sum(([t, "zzmk"] if (i + 1) % 6 == 0 else [t] for i, t in enumerate(w)), [])
        )
        schema = "doc_id long, text string, source string"
        b0 = [
            (10, exact_bench, "s0"),  # verbatim leak -> exact door
            (11, "red orange yellow green blue indigo violet pink brown", "s0"),
        ]
        b1 = [
            (20, fuzzy_orig, "s0"),  # paraphrased leak -> fuzzy door only
            (21, "north south east west up down left right front back", "s0"),
        ]
        src = str(tmp_path / "dc_src")
        os.makedirs(src)
        for i, rows in enumerate((b0, b1)):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                src + f"/b{i}", mode="overwrite"
            )
            part = glob.glob(f"{src}/b{i}/part-*.parquet")[0]
            shutil.move(part, f"{src}/batch{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
            os.utime(
                f"{src}/batch{i}.parquet",
                (1_700_000_000 + i, 1_700_000_000 + i),
            )
        bench_df = spark.createDataFrame(
            [(exact_bench,), (fuzzy_bench,)], "text string"
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        lh = Lakehouse("x", str(tmp_path / "dc_lh"))
        q = foreach_batch_corpus_ingest(
            stream, lh, "corpus", "doc_id",
            checkpoint_dir=str(tmp_path / "dc_ckpt"),
            keep_langs=("en", "und"), min_quality=0.0,
            near_dup=False,
            benchmark_df=bench_df,
            decontaminate_ngram=8,
            decontaminate_fuzzy_ngram=2,
            decontaminate_fuzzy_threshold=0.5,
        )
        q.awaitTermination(240)
        corpus = read_path(spark, str(tmp_path / "dc_lh") + "/Tables/corpus")
        kept = {r.doc_id for r in corpus.collect()}
        assert kept == {11, 21}, kept
        # sanity on the construction: the paraphrase shares NO word-8-gram
        # with its original (every benchmark 8-gram spans the marker)
        assert "zzmk" in fuzzy_bench and exact_bench != fuzzy_bench

    def test_trained_lang_model_path(self, spark, tmp_path):
        import glob
        import os
        import shutil

        from ecu_sbl_aace_datalake_spark.operators import classifier
        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            foreach_batch_corpus_ingest,
        )

        schema = "doc_id long, text string, source string"
        rows = [(i, f"the data table row {i} join merge scan", "s0") for i in range(4)]
        src = str(tmp_path / "cl_src")
        os.makedirs(src)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            src + "/b0", mode="overwrite"
        )
        part = glob.glob(f"{src}/b0/part-*.parquet")[0]
        shutil.move(part, f"{src}/batch0.parquet")
        shutil.rmtree(f"{src}/b0")
        stream = spark.readStream.schema(schema).parquet(src)
        lh = Lakehouse("x", str(tmp_path / "cl_lh"))
        q = foreach_batch_corpus_ingest(
            stream, lh, "corpus", "doc_id",
            checkpoint_dir=str(tmp_path / "cl_ckpt"),
            keep_langs=tuple(classifier.LANG_NB_V1["langs"]),  # pass-all gate
            min_quality=0.0, lang_model=classifier.LANG_NB_V1,
            near_dup=False,
        )
        q.awaitTermination(240)
        corpus = read_path(spark, str(tmp_path / "cl_lh") + "/Tables/corpus")
        assert corpus.count() == 4
        assert set(corpus.select("lang_pred").distinct().toPandas()["lang_pred"]) <= set(
            classifier.LANG_NB_V1["langs"]
        )


class TestForeachBatchByteBudget:
    def test_cross_batch_byte_budget(self, spark, tmp_path):
        """Round 8: per-source BYTE budgets across batches — admitted
        octet_length(text) accumulates in the {table}_src_bytes state and
        later batches admit only into the remaining budget, md5-priority
        prefix rule (transform.cap_per_group_bytes semantics)."""
        import glob
        import hashlib
        import os
        import shutil

        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            foreach_batch_corpus_ingest,
        )

        schema = "doc_id long, text string, source string"
        texts = {
            1: "the quick brown fox jumps over the lazy dog",
            2: "the cat and the hat went off to the market",
            3: "the sun and the moon and all of the stars",
            4: "the rain in spain falls mostly on the plain",
            11: "the wind and the waves and also the tide",
            12: "the bird and the bee and also the tree",
        }
        b1 = [(1, texts[1], "s0"), (2, texts[2], "s0"), (3, texts[3], "s0"),
              (4, texts[4], "s1")]
        b2 = [(11, texts[11], "s0"), (12, texts[12], "s1")]
        src = str(tmp_path / "bb_src")
        os.makedirs(src)
        for i, rows in enumerate((b1, b2)):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                src + f"/b{i}", mode="overwrite"
            )
            part = glob.glob(f"{src}/b{i}/part-*.parquet")[0]
            shutil.move(part, f"{src}/batch{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
            os.utime(
                f"{src}/batch{i}.parquet",
                (1_700_000_000 + i, 1_700_000_000 + i),
            )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        budget = 90
        lh = Lakehouse("x", str(tmp_path / "bb_lh"))
        q = foreach_batch_corpus_ingest(
            stream, lh, "corpus", "doc_id",
            checkpoint_dir=str(tmp_path / "bb_ckpt"),
            keep_langs=("en",), min_quality=0.0,
            byte_budget_per_source=budget, near_dup=False,
        )
        q.awaitTermination(240)

        # replicate the cross-batch prefix rule locally (ASCII: len==bytes)
        prib = lambda i: int(hashlib.md5(f"capb{i}".encode()).hexdigest()[:15], 16)
        expect, used = set(), {"s0": 0, "s1": 0}
        for rows in (b1, b2):
            for s in ("s0", "s1"):
                ids = [i for i, _, g in rows if g == s]
                cum = 0
                for i in sorted(ids, key=lambda i: (prib(i), i)):
                    cum += len(texts[i])
                    if cum <= budget - used[s]:
                        expect.add(i)
            for s in ("s0", "s1"):
                used[s] += sum(len(texts[i]) for i in expect
                               if any(r[0] == i and r[2] == s for r in rows))
        corpus = read_path(spark, str(tmp_path / "bb_lh") + "/Tables/corpus")
        kept = {r.doc_id for r in corpus.collect()}
        assert kept == expect, (kept, expect)
        # the __nb accounting column must NOT leak into the corpus table
        assert "__nb" not in corpus.columns
        # bytes state equals the admitted byte totals
        state = read_path(
            spark, str(tmp_path / "bb_lh") + "/Tables/corpus_src_bytes"
        )
        got = {r["source"]: int(r["sum_dec"]) for r in state.collect()}
        want = {s: sum(len(texts[i]) for i in expect
                       if any(r[0] == i and r[2] == s for r in b1 + b2))
                for s in ("s0", "s1")}
        assert got == want, (got, want)


class TestForeachBatchUrlDoor:
    def test_url_door_across_batches(self, spark, tmp_path):
        """Round 8: the URL door — in-batch canonical-URL dedup plus a
        cross-batch anti-join on the corpus's canonical_url column — fires
        BEFORE the content gates, so a re-crawl of the same page (different
        tracking params / trailing slash) is rejected even when its text
        changed; uncanonicalizable URLs fall through to content dedup."""
        import glob
        import os
        import shutil

        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            foreach_batch_corpus_ingest,
        )

        schema = "doc_id long, text string, source string, url string"
        b1 = [
            (1, "the quick brown fox jumps over the lazy dog", "s0",
             "https://a.com/page?utm_source=feed"),
            (2, "the cat and the hat went off to the market", "s0",
             "https://a.com/page"),     # same canonical as 1 -> in-batch dup
            (3, "the sun and the moon and all of the stars", "s0",
             "not a url"),              # uncanonicalizable: falls through
        ]
        b2 = [
            (10, "the rain in spain falls mostly on the plain", "s0",
             "https://WWW.A.com/page/"),  # same canonical -> corpus dup,
                                          # even though the TEXT is new
            (11, "the wind and the waves and also the tide", "s0",
             "https://a.com/other"),
        ]
        src = str(tmp_path / "ud_src")
        os.makedirs(src)
        for i, rows in enumerate((b1, b2)):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                src + f"/b{i}", mode="overwrite"
            )
            part = glob.glob(f"{src}/b{i}/part-*.parquet")[0]
            shutil.move(part, f"{src}/batch{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
            os.utime(
                f"{src}/batch{i}.parquet",
                (1_700_000_000 + i, 1_700_000_000 + i),
            )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        lh = Lakehouse("x", str(tmp_path / "ud_lh"))
        q = foreach_batch_corpus_ingest(
            stream, lh, "corpus", "doc_id",
            checkpoint_dir=str(tmp_path / "ud_ckpt"),
            keep_langs=("en",), min_quality=0.0,
            near_dup=False, url_col="url",
        )
        q.awaitTermination(240)
        corpus = read_path(spark, str(tmp_path / "ud_lh") + "/Tables/corpus")
        kept = {r.doc_id: r.canonical_url for r in corpus.collect()}
        # 1 wins the in-batch canonical group over 2; 3 has NULL canonical
        # but novel text; 10 is killed by the URL door despite novel text;
        # 11 is a new URL
        assert set(kept) == {1, 3, 11}, kept
        assert kept[1] == "https://a.com/page"
        assert kept[3] is None
        assert kept[11] == "https://a.com/other"


class TestForeachBatchUrlDoorIndexed:
    def test_indexed_url_door(self, spark, tmp_path):
        """url_index= probes the bucketed canonical-URL table instead of
        scanning the corpus, and accepted canonicals append bucket-stably
        so later batches see them."""
        import glob
        import os
        import shutil

        from ecu_sbl_aace_datalake_spark.operators import urls
        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            foreach_batch_corpus_ingest,
        )

        schema = "doc_id long, text string, source string, url string"
        b1 = [(1, "the quick brown fox jumps over the lazy dog", "s0",
               "https://a.com/page")]
        b2 = [(10, "the rain in spain falls mostly on the plain", "s0",
               "https://WWW.A.com/page/"),     # known via batch-1 append
              (11, "the wind and the waves and also the tide", "s0",
               "https://a.com/other")]
        src = str(tmp_path / "ui_src")
        os.makedirs(src)
        for i, rows in enumerate((b1, b2)):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                src + f"/b{i}", mode="overwrite"
            )
            part = glob.glob(f"{src}/b{i}/part-*.parquet")[0]
            shutil.move(part, f"{src}/batch{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
            os.utime(f"{src}/batch{i}.parquet",
                     (1_700_000_000 + i, 1_700_000_000 + i))
        empty = spark.createDataFrame([], "url string")
        idx = urls.persist_url_index(empty, "url", index_table="t_ui_idx",
                                     n_buckets=8)
        try:
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 1).parquet(src))
            lh = Lakehouse("x", str(tmp_path / "ui_lh"))
            q = foreach_batch_corpus_ingest(
                stream, lh, "corpus", "doc_id",
                checkpoint_dir=str(tmp_path / "ui_ckpt"),
                keep_langs=("en",), min_quality=0.0,
                near_dup=False, url_col="url", url_index=idx,
            )
            q.awaitTermination(240)
            corpus = read_path(spark, str(tmp_path / "ui_lh") + "/Tables/corpus")
            kept = {r.doc_id for r in corpus.collect()}
            assert kept == {1, 11}, kept
            # the index holds both accepted canonicals
            known = {r.canonical_url for r in spark.table("t_ui_idx").collect()}
            assert known == {"https://a.com/page", "https://a.com/other"}
        finally:
            spark.sql("DROP TABLE IF EXISTS t_ui_idx")


class TestComplianceDoor:
    def test_opt_out_and_license_gates_at_ingest(self, spark, tmp_path):
        """Round 8: the compliance door fires before content gates — an
        opted-out doc and a copyleft doc are rejected at ingest, a
        permissive doc and an unlicensed doc pass (with 'unknown'
        allowed)."""
        import glob
        import os
        import shutil

        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            foreach_batch_corpus_ingest,
        )

        schema = "doc_id long, text string, source string"
        rows = [
            (1, "the quick brown fox jumps over the lazy dog "
                "released under the mit license", "s0"),
            (2, "the cat and the hat went off to the market "
                "gnu general public license version 3 applies", "s0"),
            (3, "the sun and the moon and all of the stars "
                "with a noai directive inside", "s0"),
            (4, "the rain in spain falls mostly on the plain", "s0"),
        ]
        src = str(tmp_path / "cd_src")
        os.makedirs(src)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            src + "/b0", mode="overwrite"
        )
        part = glob.glob(f"{src}/b0/part-*.parquet")[0]
        shutil.move(part, f"{src}/batch0.parquet")
        shutil.rmtree(f"{src}/b0")
        stream = spark.readStream.schema(schema).parquet(src)
        lh = Lakehouse("x", str(tmp_path / "cd_lh"))
        q = foreach_batch_corpus_ingest(
            stream, lh, "corpus", "doc_id",
            checkpoint_dir=str(tmp_path / "cd_ckpt"),
            keep_langs=("en",), min_quality=0.0, near_dup=False,
            drop_opted_out=True,
            license_families=("permissive", "public-domain", "unknown"),
        )
        q.awaitTermination(240)
        corpus = read_path(spark, str(tmp_path / "cd_lh") + "/Tables/corpus")
        kept = {r.doc_id for r in corpus.collect()}
        # 2 (copyleft) and 3 (opted out) rejected at the door
        assert kept == {1, 4}, kept


class TestIngestDoorLog:
    def test_log_doors_accounting(self, spark, tmp_path):
        """Round 9: log_doors=True appends per-batch per-door row counts
        to {table}_ingest_log — arrived/gates/dedup/admitted must be
        monotone non-increasing within a batch and the admitted count
        must equal the corpus delta."""
        import glob
        import os
        import shutil

        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            foreach_batch_corpus_ingest,
        )

        schema = "doc_id long, text string, source string"
        b1 = [
            (1, "the quick brown fox jumps over the lazy dog", "s0"),
            (2, "the quick brown fox jumps over the lazy dog", "s0"),  # dup
            (3, "uno dos tres cuatro cinco seis siete ocho", "s0"),  # lang
            (4, "the rain in spain falls mostly on the plain noai", "s0"),
        ]
        b2 = [
            (10, "the quick brown fox jumps over the lazy dog", "s0"),  # corpus dup
            (11, "the wind and the waves and also the tide", "s0"),
        ]
        src = str(tmp_path / "dl_src")
        os.makedirs(src)
        for i, rows in enumerate((b1, b2)):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                src + f"/b{i}", mode="overwrite"
            )
            part = glob.glob(f"{src}/b{i}/part-*.parquet")[0]
            shutil.move(part, f"{src}/batch{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
            os.utime(
                f"{src}/batch{i}.parquet",
                (1_700_000_000 + i, 1_700_000_000 + i),
            )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        lh = Lakehouse("x", str(tmp_path / "dl_lh"))
        q = foreach_batch_corpus_ingest(
            stream, lh, "corpus", "doc_id",
            checkpoint_dir=str(tmp_path / "dl_ckpt"),
            keep_langs=("en",), min_quality=0.0,
            near_dup=False, drop_opted_out=True, log_doors=True,
        )
        q.awaitTermination(240)
        log = read_path(
            spark, str(tmp_path / "dl_lh") + "/Tables/corpus_ingest_log"
        )
        rows = {(r.batch_id, r.stage): r.n_rows for r in log.collect()}
        # batch 0: 4 arrive; opt-out drops doc 4; lang gate drops doc 3;
        # in-batch exact drops doc 2 -> 1 admitted (no corpus doors yet)
        assert rows[(0, "arrived")] == 4
        assert rows[(0, "compliance_door")] == 3
        assert rows[(0, "lang_quality_gate")] == 2
        assert rows[(0, "in_batch_exact")] == 1
        assert rows[(0, "admitted")] == 1
        # batch 1: 2 arrive; corpus door drops the cross-batch dup
        assert rows[(1, "arrived")] == 2
        assert rows[(1, "corpus_doors")] == 1
        assert rows[(1, "admitted")] == 1
        # monotone non-increasing along each batch's door chain
        order = ["arrived", "compliance_door", "lang_quality_gate",
                 "in_batch_exact", "corpus_doors", "admitted"]
        for b in (0, 1):
            seq = [rows[(b, s)] for s in order if (b, s) in rows]
            assert seq == sorted(seq, reverse=True), (b, seq)

        # round 10: the rollup READER consumes the real writer's table
        from ecu_sbl_aace_datalake_spark.operators.pipeline import (
            ingest_log_report,
        )

        rep = {r.stage: r for r in ingest_log_report(log).collect()}
        # compliance door saw both batches (4 + 2), rejected the noai doc
        assert rep["compliance_door"].rows_in == 6
        assert rep["compliance_door"].n_rejected == 1
        # lang gate: batch-0 in=3 rejects 1; batch-1 in=2 rejects 0
        assert rep["lang_quality_gate"].rows_in == 5
        assert rep["lang_quality_gate"].n_rejected == 1
        assert rep["lang_quality_gate"].reject_rate == 0.2
        # corpus door (batch 1 only): 1 of 1 rejected after in-batch exact
        assert rep["corpus_doors"].n_batches == 1
        assert rep["corpus_doors"].n_rejected == 1
        # 'arrived' and 'admitted' reject nothing by definition
        assert rep["arrived"].n_rejected == 0
        assert rep["admitted"].n_rejected == 0
        assert rep["arrived"].rows_in == 6 and rep["admitted"].rows_out == 2

        # round 11: the TIME-SERIES reader over the same real table
        from ecu_sbl_aace_datalake_spark.operators.pipeline import (
            ingest_log_timeseries,
        )

        ts = {(r.batch_id, r.stage): r
              for r in ingest_log_timeseries(log).collect()}
        lg0 = ts[(0, "lang_quality_gate")]
        lg1 = ts[(1, "lang_quality_gate")]
        assert lg0.rows_in == 3 and lg0.rows_out == 2
        assert lg0.reject_rate == pytest.approx(0.333333)
        assert lg0.delta_reject is None  # first batch of the door
        assert lg1.reject_rate == 0.0
        # trailing ratio-of-sums ma at batch 1: (1+0)/(3+2) = 0.2
        assert lg1.ma_reject == pytest.approx(0.2)
        assert lg1.delta_reject == pytest.approx(-0.333333)
        assert lg1.cum_rows_out == 4  # 2 + 2 admitted through the gate

    def test_log_off_writes_no_table(self, spark, tmp_path):
        import glob
        import os
        import shutil

        from ecu_sbl_aace_datalake_spark.sources.io import path_exists
        from ecu_sbl_aace_datalake_spark.streaming.sinks import (
            foreach_batch_corpus_ingest,
        )

        schema = "doc_id long, text string, source string"
        src = str(tmp_path / "nl_src")
        os.makedirs(src)
        spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog", "s0")],
            schema,
        ).coalesce(1).write.parquet(src + "/b0", mode="overwrite")
        part = glob.glob(f"{src}/b0/part-*.parquet")[0]
        shutil.move(part, f"{src}/batch0.parquet")
        shutil.rmtree(f"{src}/b0")
        stream = spark.readStream.schema(schema).parquet(src)
        lh = Lakehouse("x", str(tmp_path / "nl_lh"))
        q = foreach_batch_corpus_ingest(
            stream, lh, "corpus", "doc_id",
            checkpoint_dir=str(tmp_path / "nl_ckpt"),
            keep_langs=("en",), min_quality=0.0, near_dup=False,
        )
        q.awaitTermination(240)
        assert not path_exists(
            spark, str(tmp_path / "nl_lh") + "/Tables/corpus_ingest_log"
        )
