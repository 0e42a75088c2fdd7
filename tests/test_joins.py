"""As-of and range join semantics on hand-built cases."""

from __future__ import annotations

import pyspark.sql.functions as F

from ecu_sbl_aace_datalake_spark.operators.joins import (
    asof_join,
    range_join_points_to_intervals,
)


def _ts_df(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c, t in df.dtypes:
        if c.endswith("ts") or c.endswith("start") or c.endswith("end"):
            df = df.withColumn(c, F.to_timestamp(c))
    return df


class TestAsofJoin:
    def test_backward_inclusive(self, spark):
        left = _ts_df(
            spark,
            [(1, "k", "2024-01-01 10:00:00"), (2, "k", "2024-01-01 11:00:00"),
             (3, "k", "2024-01-01 09:00:00")],
            "id long, k string, ts string",
        )
        right = _ts_df(
            spark,
            [("k", "2024-01-01 09:30:00", 1.0), ("k", "2024-01-01 10:00:00", 2.0),
             ("k", "2024-01-01 10:30:00", 3.0)],
            "k string, ts string, v double",
        )
        out = {r.id: r.v_asof for r in asof_join(left, right, on="k").collect()}
        assert out[3] is None          # nothing at or before 09:00
        assert out[1] == 2.0           # inclusive: the 10:00 right row matches
        assert out[2] == 3.0           # latest prior

    def test_key_isolation(self, spark):
        left = _ts_df(spark, [(1, "a", "2024-01-01 10:00:00")], "id long, k string, ts string")
        right = _ts_df(spark, [("b", "2024-01-01 09:00:00", 9.0)], "k string, ts string, v double")
        out = asof_join(left, right, on="k").collect()
        assert out[0].v_asof is None   # other key's rows never match

    def test_deterministic_tie_break(self, spark):
        left = _ts_df(
            spark, [(1, "k", "2024-01-01 10:00:00")], "id long, k string, ts string"
        )
        # three right rows at the SAME matching timestamp — winner must be
        # the greatest tie-break value, at any partitioning
        right = _ts_df(
            spark,
            [("k", "2024-01-01 09:00:00", 10.0, 7), ("k", "2024-01-01 09:00:00", 30.0, 9),
             ("k", "2024-01-01 09:00:00", 20.0, 8)],
            "k string, ts string, v double, seq long",
        )
        for r in (right, right.repartition(8)):
            out = asof_join(left, r, on="k", right_tie_break="seq").collect()
            assert out[0].v_asof == 30.0 and out[0].seq_asof == 9

    def test_winning_row_carried_atomically(self, spark):
        # the matched right row must come through AS A ROW: when the winner
        # has NULL in one column, that NULL must survive — a per-column
        # carry would backfill it from an older row (mixed-row result)
        left = _ts_df(
            spark, [(1, "k", "2024-01-01 10:00:00")], "id long, k string, ts string"
        )
        right = _ts_df(
            spark,
            [("k", "2024-01-01 09:00:00", 10.0, "old", 1),
             ("k", "2024-01-01 09:30:00", None, "new", 2)],
            "k string, ts string, v double, tag string, seq long",
        )
        out = asof_join(left, right, on="k").collect()[0]
        assert out.tag_asof == "new" and out.v_asof is None
        # same atomicity under an equal-ts tie-break: winner seq=2 has NULL v
        tied = _ts_df(
            spark,
            [("k", "2024-01-01 09:00:00", 10.0, "a", 1),
             ("k", "2024-01-01 09:00:00", None, "b", 2)],
            "k string, ts string, v double, tag string, seq long",
        )
        out = asof_join(left, tied, on="k", right_tie_break="seq").collect()[0]
        assert out.tag_asof == "b" and out.v_asof is None and out.seq_asof == 2

    def test_tolerance(self, spark):
        left = _ts_df(spark, [(1, "k", "2024-01-01 10:00:00")], "id long, k string, ts string")
        right = _ts_df(spark, [("k", "2024-01-01 08:00:00", 5.0)], "k string, ts string, v double")
        loose = asof_join(left, right, on="k").collect()[0].v_asof
        tight = asof_join(left, right, on="k", tolerance="1 hour").collect()[0].v_asof
        assert loose == 5.0 and tight is None

    def test_matches_duckdb_asof(self, spark, sf_dir):
        """Cross-check the operator against DuckDB's native ASOF JOIN."""
        import duckdb

        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        evdf = load_table(spark, sf_dir, "events").withColumn(
            "ts", F.date_trunc("second", "ts")
        )
        left = evdf.where(F.col("event_type") != "error").select("event_id", "user_id", "ts")
        right = evdf.where(F.col("event_type") == "error").select(
            "user_id", "ts", F.col("value").alias("ev")
        )
        ours = {
            r.event_id: r.ev_asof
            for r in asof_join(left, right, on="user_id", right_cols=["ev"]).collect()
        }
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
        theirs = dict(
            con.execute(
                """
                WITH e AS (SELECT event_id, user_id, event_type, value,
                                  date_trunc('second', ts) AS ts FROM events),
                l AS (SELECT event_id, user_id, ts FROM e WHERE event_type <> 'error'),
                r AS (SELECT user_id, ts, value AS ev FROM e WHERE event_type = 'error')
                SELECT l.event_id, r.ev
                FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
                """
            ).fetchall()
        )
        assert ours == theirs


class TestRangeJoin:
    def test_points_in_intervals(self, spark):
        points = _ts_df(
            spark,
            [(1, "u", "2024-01-01 10:15:00"), (2, "u", "2024-01-01 12:00:00"),
             (3, "u", "2024-01-01 11:00:00")],
            "id long, k string, ts string",
        )
        intervals = _ts_df(
            spark,
            [("u", "2024-01-01 10:00:00", "2024-01-01 11:00:00", "A")],
            "k string, i_start string, i_end string, label string",
        )
        out = range_join_points_to_intervals(
            points, intervals, on="k", point_ts="ts",
            interval_start="i_start", interval_end="i_end", bucket="30 minutes",
        ).collect()
        ids = {r.id for r in out}
        assert ids == {1}  # end is exclusive: 11:00 point excluded; 12:00 out

    def test_interval_spanning_many_buckets(self, spark):
        points = _ts_df(spark, [(1, "u", "2024-01-03 00:00:00")], "id long, k string, ts string")
        intervals = _ts_df(
            spark,
            [("u", "2024-01-01 00:00:00", "2024-01-05 00:00:00", "wide")],
            "k string, i_start string, i_end string, label string",
        )
        out = range_join_points_to_intervals(
            points, intervals, on="k", point_ts="ts",
            interval_start="i_start", interval_end="i_end", bucket="1 hour",
        ).collect()
        assert len(out) == 1 and out[0].label == "wide"


class TestIntervalOverlapJoin:
    def test_overlap_semantics_and_claim_once(self, spark):
        left = _ts_df(
            spark,
            [(1, "k", "2024-01-01 00:00:00", "2024-01-01 05:00:00"),   # long: spans 5 buckets
             (2, "k", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
             (3, "k", "2024-01-01 20:00:00", "2024-01-01 21:00:00")],
            "lid long, k string, l_start string, l_end string",
        )
        right = _ts_df(
            spark,
            [(10, "k", "2024-01-01 01:00:00", "2024-01-01 06:00:00"),  # overlaps 1 in 4 shared buckets
             (11, "k", "2024-01-01 11:00:00", "2024-01-01 12:00:00"),  # touches 2 at boundary: NO overlap (half-open)
             (12, "k", "2024-01-01 10:30:00", "2024-01-01 10:45:00"),  # inside 2
             (13, "j", "2024-01-01 10:30:00", "2024-01-01 10:45:00")], # wrong key
            "rid long, k string, r_start string, r_end string",
        )
        from ecu_sbl_aace_datalake_spark.operators.joins import (
            range_join_intervals_overlap,
        )

        out = range_join_intervals_overlap(
            left, right, "k", "l_start", "l_end", "r_start", "r_end"
        ).select("lid", "rid").collect()
        pairs = sorted((r.lid, r.rid) for r in out)
        # (1,10) exactly ONCE despite 4 shared buckets; boundary touch excluded
        assert pairs == [(1, 10), (2, 12)]

    def test_matches_duckdb_inequality_join(self, spark, sf_dir):
        import duckdb

        from ecu_sbl_aace_datalake_spark.operators.joins import (
            range_join_intervals_overlap,
        )
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
        left = ev.where(F.col("event_id") % 2 == 0).select(
            F.col("event_id").alias("lid"), "user_id",
            F.col("ts").alias("l_start"),
            (F.col("ts") + F.expr("INTERVAL 30 minutes")).alias("l_end"),
        )
        right = ev.where(F.col("event_id") % 2 == 1).select(
            F.col("event_id").alias("rid"), "user_id",
            F.col("ts").alias("r_start"),
            (F.col("ts") + F.expr("INTERVAL 45 minutes")).alias("r_end"),
        )
        got = sorted(
            (r.lid, r.rid)
            for r in range_join_intervals_overlap(
                left, right, "user_id", "l_start", "l_end", "r_start", "r_end",
                bucket="15 minutes",
            ).select("lid", "rid").collect()
        )
        sf = sf_dir
        con = duckdb.connect()
        exp = con.execute(f"""
            WITH e AS (SELECT event_id, user_id, ts FROM '{sf}/events.parquet'
                       WHERE user_id < 20),
            l AS (SELECT event_id lid, user_id, ts ls, ts + INTERVAL 30 MINUTE le
                  FROM e WHERE event_id % 2 = 0),
            r AS (SELECT event_id rid, user_id, ts rs, ts + INTERVAL 45 MINUTE re
                  FROM e WHERE event_id % 2 = 1)
            SELECT lid, rid FROM l JOIN r USING (user_id)
            WHERE ls < re AND rs < le ORDER BY lid, rid
        """).fetchall()
        assert got == [tuple(x) for x in exp]
