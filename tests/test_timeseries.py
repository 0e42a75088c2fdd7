"""Unit tests for operators/timeseries: resample, gap_fill, islands,
latest_by_key — hand-built frames with exactly known expectations."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ecu_sbl_aace_datalake_spark.operators import timeseries as ts


def _t(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


class TestResample:
    def test_hourly_buckets(self, spark):
        df = spark.createDataFrame(
            [
                ("a", _t(0, 10), 1.0),
                ("a", _t(0, 50), 3.0),
                ("a", _t(2, 0), 10.0),
                ("b", _t(0, 0), 5.0),
            ],
            "k string, ts timestamp, value double",
        )
        out = {
            (r["k"], r["bucket"].hour): (r["n_events"], r["avg_value"])
            for r in ts.resample(df, keys=["k"], step_seconds=3600).collect()
        }
        assert out == {("a", 0): (2, 2.0), ("a", 2): (1, 10.0), ("b", 0): (1, 5.0)}

    def test_bucket_is_epoch_aligned(self, spark):
        df = spark.createDataFrame(
            [("a", _t(0, 37), 1.0)], "k string, ts timestamp, value double"
        )
        [row] = ts.resample(df, keys=["k"], step_seconds=900).collect()
        assert row["bucket"].minute == 30  # 00:37 floors to 00:30 on a 15-min grid


class TestGapFill:
    def _resampled(self, spark):
        # key a observed at hours 0, 1, 4 (gap at 2, 3); key b dense
        return spark.createDataFrame(
            [
                ("a", _t(0), 1.0),
                ("a", _t(1), 2.0),
                ("a", _t(4), 8.0),
                ("b", _t(0), 5.0),
                ("b", _t(1), 6.0),
            ],
            "k string, bucket timestamp, avg_value double",
        )

    def test_locf(self, spark):
        out = ts.gap_fill(self._resampled(spark), ["k"], step_seconds=3600)
        rows = {
            (r["k"], r["bucket"].hour): (r["avg_value"], r["is_filled"])
            for r in out.collect()
        }
        assert rows[("a", 2)] == (2.0, True)
        assert rows[("a", 3)] == (2.0, True)
        assert rows[("a", 4)] == (8.0, False)
        assert len(rows) == 7  # a: hours 0-4, b: hours 0-1

    def test_linear(self, spark):
        out = ts.gap_fill(
            self._resampled(spark), ["k"], step_seconds=3600, method="linear"
        )
        rows = {
            (r["k"], r["bucket"].hour): r["avg_value"] for r in out.collect()
        }
        # 2.0 at h1 -> 8.0 at h4: interior points at 4.0 and 6.0
        assert rows[("a", 2)] == 4.0
        assert rows[("a", 3)] == 6.0
        assert rows[("a", 0)] == 1.0

    def test_none_just_densifies(self, spark):
        out = ts.gap_fill(
            self._resampled(spark), ["k"], step_seconds=3600, method="none"
        )
        assert out.where(F.col("avg_value").isNull()).count() == 2

    def test_single_point_key_no_fill_needed(self, spark):
        df = spark.createDataFrame(
            [("c", _t(5), 9.0)], "k string, bucket timestamp, avg_value double"
        )
        out = ts.gap_fill(df, ["k"], step_seconds=3600, method="linear").collect()
        assert len(out) == 1 and out[0]["avg_value"] == 9.0


class TestIslands:
    def test_runs_split_on_gap(self, spark):
        df = spark.createDataFrame(
            [
                ("u", _t(0, 0), 1.0),
                ("u", _t(0, 30), 2.0),
                ("u", _t(3, 0), 4.0),  # > 1h gap: new island
                ("v", _t(1, 0), 7.0),
            ],
            "k string, ts timestamp, value double",
        )
        out = ts.islands(df, ["k"], max_gap_seconds=3600)
        rows = {
            (r["k"], r["island_id"]): (r["n_events"], r["sum_value"])
            for r in out.collect()
        }
        assert rows == {("u", 1): (2, 3.0), ("u", 2): (1, 4.0), ("v", 1): (1, 7.0)}

    def test_exact_gap_boundary_is_same_island(self, spark):
        df = spark.createDataFrame(
            [("u", _t(0), 1.0), ("u", _t(1), 1.0)],
            "k string, ts timestamp, value double",
        )
        assert ts.islands(df, ["k"], max_gap_seconds=3600).count() == 1

    def test_simultaneous_events_share_island(self, spark):
        df = spark.createDataFrame(
            [("u", _t(0), 1.0), ("u", _t(0), 2.0)],
            "k string, ts timestamp, value double",
        )
        [row] = ts.islands(df, ["k"], max_gap_seconds=60).collect()
        assert row["n_events"] == 2 and row["sum_value"] == 3.0


class TestLatestByKey:
    def test_latest_with_tiebreak(self, spark):
        df = spark.createDataFrame(
            [
                ("u", _t(1), 10, "old"),
                ("u", _t(2), 11, "mid"),
                ("u", _t(2), 12, "new"),  # ts tie -> higher id wins
                ("v", _t(0), 1, "only"),
            ],
            "k string, ts timestamp, id int, payload string",
        )
        out = {
            r["k"]: (r["id"], r["payload"])
            for r in ts.latest_by_key(df, ["k"], tiebreak_col="id").collect()
        }
        assert out == {"u": (12, "new"), "v": (1, "only")}

    def test_row_integrity_under_ties(self, spark):
        # the winning row's payload columns must all come from the same row
        df = spark.createDataFrame(
            [("u", _t(2), 1, None), ("u", _t(2), 2, "keep")],
            "k string, ts timestamp, id int, payload string",
        )
        [row] = ts.latest_by_key(df, ["k"], tiebreak_col="id").collect()
        assert (row["id"], row["payload"]) == (2, "keep")

    def test_is_partial_aggregate_not_window(self, spark):
        df = spark.createDataFrame(
            [("u", _t(1), 1, "x")], "k string, ts timestamp, id int, payload string"
        )
        plan = (
            ts.latest_by_key(df, ["k"], tiebreak_col="id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan
        assert "partial_max_by" in plan or "HashAggregate" in plan


class TestTrailingDistinctCount:
    def test_window_semantics(self, spark):
        # user u active on day 1 and 3; user v on day 3 only
        df = spark.createDataFrame(
            [
                ("u", dt.datetime(2024, 1, 1, 5)),
                ("u", dt.datetime(2024, 1, 1, 9)),  # same day, deduped
                ("u", dt.datetime(2024, 1, 3, 1)),
                ("v", dt.datetime(2024, 1, 3, 2)),
            ],
            "user_id string, ts timestamp",
        )
        out = {
            r["report_day"].day: r["active_entities"]
            for r in ts.trailing_distinct_count(df, window_days=2).collect()
        }
        # day 1: {u}; day 3: {u(day3), v} — u's day-1 activity expired
        assert out == {1: 1, 3: 2}
        # day 2 is absent: no observed events that day

    def test_window_one_equals_daily_distinct(self, spark):
        df = spark.createDataFrame(
            [
                ("a", dt.datetime(2024, 1, 1)),
                ("b", dt.datetime(2024, 1, 1)),
                ("a", dt.datetime(2024, 1, 2)),
            ],
            "user_id string, ts timestamp",
        )
        out = {
            r["report_day"].day: r["active_entities"]
            for r in ts.trailing_distinct_count(df, window_days=1).collect()
        }
        assert out == {1: 2, 2: 1}


class TestEwma:
    def test_constant_series_is_constant(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.timeseries import ewma

        rows = [(1, i, 5.0) for i in range(10)]
        df = spark.createDataFrame(rows, "user_id long, ts long, value double")
        out = ewma(df, "ts", "value", ["user_id"], alpha=0.3, window_n=5)
        assert all(r.ewma == 5.0 for r in out.collect())

    def test_hand_computed_three_points(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.timeseries import ewma

        df = spark.createDataFrame(
            [(1, 1, 1.0), (1, 2, 2.0), (1, 3, 4.0)],
            "user_id long, ts long, value double",
        )
        out = {r.ts: r.ewma for r in ewma(
            df, "ts", "value", ["user_id"], alpha=0.5, window_n=10
        ).collect()}
        # weights 0.25, 0.5, 1 → (0.25 + 1 + 4) / 1.75 = 3.0
        assert out[1] == 1.0
        assert out[2] == round((0.5 * 1 + 1 * 2) / 1.5 + 1e-9, 4)
        assert out[3] == 3.0

    def test_nulls_are_absent_observations(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.timeseries import ewma

        df = spark.createDataFrame(
            [(1, 1, None), (1, 2, 10.0), (1, 3, None), (1, 4, 20.0)],
            "user_id long, ts long, value double",
        )
        out = {r.ts: r.ewma for r in ewma(
            df, "ts", "value", ["user_id"], alpha=0.5, window_n=10
        ).collect()}
        assert out[1] is None          # all-null frame → null, no crash
        assert out[2] == 10.0
        assert out[3] == 10.0          # null adds nothing
        assert out[4] == round((0.5 * 10 + 20) / 1.5 + 1e-9, 4)

    def test_step_response_moves_toward_new_level(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.timeseries import ewma

        rows = [(1, i, 0.0) for i in range(10)] + [(1, i, 10.0) for i in range(10, 20)]
        df = spark.createDataFrame(rows, "user_id long, ts long, value double")
        out = {r.ts: r.ewma for r in ewma(
            df, "ts", "value", ["user_id"], alpha=0.3, window_n=10
        ).collect()}
        assert out[9] == 0.0
        assert 0 < out[10] < out[15] < out[19] <= 10.0
        assert out[19] > 9.0  # window full of the new level


class TestMergeIntervals:
    def test_hand_intervals(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.timeseries import merge_intervals

        rows = [
            ("u", 0, 10), ("u", 5, 12),   # overlap -> [0,12]
            ("u", 12, 15),                # touching (start == prev end) -> merges
            ("u", 20, 25),                # separate
            ("v", 0, 1),
            ("u", None, 5), ("u", 3, None),  # null bounds dropped
        ]
        df = spark.createDataFrame(rows, "k string, s long, e long")
        got = sorted(
            (r.k, r.s, r.e, r.n_merged)
            for r in merge_intervals(df, "k", "s", "e").collect()
        )
        assert got == [("u", 0, 15, 3), ("u", 20, 25, 1), ("v", 0, 1, 1)]

    def test_min_gap_bridges_small_holes(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.timeseries import merge_intervals

        df = spark.createDataFrame(
            [("u", 0, 10), ("u", 13, 20), ("u", 40, 50)], "k string, s long, e long"
        )
        got = sorted(
            (r.s, r.e) for r in merge_intervals(df, "k", "s", "e", min_gap=5).collect()
        )
        assert got == [(0, 20), (40, 50)]

    def test_contained_interval(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.timeseries import merge_intervals

        # second interval entirely inside the first: running-max of ends
        # must not regress to the shorter end
        df = spark.createDataFrame(
            [("u", 0, 100), ("u", 10, 20), ("u", 90, 150)], "k string, s long, e long"
        )
        got = [(r.s, r.e, r.n_merged) for r in merge_intervals(df, "k", "s", "e").collect()]
        assert got == [(0, 150, 3)]


class TestPositionalAttribution:
    def _events(self, spark):
        from datetime import datetime as dt

        rows = [
            # user 1: click, view, click -> purchase (n=3: 0.4/0.2/0.4)
            (1, 1, "click", dt(2024, 1, 1)),
            (2, 1, "view", dt(2024, 1, 2)),
            (3, 1, "click", dt(2024, 1, 3)),
            (4, 1, "purchase", dt(2024, 1, 4)),
            # user 2: single view -> purchase (n=1: 1.0)
            (5, 2, "view", dt(2024, 1, 1)),
            (6, 2, "purchase", dt(2024, 1, 2)),
            # user 3: touch outside the 7-day lookback -> unattributed
            (7, 3, "click", dt(2024, 1, 1)),
            (8, 3, "purchase", dt(2024, 1, 20)),
        ]
        return spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )

    def test_u_shaped(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import timeseries

        got = {r.touch_type: r for r in timeseries.positional_attribution(
            self._events(spark)
        ).collect()}
        # clicks: first (0.4) + last (0.4) of user 1 = 0.8
        assert got["click"].total_credit == 0.8
        assert got["click"].conversions_touched == 1
        # views: middle of user1 (0.2) + solo of user2 (1.0)
        assert got["view"].total_credit == 1.2
        assert got["view"].conversions_touched == 2

    def test_linear(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import timeseries

        got = {r.touch_type: r.total_credit
               for r in timeseries.positional_attribution(
                   self._events(spark), model="linear"
               ).collect()}
        assert abs(got["click"] - 2 / 3) < 1e-6
        assert abs(got["view"] - (1 / 3 + 1.0)) < 1e-6

    def test_two_touch_split(self, spark):
        from datetime import datetime as dt

        from ecu_sbl_aace_datalake_spark.operators import timeseries

        df = spark.createDataFrame(
            [(1, 1, "click", dt(2024, 1, 1)), (2, 1, "view", dt(2024, 1, 2)),
             (3, 1, "purchase", dt(2024, 1, 3))],
            "event_id long, user_id long, event_type string, ts timestamp",
        )
        got = {r.touch_type: r.total_credit
               for r in timeseries.positional_attribution(df).collect()}
        assert got == {"click": 0.5, "view": 0.5}
