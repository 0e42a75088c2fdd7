"""Unit tests for operators/ml.py (regression, AUC, confusion,
correlation) and the round-5 timeseries/dedup additions (ACF, CUSUM,
winnowing fingerprints)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ecu_sbl_aace_datalake_spark.operators import dedup, ml, timeseries


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestLinregSimple:
    def test_exact_line(self, spark):
        df = spark.createDataFrame(
            [(float(x), 2.0 * x + 1.0) for x in range(10)], "x double, y double"
        )
        out = ml.linreg_simple(df, "x", "y").collect()[0]
        assert out["n"] == 10
        assert float(out["slope"]) == 2.0
        assert float(out["intercept"]) == 1.0
        assert float(out["r2"]) == 1.0

    def test_grouped_and_degenerate(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, 5.0), ("a", 2.0, 7.0), ("b", 3.0, 1.0), ("b", 3.0, 9.0)],
            "g string, x double, y double",
        )
        out = {r["g"]: r for r in ml.linreg_simple(df, "x", "y", by=["g"]).collect()}
        assert float(out["a"]["slope"]) == 2.0
        # constant x: no fit, nulls not infinities
        assert out["b"]["slope"] is None
        assert out["b"]["intercept"] is None

    def test_nulls_dropped(self, spark):
        df = spark.createDataFrame(
            [(1.0, 2.0), (None, 9.0), (2.0, None), (2.0, 4.0)],
            "x double, y double",
        )
        assert ml.linreg_simple(df, "x", "y").collect()[0]["n"] == 2


class TestLinregFit:
    def test_matches_numpy_lstsq(self, spark):
        import numpy as np

        data = [
            (1.0, 2.0, 7.1), (2.0, 1.0, 9.3), (3.0, 4.0, 12.0),
            (4.0, 2.0, 15.2), (5.0, 5.0, 18.9), (6.0, 3.0, 21.1),
        ]
        df = spark.createDataFrame(data, "x1 double, x2 double, y double")
        w = ml.linreg_fit(df, ["x1", "x2"], "y")
        X = np.array([[1.0, r[0], r[1]] for r in data])
        y = np.array([r[2] for r in data])
        ref, *_ = np.linalg.lstsq(X, y, rcond=None)
        assert max(abs(a - b) for a, b in zip(w, ref)) < 1e-9

    def test_frozen_weights_provenance(self, spark):
        """WEIGHTS_PRICE_V1 must be the exact refit at sf0.001 — the
        deterministic-training property the oracle literals rely on."""
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        w = ml.linreg_fit(li, ["l_quantity", "l_discount"], "l_extendedprice")
        assert w == ml.WEIGHTS_PRICE_V1

    def test_score_weight_guard(self, spark):
        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError):
            ml.linreg_score(df, ["x"], [1.0])  # needs intercept + 1

    def test_score_projection(self, spark):
        df = spark.createDataFrame([(2.0, 3.0)], "a double, b double")
        out = ml.linreg_score(df, ["a", "b"], [1.0, 10.0, 100.0]).collect()[0]
        assert out["prediction"] == 1.0 + 20.0 + 300.0


class TestAuc:
    def test_perfect_and_inverted(self, spark):
        df = spark.createDataFrame(
            [(float(i), 1 if i >= 5 else 0) for i in range(10)],
            "s double, lab int",
        )
        assert float(ml.auc_score(df, "s", "lab").collect()[0]["auc"]) == 1.0
        inv = df.withColumn("lab", 1 - F.col("lab"))
        assert float(ml.auc_score(inv, "s", "lab").collect()[0]["auc"]) == 0.0

    def test_ties_midrank(self, spark):
        # scores: pos at 1.0, neg at 1.0 -> AUC must be exactly 0.5
        df = spark.createDataFrame(
            [(1.0, 1), (1.0, 0), (1.0, 1), (1.0, 0)], "s double, lab int"
        )
        assert float(ml.auc_score(df, "s", "lab").collect()[0]["auc"]) == 0.5

    def test_single_class_null(self, spark):
        df = spark.createDataFrame([(1.0, 1), (2.0, 1)], "s double, lab int")
        row = ml.auc_score(df, "s", "lab").collect()[0]
        assert row["auc"] is None and row["n_neg"] == 0

    def test_hand_value(self, spark):
        # pos scores {3,1}, neg scores {2,0}: pairs won 3>2,3>0,1>0 = 3/4
        df = spark.createDataFrame(
            [(3.0, 1), (1.0, 1), (2.0, 0), (0.0, 0)], "s double, lab int"
        )
        assert float(ml.auc_score(df, "s", "lab").collect()[0]["auc"]) == 0.75

    def test_grouped(self, spark):
        df = spark.createDataFrame(
            [("g1", 3.0, 1), ("g1", 2.0, 0), ("g2", 1.0, 1), ("g2", 2.0, 0)],
            "g string, s double, lab int",
        )
        out = {r["g"]: float(r["auc"]) for r in ml.auc_score(df, "s", "lab", by=["g"]).collect()}
        assert out == {"g1": 1.0, "g2": 0.0}


class TestConfusion:
    def test_hand_counts(self, spark):
        df = spark.createDataFrame(
            [(0.9, 1), (0.8, 0), (0.4, 1), (0.1, 0), (0.6, 1)],
            "s double, lab int",
        )
        r = ml.confusion_metrics(df, "s", "lab", threshold=0.5).collect()[0]
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 1, 1)
        assert float(r["precision"]) == round(2 / 3, 6)
        assert float(r["recall"]) == round(2 / 3, 6)
        assert float(r["f1"]) == round(2 / 3, 6)

    def test_empty_side_nulls(self, spark):
        df = spark.createDataFrame([(0.1, 0), (0.2, 0)], "s double, lab int")
        r = ml.confusion_metrics(df, "s", "lab", threshold=0.5).collect()[0]
        assert r["precision"] is None and r["recall"] is None


class TestCorrelationMatrix:
    def test_known_correlations(self, spark):
        df = spark.createDataFrame(
            [(float(i), 2.0 * i, -3.0 * i, 5.0) for i in range(1, 9)],
            "a double, b double, c double, d double",
        )
        out = {(r["col_x"], r["col_y"]): r["corr"] for r in
               ml.correlation_matrix(df, ["a", "b", "c", "d"]).collect()}
        assert float(out[("a", "b")]) == 1.0
        assert float(out[("a", "c")]) == -1.0
        assert out[("a", "d")] is None  # constant column -> null
        assert len(out) == 6


class TestAutocorrelation:
    def test_alternating_series(self, spark):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        rows_in = [
            ("k", base + datetime.timedelta(minutes=i), i,
             1.0 if i % 2 == 0 else -1.0)
            for i in range(12)
        ]
        df = spark.createDataFrame(
            rows_in, "k string, ts timestamp, eid long, v double"
        )
        out = {r["lag"]: float(r["acf"]) for r in timeseries.autocorrelation(
            df, ["k"], "ts", "v", max_lag=2, tie_col="eid").collect()}
        assert out[1] == -1.0
        assert out[2] == 1.0

    def test_constant_series_null(self, spark):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("k", base + datetime.timedelta(minutes=i), i, 7.0) for i in range(5)],
            "k string, ts timestamp, eid long, v double",
        )
        out = timeseries.autocorrelation(df, ["k"], "ts", "v", max_lag=1, tie_col="eid").collect()
        assert out[0]["acf"] is None and out[0]["n_pairs"] == 4


class TestCusum:
    def test_matches_recursion(self, spark):
        import datetime

        vals = [0.0, 0.5, 3.0, 2.5, -1.0, 4.0, 0.2, -3.0]
        target, k = 1.0, 0.25
        sp = sn = 0.0
        exp_pos, exp_neg = [], []
        for v in vals:
            sp = max(0.0, sp + (v - target - k))
            sn = max(0.0, sn + (target - v - k))
            exp_pos.append(round(sp, 6))
            exp_neg.append(round(sn, 6))
        base = datetime.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("k", base + datetime.timedelta(minutes=i), i, v)
             for i, v in enumerate(vals)],
            "k string, ts timestamp, eid long, v double",
        )
        out = timeseries.cusum_scores(
            df, ["k"], "ts", "v", target=target, slack=k, tie_col="eid"
        ).orderBy("ts").collect()
        got_pos = [float(r["cusum_pos"]) for r in out]
        got_neg = [float(r["cusum_neg"]) for r in out]
        assert got_pos == exp_pos
        assert got_neg == exp_neg

    def test_nonnegative(self, spark):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("k", base + datetime.timedelta(minutes=i), i, float(-i))
             for i in range(20)],
            "k string, ts timestamp, eid long, v double",
        )
        out = timeseries.cusum_scores(df, ["k"], "ts", "v", target=0.0, tie_col="eid")
        mn = out.agg(F.min("cusum_pos"), F.min("cusum_neg")).collect()[0]
        assert float(mn[0]) >= 0.0 and float(mn[1]) >= 0.0


class TestWinnowing:
    def _fps(self, spark, texts, k=5, w=4):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        out = dedup.winnowing_fingerprints(df, "doc_id", "text", k=k, w=w)
        by_doc: dict[int, set[int]] = {}
        for r in out.collect():
            by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
        return by_doc

    def test_shared_substring_guarantee(self, spark):
        """Any shared substring of length >= k + w - 1 (= 8 here) must
        yield at least one shared fingerprint hash."""
        shared = "zqxjwvkp"  # 8 chars, appears verbatim in both
        fps = self._fps(
            spark,
            [f"aaa {shared} bbb ccc ddd", f"eee fff {shared} ggg hhh"],
        )
        assert fps[0] & fps[1]

    def test_disjoint_texts_no_overlap(self, spark):
        fps = self._fps(
            spark,
            ["aabbccddeeaabbccdd eeaabb", "zzyyxxwwvvzzyyxxww vvzzyy"],
        )
        # different content -> overwhelmingly disjoint fingerprints
        assert not (fps.get(0, set()) & fps.get(1, set()))

    def test_short_text_empty(self, spark):
        df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        assert dedup.winnowing_fingerprints(df, "doc_id", "text", k=5, w=4).count() == 0

    def test_density(self, spark):
        """Winnowing selects ~2/(w+1) of gram positions — sanity-check the
        selection actually thins (strictly fewer fingerprints than grams)."""
        text = "the quick brown fox jumps over the lazy dog " * 5
        fps = self._fps(spark, [text])
        n_grams = len(" ".join(text.split()).strip()) - 4
        assert 0 < len(fps[0]) < n_grams / 2

    def test_param_guard(self, spark):
        df = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
        with pytest.raises(ValueError):
            dedup.winnowing_fingerprints(df, "doc_id", "text", k=0, w=4)
