"""Round-10 regression tests for the ADVICE-r9 findings:
cohens_kappa 64-bit margin-product overflow, license_similarity bare
IndexError on an empty shingle corpus, calibration_report negative-bin
phantom rows."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F


class TestKappaMarginOverflow:
    def test_margins_multiply_as_double(self, spark):
        # Long __ca*__cb wraps (non-ANSI) or errors (ANSI) past
        # n ~ 3.04e9; the fixed plan must multiply doubles. Assert at
        # the plan level — constructing 3e9 rows in a unit test is not
        # viable.
        from ecu_sbl_aace_datalake_spark.operators import ml

        df = spark.createDataFrame(
            [("x", "x"), ("x", "y"), ("y", "y"), ("y", "y")],
            "a string, b string",
        )
        out = ml.cohens_kappa(df, "a", "b")
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "cast(__ca" in plan and "as double" in plan, plan
        # no bigint product of the margins survives anywhere
        assert "(__ca * __cb)" not in plan.replace("#", ""), plan

    def test_kappa_value_unchanged(self, spark):
        # known 2x2 table: n=10, agree=7, margins a:{x:6,y:4},
        # b:{x:5,y:5} -> p_o=0.7, p_e=(30+20)/100=0.5, kappa=0.4
        from ecu_sbl_aace_datalake_spark.operators import ml

        rows = [("x", "x")] * 4 + [("x", "y")] * 2 + [("y", "y")] * 3 + [
            ("y", "x")
        ]
        df = spark.createDataFrame(rows, "a string, b string")
        r = ml.cohens_kappa(df, "a", "b").collect()[0]
        assert r.n == 10
        assert r.p_observed == pytest.approx(0.7)
        assert r.p_expected == pytest.approx(0.5)
        assert r.kappa == pytest.approx(0.4)


class TestLicenseSimilarityEmptyCorpus:
    def test_empty_corpus_raises_value_error(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import compliance

        df = spark.createDataFrame(
            [(1, "some document text here")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="no shingle sets"):
            compliance.license_similarity(df, corpus={})

    def test_all_short_corpus_raises_value_error(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import compliance

        df = spark.createDataFrame(
            [(1, "some document text here")], "doc_id long, text string"
        )
        # every entry has fewer than shingle_n words -> skipped by the
        # 'if not lsh: continue' guard -> used to die with IndexError
        with pytest.raises(ValueError, match="no shingle sets"):
            compliance.license_similarity(
                df, corpus={"mit": "too short", "x": "also short"}
            )


class TestMarginPairsSizeGuard:
    def _vdf(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_big_exact_path_raises_before_the_cross_join(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import similarity

        x = self._vdf(spark, [(i, [1.0, float(i)]) for i in range(4)])
        y = self._vdf(spark, [(10 + i, [1.0, 0.5]) for i in range(4)])
        with pytest.raises(ValueError, match="margin_pairs_pooled"):
            similarity.margin_pairs(x, y, max_exact_pairs=15)

    def test_candidates_path_skips_the_probe(self, spark):
        # with candidates= supplied the guard must not count either
        # side: a threshold of 0 would trip on ANY non-empty input if
        # the probe ran
        from ecu_sbl_aace_datalake_spark.operators import similarity

        x = self._vdf(spark, [(0, [1.0, 0.0]), (1, [0.9, 0.4])])
        y = self._vdf(spark, [(10, [1.0, 0.05])])
        cand = spark.createDataFrame(
            [(0, 10), (1, 10)], "x_id long, y_id long"
        )
        got = similarity.margin_pairs(
            x, y, k=1, threshold=0.0, candidates=cand, max_exact_pairs=0
        ).collect()
        assert {(r.x_id, r.y_id) for r in got} == {(0, 10)}

    def test_opt_out_forces_exact(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import similarity

        x = self._vdf(spark, [(0, [1.0, 0.0]), (1, [0.9, 0.4])])
        y = self._vdf(spark, [(10, [1.0, 0.05])])
        got = similarity.margin_pairs(
            x, y, k=1, threshold=0.0, max_exact_pairs=None
        ).collect()
        assert {(r.x_id, r.y_id) for r in got} == {(0, 10)}

    def test_under_threshold_unchanged(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import similarity

        x = self._vdf(spark, [(0, [1.0, 0.0]), (1, [0.9, 0.4])])
        y = self._vdf(spark, [(10, [1.0, 0.05])])
        got = similarity.margin_pairs(x, y, k=1, threshold=0.0).collect()
        assert {(r.x_id, r.y_id) for r in got} == {(0, 10)}


class TestCalibrationBottomClamp:
    def test_out_of_range_scores_clamp_into_edge_bins(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        df = spark.createDataFrame(
            [(-0.3, 0), (-0.01, 1), (0.05, 0), (1.0, 1), (1.7, 1)],
            "s double, l int",
        )
        rows = ml.calibration_report(df, "s", "l", n_bins=10).collect()
        bins = sorted(r.bin for r in rows)
        # no negative bins, no bin > 9; the three <0.1 scores (two
        # clamped) land in bin 0, the two >=1.0 (one clamped) in bin 9
        assert bins == [0, 9], rows
        by = {r.bin: r for r in rows}
        assert by[0].n == 3 and by[9].n == 2, rows

    def test_in_range_unchanged(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        df = spark.createDataFrame(
            [(0.12, 0), (0.18, 1), (0.95, 1)], "s double, l int"
        )
        rows = {r.bin: r for r in ml.calibration_report(
            df, "s", "l", n_bins=10
        ).collect()}
        assert set(rows) == {1, 9}
        assert rows[1].n == 2 and rows[1].frac_pos == pytest.approx(0.5)
        assert rows[9].mean_score == pytest.approx(0.95)


class TestThresholdSweep:
    """ml.threshold_sweep (round 10): the gate-cut decision table."""

    def _df(self, spark):
        rows = [
            (0.05, 0), (0.15, 0), (0.25, 1), (0.35, 0), (0.45, 1),
            (0.55, 1), (0.65, 0), (0.75, 1), (0.85, 1), (0.95, 1),
        ]
        return spark.createDataFrame(rows, "s double, l int")

    def test_known_sweep_values(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        out = {r.threshold: r for r in ml.threshold_sweep(
            self._df(spark), "s", "l", n_bins=10
        ).collect()}
        assert len(out) == 10
        # t=0.0 admits everything: precision = 6/10, recall 1
        assert out[0.0].n_admitted == 10
        assert out[0.0].precision == pytest.approx(0.6)
        assert out[0.0].recall == pytest.approx(1.0)
        # t=0.5 admits 5 docs (0.55..0.95), 4 positives
        assert out[0.5].n_admitted == 5
        assert out[0.5].precision == pytest.approx(0.8)
        assert out[0.5].recall == pytest.approx(4 / 6, abs=1e-6)
        assert out[0.5].f1 == pytest.approx(2 * 4 / (5 + 6), abs=1e-6)
        # monotone: admitted count non-increasing in threshold
        adm = [out[k].n_admitted for k in sorted(out)]
        assert adm == sorted(adm, reverse=True)

    def test_empty_bins_still_emit_thresholds(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        df = spark.createDataFrame([(0.95, 1), (0.92, 0)], "s double, l int")
        rows = ml.threshold_sweep(df, "s", "l", n_bins=10).collect()
        assert len(rows) == 10
        by = {r.threshold: r for r in rows}
        # every threshold up to 0.9 admits both docs
        assert all(by[t].n_admitted == 2 for t in by if t <= 0.9)

    def test_no_admits_gives_null_precision(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        df = spark.createDataFrame([(0.05, 1)], "s double, l int")
        by = {r.threshold: r for r in ml.threshold_sweep(
            df, "s", "l", n_bins=10
        ).collect()}
        assert by[0.9].n_admitted == 0
        assert by[0.9].precision is None
        assert by[0.0].n_admitted == 1


class TestMannWhitney:
    def test_no_ties_known_values(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 3.0),
             ("b", 4.0), ("b", 5.0), ("b", 6.0)],
            "g string, v double",
        )
        r = ml.mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
        assert (r.n_a, r.n_b) == (3, 3)
        assert r.u_a == 0.0 and r.u_b == 9.0
        # sigma^2 = 3*3/12 * 7 = 5.25; z = -4.5/sqrt(5.25)
        assert r.z == pytest.approx(-4.5 / 5.25 ** 0.5, abs=1e-6)

    def test_ties_half_counted_and_corrected(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)],
            "g string, v double",
        )
        r = ml.mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
        # direct count: one a-vs-b tie at 2 -> U_a = 2 * 0.5 = 1
        assert r.u_a == 1.0 and r.u_b == 5.0
        # ties term: t=3 at value 2 -> 24; var = 0.5*(6 - 24/20) = 2.4
        assert r.z == pytest.approx((1 - 3) / 2.4 ** 0.5, abs=1e-6)

    def test_all_tied_z_null(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        df = spark.createDataFrame(
            [("a", 5.0), ("b", 5.0), ("b", 5.0)], "g string, v double"
        )
        r = ml.mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
        assert r.z is None
        assert r.u_a == 1.0  # two half-ties

    def test_other_groups_excluded(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        df = spark.createDataFrame(
            [("a", 1.0), ("b", 2.0), ("c", 99.0), (None, 3.0)],
            "g string, v double",
        )
        r = ml.mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
        assert (r.n_a, r.n_b) == (1, 1)


class TestDimTruncationEval:
    def test_full_width_recall_is_one_and_monotonic_fixture(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import similarity
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = emb.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        rows = {r.dim: r for r in similarity.dim_truncation_eval(
            emb, q, dims=[64, 8], k=5
        ).collect()}
        assert rows[64].recall_at_k == 1.0  # truncation at full width
        assert 0.0 <= rows[8].recall_at_k <= 1.0
        assert rows[8].n_queries == 4

    def test_planted_prefix_signal(self, spark):
        # neighbors determined entirely by the first 2 dims: truncating
        # to 2 must already achieve recall 1
        from ecu_sbl_aace_datalake_spark.operators import similarity

        rows = [
            (0, [1.0, 0.0, 0.3, -0.2]),
            (1, [0.99, 0.01, -0.1, 0.4]),   # 0's neighbor in 2 dims
            (2, [0.0, 1.0, 0.2, 0.1]),
            (3, [0.01, 0.99, -0.3, 0.2]),   # 2's neighbor
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = emb.where(F.col("vec_id").isin(0, 2)).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = {r.dim: r.recall_at_k for r in similarity.dim_truncation_eval(
            emb, q, dims=[2, 4], k=1
        ).collect()}
        assert out[4] == 1.0 and out[2] == 1.0


class TestC4LineFilters:
    def _run(self, spark, rows, **kw):
        from ecu_sbl_aace_datalake_spark.operators import textstats

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r.doc_id: r for r in textstats.c4_line_filters(df, **kw).collect()}

    def test_each_rule(self, spark):
        good = ("One decent sentence with enough words here.\n"
                "Another decent sentence with enough words too.\n"
                "A third fine sentence that also qualifies nicely.")
        rows = [
            (1, good),
            (2, good + "\nno terminal punctuation on this line"),
            (3, good + "\nToo short."),
            (4, good + "\nPlease enable JavaScript to continue browsing now."),
            (5, good + "\ncurly brace here { kills the page."),
            (6, good + "\nthis page is Lorem Ipsum filler content text."),
            (7, "Only one qualifying sentence lives right here.\nnope"),
        ]
        out = self._run(spark, rows)
        # 1: all three lines kept
        assert out[1].n_lines_kept == 3 and out[1].text_clean == good
        # 2-4: extra junk line dropped, page survives with 3 kept
        for i in (2, 3, 4):
            assert out[i].n_lines_kept == 3 and out[i].text_clean == good, i
        # 5 (brace) and 6 (lorem ipsum) pages dropped entirely
        assert 5 not in out and 6 not in out
        # 7: only 1 kept line < 3 floor -> page dropped
        assert 7 not in out

    def test_terminal_punct_variants(self, spark):
        rows = [(1, 'He said "stop here."\nShe asked are we done yet?\n'
                    'Quoted ending works "fine!"')]
        out = self._run(spark, rows, min_words_per_line=3, min_lines_kept=3)
        assert out[1].n_lines_kept == 3

    def test_null_text_dropped(self, spark):
        out = self._run(spark, [(1, None)])
        assert out == {}


class TestKruskalWallis:
    def test_textbook_three_groups(self, spark):
        # classic no-tie example: a=[1,2], b=[3,4], c=[5,6]
        # ranks 1..6; R=[3, 7, 11]; H = 12/(6*7)*(9/2+49/2+121/2) - 21
        from ecu_sbl_aace_datalake_spark.operators import ml

        rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
                ("c", 5.0), ("c", 6.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r.g: r for r in ml.kruskal_wallis(df, "g", "v").collect()}
        h = 12.0 / 42 * (4.5 + 24.5 + 60.5) - 21
        assert out["a"].h == pytest.approx(h, abs=1e-6)
        assert out["a"].h_corrected == pytest.approx(h, abs=1e-6)  # no ties
        assert out["a"].mean_rank == 1.5 and out["c"].mean_rank == 5.5
        assert out["b"].df == 2

    def test_tie_correction_applied(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        rows = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = ml.kruskal_wallis(df, "g", "v").collect()[0]
        # ties at 2 (t=3... no: t=2) -> sum(t^3-t)=6; n=4
        # midranks: 1, 2.5, 2.5, 4; R_a=3.5, R_b=6.5
        h = 12.0 / 20 * (3.5 ** 2 / 2 + 6.5 ** 2 / 2) - 15
        assert r.h == pytest.approx(h, abs=1e-6)
        assert r.h_corrected == pytest.approx(h / (1 - 6 / 60), abs=1e-6)

    def test_all_tied_corrected_null(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        df = spark.createDataFrame(
            [("a", 5.0), ("b", 5.0)], "g string, v double"
        )
        r = ml.kruskal_wallis(df, "g", "v").collect()[0]
        assert r.h_corrected is None

    def test_two_groups_matches_mwu_z_squared(self, spark):
        # for k=2 without ties, H == z^2 of the Mann-Whitney test
        from ecu_sbl_aace_datalake_spark.operators import ml

        rows = [("a", 1.0), ("a", 4.0), ("a", 2.0),
                ("b", 6.0), ("b", 3.0), ("b", 5.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        h = ml.kruskal_wallis(df, "g", "v").collect()[0].h
        z = ml.mann_whitney_u(df, "g", "v", "a", "b").collect()[0].z
        assert h == pytest.approx(z * z, abs=1e-5)


class TestClusterAwareSplit:
    def test_no_cluster_straddles_splits(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        docs = spark.createDataFrame(
            [(i,) for i in range(200)], "doc_id long"
        )
        # clusters: {0..4}->0, {10..12}->10, rest unclustered
        clusters = spark.createDataFrame(
            [(i, 0) for i in range(5)] + [(i, 10) for i in (10, 11, 12)],
            "node long, cluster long",
        )
        out = dedup.cluster_aware_split(
            docs, "doc_id", clusters, {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
        splits = {r.doc_id: r.split for r in out}
        assert len(splits) == 200
        assert len({splits[i] for i in range(5)}) == 1
        assert len({splits[i] for i in (10, 11, 12)}) == 1
        # all three splits populated on 200 units
        assert {"train", "val", "test"} <= set(splits.values())

    def test_matches_plain_hash_split_for_unclustered(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup
        from ecu_sbl_aace_datalake_spark.operators.transform import hash_split

        docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
        empty = spark.createDataFrame([], "node long, cluster long")
        a = {r.doc_id: r.split for r in dedup.cluster_aware_split(
            docs, "doc_id", empty, {"train": 0.9, "test": 0.1}
        ).collect()}
        b = {r.doc_id: r.split for r in hash_split(
            docs.withColumn("__unit", F.col("doc_id").cast("string")),
            "doc_id", {"train": 0.9, "test": 0.1}, by_col="__unit",
        ).collect()}
        assert a == b
