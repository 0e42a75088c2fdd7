"""Round-9 regression tests for the ADVICE-r8 findings:
dedup_by_clusters_prefer unclustered-mass straggler, ranking_metrics
zero-result truth-backed queries, bh_fdr exact-threshold rejection,
domain_quality_report NULL-score averages."""

from __future__ import annotations

import pyspark.sql.functions as F


class TestDedupPreferSplitPlan:
    def _fixture(self, spark):
        df = spark.createDataFrame(
            [(1, 10.0), (2, 30.0), (3, 20.0), (4, 5.0), (5, 7.0)],
            "doc_id long, q double",
        )
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1)], "node long, cluster long"
        )
        return df, clusters

    def test_semantics_unchanged(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        df, clusters = self._fixture(spark)
        got = sorted(
            r.doc_id
            for r in dedup.dedup_by_clusters_prefer(
                df, "doc_id", clusters, "q"
            ).collect()
        )
        # cluster {1,2,3}: keep 2 (q=30); 4 and 5 pass through
        assert got == [2, 4, 5], got

        low = sorted(
            r.doc_id
            for r in dedup.dedup_by_clusters_prefer(
                df, "doc_id", clusters, "q", keep_highest=False
            ).collect()
        )
        assert low == [1, 4, 5], low

    def test_unclustered_rows_never_enter_the_window(self, spark):
        # The old shape left-joined every row, then windowed over __cl —
        # putting the entire unclustered corpus in ONE `__cl IS NULL`
        # partition (a straggler/OOM at scale). The split plan's window
        # input must be the inner-join side only.
        from ecu_sbl_aace_datalake_spark.operators import dedup

        df, clusters = self._fixture(spark)
        out = dedup.dedup_by_clusters_prefer(df, "doc_id", clusters, "q")
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # one Window node, fed by an inner join; the pass-through branch
        # is a LeftAnti join unioned around it
        import re as _re

        assert len(_re.findall(r"\bWindow \[", plan)) == 1, plan
        assert "LeftAnti" in plan, plan
        import re

        win_idx = plan.index("Window")
        anti_idx = plan.index("LeftAnti")
        # the anti join must NOT be upstream of the window (union branch,
        # not window input): in the plan tree string the Window's subtree
        # ends before the LeftAnti branch starts
        assert win_idx < anti_idx, plan
        # no null-cluster rows under the window: window partition key is
        # the cluster column from an inner join
        assert re.search(r"Join Inner", plan), plan


class TestRankingMetricsZeroResultQueries:
    def test_truth_backed_query_with_no_results_counts_as_zero(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        results = spark.createDataFrame(
            [(1, 100, 1), (1, 101, 2)],
            "query_id long, item_id long, rank long",
        )
        truth = spark.createDataFrame(
            [(1, 100), (2, 200), (2, 201)], "query_id long, item_id long"
        )
        got = {
            r.query_id: r
            for r in ml.ranking_metrics(results, truth, k=10).collect()
        }
        # query 2 has truth but zero retrieved rows: present, all-zero
        assert set(got) == {1, 2}, got
        assert got[2].n_relevant == 2 and got[2].n_hits == 0
        assert got[2].recall_at_k == 0.0
        assert got[2].mrr_at_k == 0.0
        assert got[2].ndcg_at_k == 0.0
        # query 1 unchanged: 1 relevant, hit at rank 1
        assert got[1].recall_at_k == 1.0 and got[1].mrr_at_k == 1.0

    def test_result_only_query_still_undefined(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        results = spark.createDataFrame(
            [(9, 1, 1)], "query_id long, item_id long, rank long"
        )
        truth = spark.createDataFrame(
            [(1, 1)], "query_id long, item_id long"
        )
        rows = {r.query_id: r
                for r in ml.ranking_metrics(results, truth, k=5).collect()}
        assert rows[9].recall_at_k is None  # no truth → undefined, not 0

    def test_summary_counts_zero_result_query(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        results = spark.createDataFrame(
            [(1, 100, 1)], "query_id long, item_id long, rank long"
        )
        truth = spark.createDataFrame(
            [(1, 100), (2, 200)], "query_id long, item_id long"
        )
        per_q = ml.ranking_metrics(results, truth, k=10)
        s = ml.ranking_summary(per_q).collect()[0]
        # macro recall averages over BOTH defined queries: (1 + 0) / 2
        assert s.n_queries == 2, s
        assert abs(s.mean_recall_at_k - 0.5) < 1e-9, s


class TestBhFdrExactThreshold:
    def test_rejection_uses_unrounded_threshold(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        # m=3, q=0.05 → exact thresholds 1/3*.05=0.0166666..,
        # 2/3*.05=0.0333333.., 3/3*.05=0.05. p2=0.0333335 sits ABOVE the
        # exact 2/3 line but equals the 6dp-rounded 0.033333? No: round
        # gives 0.033333 < p. Use the other direction: p=0.0333330 is
        # BELOW the rounded 0.033333 threshold but ABOVE exact
        # 0.03333333..? No — 0.033333 < 0.0333333. Construct the real
        # trap: p = 0.033334, rounded thr = 0.033333 → kept either way.
        # The flip case: p = 0.0333333 (< exact 0.03333333…, > rounded
        # 0.033333) — exact BH rejects, rounded-compare keeps.
        tests = spark.createDataFrame(
            [("a", 0.001), ("b", 0.0333333), ("c", 0.9)],
            "test string, p_value double",
        )
        got = {r.test: r.rejected
               for r in ml.bh_fdr(tests, "test", q=0.05).collect()}
        assert got == {"a": True, "b": True, "c": False}, got

    def test_displayed_threshold_still_rounded(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        tests = spark.createDataFrame(
            [("a", 0.001), ("b", 0.02), ("c", 0.9)],
            "test string, p_value double",
        )
        rows = ml.bh_fdr(tests, "test", q=0.05).collect()
        thr = {r.rank: r.bh_threshold for r in rows}
        assert thr[1] == 0.016667 and thr[3] == 0.05, thr
        assert "__thr" not in ml.bh_fdr(tests, "test").columns


class TestDomainQualityNullScores:
    def test_avg_over_scored_docs_only(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import urls

        df = spark.createDataFrame(
            [
                ("http://good.com/a", 0.9),
                ("http://good.com/b", None),   # unscored — must not deflate
                ("http://good.com/c", 0.7),
                ("http://bad.com/a", 0.1),
            ],
            "url string, clf_score double",
        )
        got = {r.domain: r
               for r in urls.domain_quality_report(df, min_avg=0.5).collect()}
        assert got["good.com"].n_docs == 3
        assert abs(got["good.com"].avg_score - 0.8) < 1e-9, got
        assert got["good.com"].keep_domain is True
        assert got["bad.com"].keep_domain is False

    def test_all_null_domain_not_dropped(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import urls

        df = spark.createDataFrame(
            [("http://mystery.org/x", None), ("http://bad.net/y", 0.0)],
            "url string, clf_score double",
        )
        rep = {r.domain: r
               for r in urls.domain_quality_report(df).collect()}
        assert rep["mystery.org"].avg_score is None
        assert rep["mystery.org"].keep_domain is None
        kept = sorted(
            r.url for r in urls.drop_low_quality_domains(df).collect()
        )
        # no score evidence → kept; bad.net (avg 0.0) dropped
        assert kept == ["http://mystery.org/x"], kept
