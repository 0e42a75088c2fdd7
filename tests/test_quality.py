"""Data-quality rules: single-pass evaluation, violation counting, gating."""

from __future__ import annotations

import pytest

from ecu_sbl_aace_datalake_spark.operators import quality as q
from ecu_sbl_aace_datalake_spark.sources.io import load_table


class TestRules:
    @pytest.fixture(scope="class")
    def dirty(self, spark):
        rows = [
            (1, "AUTOMOBILE", 100.0, "a@x.com"),
            (2, None, 50.0, "bad-email"),
            (3, "WEIRD", -5.0, "c@x.com"),
            (3, "BUILDING", 20.0, "d@x.com"),  # duplicate id
        ]
        return spark.createDataFrame(rows, "id long, seg string, bal double, email string")

    def test_all_rule_kinds(self, spark, dirty):
        report, ok = q.check_table(
            spark,
            dirty,
            [
                q.not_null("seg"),
                q.unique("id"),
                q.accepted_values("seg", ["AUTOMOBILE", "BUILDING"]),
                q.in_range("bal", 0, 1000),
                q.matches("email", r"^[^@]+@[^@]+\.[a-z]+$"),
            ],
        )
        got = {(r.rule, r.column): r.violations for r in report.collect()}
        assert got[("not_null", "seg")] == 1
        assert got[("unique", "id")] == 2          # both rows of the dup key
        assert got[("accepted_values", "seg")] == 1  # WEIRD (null not counted)
        assert got[("in_range", "bal")] == 1       # -5.0
        assert got[("matches", "email")] == 1      # bad-email
        assert not ok

    def test_referential_integrity(self, spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer")
        report, ok = q.check_table(
            spark, orders, [q.references("o_custkey", cust, "c_custkey")]
        )
        assert ok  # fixture FKs are sound
        ghost = orders.limit(1).selectExpr(
            "CAST(-1 AS BIGINT) AS o_custkey", "o_orderkey"
        )
        bad = orders.select("o_custkey", "o_orderkey").unionByName(ghost)
        _, ok2 = q.check_table(spark, bad, [q.references("o_custkey", cust, "c_custkey")])
        assert not ok2

    def test_clean_table_passes_gate(self, spark, sf_dir):
        nation = load_table(spark, sf_dir, "nation")
        report = q.expect(
            spark, nation,
            [q.not_null("n_nationkey"), q.unique("n_nationkey"),
             q.in_range("n_regionkey", 0, 4)],
        )
        assert all(r.passed for r in report.collect())

    def test_gate_raises_with_detail(self, spark, dirty):
        with pytest.raises(ValueError, match="unique\\(id\\)=2"):
            q.expect(spark, dirty, [q.unique("id")])

    def test_composite_unique(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (1, "a")], "k long, v string"
        )
        report, ok = q.check_table(spark, df, [q.unique("k", "v")])
        assert report.first().violations == 2 and not ok


class TestPsiDrift:
    def test_identical_distributions_near_zero(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.quality import psi_drift

        import pyspark.sql.functions as F
        df = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
        out = psi_drift(df, df, "v", bins=10)
        total = out.agg(F.sum("psi")).first()[0]
        assert abs(total) < 1e-4  # same distribution → ~0

    def test_shifted_distribution_flags(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.quality import psi_drift

        import pyspark.sql.functions as F
        ref = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
        cur = spark.range(1000).select(
            ((F.col("id") % 100) + 80).cast("double").alias("v")
        )  # mass shifted right; clamps into the top bins
        out = psi_drift(ref, cur, "v", bins=10)
        total = out.agg(F.sum("psi")).first()[0]
        assert total > 0.25  # rule-of-thumb "shifted" threshold
        assert out.count() == 10  # full spine even where a side is empty


class TestRepetitionStats:
    def test_dup_lines_and_top_gram(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.textstats import (
            gopher_quality_filter,
            with_repetition_stats,
        )

        docs = spark.createDataFrame(
            [(1, "same line\nsame line\nother line"),
             (2, "spam spam spam spam spam"),
             (3, "a perfectly normal english sentence with varied words")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in with_repetition_stats(docs).collect()}
        assert abs(out[1].dup_line_frac - 1 / 3) < 1e-3
        assert out[3].dup_line_frac == 0.0
        # "spam spam" ×4 of 4 2-grams → 1.0
        assert out[2].top_2gram_frac == 1.0
        assert out[3].top_2gram_frac < 0.2
        assert out[3].frac_words_alpha == 1.0
        kept = {r.doc_id for r in gopher_quality_filter(docs).collect()}
        assert kept == {3}

    def test_symbols_and_nonalpha_words(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.textstats import (
            with_repetition_stats,
        )

        docs = spark.createDataFrame(
            [(1, "#### $$$$ 1234 word")], "doc_id long, text string"
        )
        r = with_repetition_stats(docs).collect()[0]
        assert r.symbol_word_ratio == 8 / 4  # 8 symbol chars / 4 words
        assert r.frac_words_alpha == 0.25
        empty = spark.createDataFrame([(2, "   ")], "doc_id long, text string")
        r2 = with_repetition_stats(empty).collect()[0]
        assert r2.dup_line_frac == 0.0 and r2.top_2gram_frac == 0.0
        assert r2.symbol_word_ratio == 0.0 and r2.frac_words_alpha == 0.0


class TestBigramLm:
    def test_typical_beats_gibberish(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.textstats import bigram_lm_scores

        typical = "the cat sat on the mat and the dog sat on the rug"
        docs = spark.createDataFrame(
            [(i, typical) for i in range(10)]
            + [(100, "zxqv wkjh qpzm vbnx kjwq zzyx")]   # gibberish: unseen bigrams
            + [(200, "one")],                            # < 2 tokens
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in bigram_lm_scores(docs).collect()}
        assert out[0].lm_logprob > out[100].lm_logprob
        assert out[200].lm_logprob is None and out[200].n_bigrams is None
        assert out[0].n_bigrams == 12

    def test_deterministic_across_partitionings(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.textstats import bigram_lm_scores

        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma delta token{i % 3} epsilon") for i in range(40)],
            "doc_id long, text string",
        )
        a = sorted(map(tuple, bigram_lm_scores(docs).select("doc_id", "lm_logprob").collect()))
        b = sorted(map(tuple, bigram_lm_scores(docs.repartition(17)).select("doc_id", "lm_logprob").collect()))
        assert a == b


class TestTrigramLm:
    def test_typical_beats_gibberish(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.textstats import trigram_lm_scores

        typical = "the cat sat on the mat and the dog sat on the rug"
        docs = spark.createDataFrame(
            [(i, typical) for i in range(10)]
            + [(100, "zxqv wkjh qpzm vbnx kjwq zzyx")]   # unseen everything
            + [(200, "one two")],                        # < 3 tokens
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in trigram_lm_scores(docs).collect()}
        assert out[0].lm_logprob3 > out[100].lm_logprob3
        assert out[200].lm_logprob3 is None and out[200].n_trigrams is None
        assert out[0].n_trigrams == 11

    def test_backoff_ranks_seen_bigram_above_unseen(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.textstats import trigram_lm_scores

        # both probe docs have unseen TRIgrams; the one whose bigrams exist
        # in the corpus must win — exactly what interpolation buys over a
        # raw add-k trigram model (where both would tie at ~k/kV)
        corpus = [(i, "alpha beta gamma delta epsilon zeta") for i in range(10)]
        docs = spark.createDataFrame(
            corpus
            + [(100, "alpha beta delta epsilon gamma delta")]  # seen bigrams? mixed
            + [(200, "qqq www eee rrr ttt yyy")],               # nothing seen
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in trigram_lm_scores(docs).collect()}
        assert out[100].lm_logprob3 > out[200].lm_logprob3

    def test_deterministic_across_partitionings(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.textstats import trigram_lm_scores

        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma delta token{i % 3} epsilon") for i in range(40)],
            "doc_id long, text string",
        )
        a = sorted(map(tuple, trigram_lm_scores(docs).select("doc_id", "lm_logprob3").collect()))
        b = sorted(map(tuple, trigram_lm_scores(docs.repartition(17)).select("doc_id", "lm_logprob3").collect()))
        assert a == b


class TestKsDrift:
    def test_identical_distributions_zero(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.quality import ks_drift

        rows = [(i, float(i % 10), i < 100) for i in range(200)]
        df = spark.createDataFrame(rows, "id long, value double, is_ref boolean")
        r = ks_drift(df, "value", "is_ref").collect()[0]
        assert r.ks_stat == 0.0 and r.n_a == 100 and r.n_b == 100

    def test_shifted_distribution_detected(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.quality import ks_drift

        ref = [(i, float(i % 10), True) for i in range(100)]
        cur = [(1000 + i, float(i % 10) + 5.0, False) for i in range(100)]
        df = spark.createDataFrame(ref + cur, "id long, value double, is_ref boolean")
        r = ks_drift(df, "value", "is_ref").collect()[0]
        # half-overlapping supports → D = 0.5 exactly
        assert r.ks_stat == 0.5

    def test_grouped_and_scipy_crosscheck(self, spark):
        import numpy as np
        from ecu_sbl_aace_datalake_spark.operators.quality import ks_drift

        rng = [((i * 2654435761) % 997) / 997.0 for i in range(300)]
        a = rng[:150]
        b = [x * 0.8 + 0.1 for x in rng[150:]]
        rows = [(i, v, True, "g") for i, v in enumerate(a)] + [
            (1000 + i, v, False, "g") for i, v in enumerate(b)
        ]
        df = spark.createDataFrame(rows, "id long, value double, is_ref boolean, grp string")
        r = ks_drift(df, "value", "is_ref", ["grp"]).collect()[0]
        # independent numpy empirical-CDF computation
        xs = np.array(sorted(set(a) | set(b)))
        fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
        assert abs(r.ks_stat - np.max(np.abs(fa - fb))) < 1e-9


class TestChi2Drift:
    def test_identical_frequencies_zero(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.quality import chi2_drift

        rows = [(i, "abc"[i % 3], i < 300) for i in range(600)]
        df = spark.createDataFrame(rows, "id long, cat string, is_ref boolean")
        r = chi2_drift(df, "cat", "is_ref").collect()[0]
        assert r.chi2 == 0.0 and r.dof == 2 and r.n_a == 300 and r.n_b == 300

    def test_matches_scipy_formula(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.quality import chi2_drift

        # ref: a=60 b=40; cur: a=30 b=70
        rows = ([(i, "a", True) for i in range(60)] + [(100 + i, "b", True) for i in range(40)]
                + [(200 + i, "a", False) for i in range(30)] + [(300 + i, "b", False) for i in range(70)])
        df = spark.createDataFrame(rows, "id long, cat string, is_ref boolean")
        r = chi2_drift(df, "cat", "is_ref").collect()[0]
        # hand-computed 2x2 chi2: n=200, ea_a=45, chi2 = sum (o-e)^2/e
        expected = (60-45)**2/45 + (30-45)**2/45 + (40-55)**2/55 + (70-55)**2/55
        assert abs(r.chi2 - round(expected, 4)) < 1e-9 and r.dof == 1


class TestMadOutliers:
    def test_extreme_point_flagged(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.quality import mad_outliers

        rows = [(i, "a", float(v)) for i, v in enumerate([10, 11, 9, 10, 12, 10, 11, 1000])]
        df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
        out = {r.event_id: r for r in mad_outliers(df, "value", ["event_type"]).collect()}
        assert out[7].is_outlier is True
        assert all(not out[i].is_outlier for i in range(7))

    def test_robust_to_multiple_outliers(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.quality import mad_outliers

        # 3 of 12 points extreme: classic z-score inflation would mask
        # them; MAD keeps the threshold tight
        vals = [10, 10, 11, 9, 10, 11, 9, 10, 10, 500, 600, 700]
        rows = [(i, float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "event_id long, value double")
        out = {r.event_id: r.is_outlier for r in mad_outliers(df, "value").collect()}
        assert out[9] and out[10] and out[11]
        assert not any(out[i] for i in range(9))

    def test_zero_mad_group(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.quality import mad_outliers

        rows = [(i, 5.0) for i in range(6)] + [(6, 5.1)]
        df = spark.createDataFrame(rows, "event_id long, value double")
        out = {r.event_id: r.is_outlier for r in mad_outliers(df, "value").collect()}
        assert out[6] is True and not out[0]


class TestNgramDiversity:
    def test_unique_text_scores_one(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.textstats import ngram_diversity

        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        )
        [r] = ngram_diversity(df).collect()
        assert r.ngram_diversity == 1.0 and r.n_ngrams == 5

    def test_repeated_text_scores_low(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.textstats import ngram_diversity

        df = spark.createDataFrame(
            [(1, "spam ham eggs bacon " * 50)], "doc_id long, text string"
        )
        [r] = ngram_diversity(df).collect()
        assert r.ngram_diversity < 0.05
        assert r.distinct_ngrams == 4

    def test_short_doc_null(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.textstats import ngram_diversity

        df = spark.createDataFrame([(1, "too few words")], "doc_id long, text string")
        [r] = ngram_diversity(df).collect()
        assert r.n_ngrams == 0 and r.ngram_diversity is None


class TestDriftReport:
    def test_verdicts(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import quality

        import pyspark.sql.functions as F
        ref = spark.range(0, 2000).select(
            (F.col("id") % 100).cast("double").alias("same"),
            (F.col("id") % 100).cast("double").alias("shifted"),
        )
        cur = spark.range(0, 2000).select(
            (F.col("id") % 100).cast("double").alias("same"),
            ((F.col("id") % 100) + 80.0).alias("shifted"),
        )
        got = {r["column"]: r for r in quality.drift_report(
            ref, cur, ["same", "shifted"]
        ).collect()}
        assert got["same"].verdict == "stable" and got["same"].psi_total < 0.01
        assert got["shifted"].verdict == "shifted"
        assert got["shifted"].psi_total > 0.25
