"""Round-7 operator tests: fully-wired prepare_corpus (both
decontamination doors + deterministic shuffle) and the
neardup_contamination_ids flag form."""

from __future__ import annotations

import pyspark.sql.functions as F


class TestPrepareCorpusFull:
    def _docs(self, spark):
        # distinct-word docs so bigram Jaccard is exactly constructible
        rows = [
            (1, "alpha bravo charlie delta echo foxtrot golf hotel india "
                "juliet kilo lima mike november oscar papa quebec romeo", "s0"),
            (2, "sierra tango uniform victor whiskey xray yankee zulu "
                "one two three four five six seven eight", "s0"),
            (3, "red orange yellow green blue indigo violet pink brown "
                "black white gray silver gold bronze copper", "s1"),
            (4, "north south east west up down left right front back "
                "center middle inner outer top bottom", "s1"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, source string")

    def test_both_doors_and_shuffle(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import pipeline

        docs = self._docs(spark)
        # benchmark: doc 2 verbatim (exact door) + doc 1 paraphrased with a
        # marker after every 6th word (no shared 8-gram; bigram J ~ 0.68)
        w = docs.where("doc_id = 1").collect()[0]["text"].split()
        fuzzy_bench = " ".join(
            sum(([t, "zzmk"] if (i + 1) % 6 == 0 else [t] for i, t in enumerate(w)), [])
        )
        exact_bench = docs.where("doc_id = 2").collect()[0]["text"]
        bench = spark.createDataFrame(
            [(exact_bench,), (fuzzy_bench,)], "text string"
        )
        packed = pipeline.prepare_corpus(
            docs,
            keep_langs=("en", "und"),
            min_quality=0.0,
            pack_budget=64,
            benchmark_df=bench,
            decontaminate_fuzzy_ngram=2,
            decontaminate_fuzzy_threshold=0.5,
            shuffle_salt="epoch0",
        )
        kept = {r.doc_id for r in packed.collect()}
        assert kept == {3, 4}, kept  # doc 2 exact-door, doc 1 fuzzy-door
        assert "shuffle_pos" in packed.columns
        # a different salt permutes shuffle_pos but keeps the survivor set
        packed2 = pipeline.prepare_corpus(
            docs,
            keep_langs=("en", "und"),
            min_quality=0.0,
            pack_budget=64,
            benchmark_df=bench,
            decontaminate_fuzzy_ngram=2,
            decontaminate_fuzzy_threshold=0.5,
            shuffle_salt="epoch1",
        )
        assert {r.doc_id for r in packed2.collect()} == {3, 4}
        pos = {r.doc_id: r.shuffle_pos for r in packed.collect()}
        assert sorted(pos.values()) == [0, 1]

    def test_flag_form_matches_filter_form(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        docs = self._docs(spark)
        w = docs.where("doc_id = 1").collect()[0]["text"].split()
        bench = spark.createDataFrame(
            [(" ".join(sum(([t, "zzmk"] if (i + 1) % 6 == 0 else [t]
                            for i, t in enumerate(w)), [])),)],
            "text string",
        )
        flagged = {
            r.doc_id
            for r in dedup.neardup_contamination_ids(
                docs, bench, "doc_id", n=2, threshold=0.5
            ).collect()
        }
        survivors = {
            r.doc_id
            for r in dedup.decontaminate_neardup(
                docs, bench, "doc_id", n=2, threshold=0.5
            ).collect()
        }
        assert flagged == {1}
        assert survivors == {2, 3, 4}
        all_ids = {r.doc_id for r in docs.collect()}
        assert survivors == all_ids - flagged


class TestAsofDirections:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, "u", "2024-01-01 10:00:00"),
             (2, "u", "2024-01-01 12:00:00"),
             (3, "v", "2024-01-01 09:00:00")],
            "id long, k string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        right = spark.createDataFrame(
            [(10, "u", "2024-01-01 09:30:00", 1.0),
             (11, "u", "2024-01-01 11:00:00", 2.0),
             (12, "u", "2024-01-01 12:00:00", 3.0),   # == left id=2 ts
             (13, "u", "2024-01-01 12:00:00", 4.0)],  # tie, greater id wins
            "rid long, k string, ts string, v double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        return left, right

    def test_forward_vs_backward(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.joins import asof_join

        left, right = self._frames(spark)
        back = {r.id: r.v for r in asof_join(
            left, right, on="k", right_cols=["v"], suffix="",
            right_tie_break="rid", direction="backward").collect()}
        fwd = {r.id: r.v for r in asof_join(
            left, right, on="k", right_cols=["v"], suffix="",
            right_tie_break="rid", direction="forward").collect()}
        # backward: latest <=; 12:00 tie -> greatest rid (13, v=4.0)
        assert back == {1: 1.0, 2: 4.0, 3: None}
        # forward: earliest >=; at 10:00 next is 11:00 (2.0); inclusive tie
        # at 12:00 -> greatest rid again; v has no right rows at all
        assert fwd == {1: 2.0, 2: 4.0, 3: None}

    def test_nearest_prefers_closer_and_backward_on_tie(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.joins import (
            asof_join_nearest,
        )

        left = spark.createDataFrame(
            [(1, "u", "2024-01-01 10:00:00"),   # back 1h, fwd 30m -> fwd
             (2, "u", "2024-01-01 12:30:00"),   # back 30m, fwd 30m -> back
             (3, "u", "2024-01-01 08:00:00")],  # only fwd exists
            "id long, k string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        right = spark.createDataFrame(
            [(10, "u", "2024-01-01 09:00:00", 1.0),
             (11, "u", "2024-01-01 10:30:00", 2.0),
             (12, "u", "2024-01-01 12:00:00", 3.0),
             (13, "u", "2024-01-01 13:00:00", 4.0)],
            "rid long, k string, ts string, v double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {r.id: r.v for r in asof_join_nearest(
            left, right, on="k", right_cols=["v"], suffix="",
            right_tie_break="rid").collect()}
        assert got == {1: 2.0, 2: 3.0, 3: 1.0}


class TestTwapOhlc:
    def test_twap_exact(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import timeseries

        df = spark.createDataFrame(
            [(1, "a", "2024-01-01 00:00:00", 10.0),
             (2, "a", "2024-01-01 00:00:10", 20.0),   # 10s @ 10.0
             (3, "a", "2024-01-01 00:00:40", 99.0)],  # 30s @ 20.0
            "event_id long, k string, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        r = timeseries.twap(df, ["k"], "ts", "value", tie_col="event_id").collect()[0]
        # (10*10 + 30*20) / 40 = 17.5; the last obs carries no weight
        assert r["twap"] == 17.5 and r["n_obs"] == 2 and r["span_s"] == 40.0

    def test_ohlc_ties_break_on_tie_col(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import timeseries

        df = spark.createDataFrame(
            [(1, "a", "2024-01-01 00:00:00", 5.0),
             (2, "a", "2024-01-01 00:00:00", 7.0),   # ts tie: open -> id 1
             (3, "a", "2024-01-01 23:59:59", 2.0),
             (4, "a", "2024-01-01 23:59:59", 9.0)],  # ts tie: close -> id 4
            "event_id long, k string, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        r = timeseries.ohlc_bars(
            df, ["k"], "ts", "value", bucket_seconds=86400, tie_col="event_id"
        ).collect()[0]
        assert (r["open"], r["high"], r["low"], r["close"], r["n_obs"]) == (
            5.0, 9.0, 2.0, 9.0, 4,
        )


class TestVocabularyDrift:
    def test_uniform_source_scores_zero(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import textstats

        # s0/s1 carry the majority distribution; the minority disjoint-vocab
        # source s2 sits farther from the corpus blend than they do
        df = spark.createDataFrame(
            [(1, "aa bb cc", "s0"), (2, "aa bb cc", "s0"),
             (3, "aa bb cc", "s1"), (4, "aa bb cc", "s1"),
             (5, "xx yy zz", "s2")],
            "doc_id long, text string, source string",
        )
        got = {r["source"]: r["jsd"] for r in
               textstats.vocabulary_drift(df, "source").collect()}
        assert got["s0"] == got["s1"]
        assert got["s2"] > got["s0"] > 0.0  # s0/s1 differ from the blend too
        same = spark.createDataFrame(
            [(1, "aa bb", "s0"), (2, "aa bb", "s1")],
            "doc_id long, text string, source string",
        )
        z = {r["source"]: r["jsd"] for r in
             textstats.vocabulary_drift(same, "source").collect()}
        assert z == {"s0": 0.0, "s1": 0.0}


class TestMMRSelection:
    def test_diversity_beats_pure_relevance(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import similarity

        # query q=[1,0]; a picked first (max rel). a2 is a near-dup of a
        # (sim(a,a2)=0.973) with rel 0.69; b is ORTHOGONAL to a (sim=0)
        # with rel 0.68. Pure relevance would rank a2 second (0.69 > 0.68);
        # MMR at λ=0.7 scores a2 at 7·0.69−3·0.973=1.911 vs b at
        # 7·0.68−0=4.76, so diversity flips the second pick to b.
        rows = [
            (0, [1.0, 0.0]),            # query
            (1, [0.70, 0.70]),          # a
            (2, [0.69, 0.70]),          # a2 (near-dup of a)
            (3, [0.68, -0.68]),         # b (orthogonal to a)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = similarity.mmr_selection(df, query_id=0, k=3)
        order = [r.id for r in got.orderBy("rank").collect()]
        assert order == [1, 3, 2], order
        rels = {r.id: r.rel for r in got.collect()}
        assert rels[1] == 0.7 and rels[3] == 0.68

    def test_deterministic_and_excludes_query(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.operators import similarity
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        a = [tuple(r) for r in similarity.mmr_selection(emb, 0, k=4).collect()]
        b = [tuple(r) for r in similarity.mmr_selection(emb, 0, k=4).collect()]
        assert a == b and all(r[1] != 0 for r in a) and len(a) == 4


class TestAttribution:
    def test_first_last_touch_window(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import timeseries

        conv = spark.createDataFrame(
            [(100, "u", "2024-01-10 12:00:00"),
             (101, "w", "2024-01-10 12:00:00")],  # w has no touches
            "event_id long, user_id string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        touches = spark.createDataFrame(
            [(1, "u", "2024-01-01 00:00:00", "click"),   # outside 7d window
             (2, "u", "2024-01-05 00:00:00", "view"),    # first in window
             (3, "u", "2024-01-09 00:00:00", "click"),   # last in window
             (4, "u", "2024-01-10 13:00:00", "view")],   # after conversion
            "touch_id long, user_id string, ts string, touch_type string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = timeseries.attribution_touchpoints(
            conv, touches, "user_id", touch_cols=["touch_type"],
            window="7 days", touch_tie_break="touch_id",
        ).collect()
        got = {r.event_id: (r.touch_type_first, r.touch_type_last) for r in out}
        assert got == {100: ("view", "click"), 101: (None, None)}


class TestCorpusGrowthSignals:
    def test_ngram_novelty(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import textstats

        df = spark.createDataFrame(
            [(1, "a b c d"),        # 2 trigrams, both novel
             (2, "a b c e"),        # "a b c" seen in doc 1 -> 1/2 novel
             (3, "a b c d")],       # exact repeat -> 0 novel
            "doc_id long, text string",
        )
        got = {r.doc_id: (r.n_grams, r.n_novel, r.novelty)
               for r in textstats.ngram_novelty(df, "doc_id", n=3).collect()}
        assert got == {1: (2, 2, 1.0), 2: (2, 1, 0.5), 3: (2, 0, 0.0)}

    def test_vocab_growth_cumulative(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import textstats

        df = spark.createDataFrame(
            [(0, "aa bb"), (1, "aa cc"),      # bucket 0: types aa bb cc
             (2, "aa bb"), (3, "dd")],        # bucket 1: new type dd
            "doc_id long, text string",
        )
        rows = {r.bucket: (r.n_tokens, r.new_types, r.cum_vocab)
                for r in textstats.vocab_growth(df, "doc_id", bucket_size=2).collect()}
        assert rows == {0: (4, 3, 3), 1: (3, 1, 4)}

    def test_bootstrap_ab_diff_brackets_and_detects_shift(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        rows = [(i, 10.0 + (i % 7) * 0.1, "A") for i in range(300)]
        rows += [(1000 + i, 20.0 + (i % 5) * 0.1, "B") for i in range(300)]
        df = spark.createDataFrame(rows, "rid long, v double, grp string")
        r = ml.bootstrap_ab_diff_ci(df, "v", "grp", "rid", "A", "B").collect()[0]
        assert r["n_a"] == 300 and r["n_b"] == 300
        assert r["ci_lo"] <= r["diff"] <= r["ci_hi"]
        assert r["ci_hi"] < 0  # a true ~-10 shift: CI excludes 0
        # deterministic
        r2 = ml.bootstrap_ab_diff_ci(df, "v", "grp", "rid", "A", "B").collect()[0]
        assert r == r2


class TestSurvivalAndZtest:
    def test_kaplan_meier_textbook(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        # classic 4-subject example: event@1, censor@2, event@3, event@4
        df = spark.createDataFrame(
            [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 1)], "d double, e int"
        )
        rows = {r.t: (r.n_risk, r.n_events, r.survival)
                for r in ml.kaplan_meier(df, "d", "e").collect()}
        # S(1)=3/4; censor at 2 leaves risk set; S(3)=3/4*1/2=0.375;
        # S(4): d=n=1 -> survival exactly 0
        assert rows == {1.0: (4, 1, 0.75), 3.0: (2, 1, 0.375), 4.0: (1, 1, 0.0)}

    def test_censoring_changes_curve(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        # same event times, but the censored subject treated as an event
        # would drag survival lower — KM must NOT do that
        df_cens = spark.createDataFrame(
            [(1.0, 1), (2.0, 0), (3.0, 1), (10.0, 0)], "d double, e int"
        )
        df_evt = spark.createDataFrame(
            [(1.0, 1), (2.0, 1), (3.0, 1), (10.0, 0)], "d double, e int"
        )
        s_cens = {r.t: r.survival for r in ml.kaplan_meier(df_cens, "d", "e").collect()}
        s_evt = {r.t: r.survival for r in ml.kaplan_meier(df_evt, "d", "e").collect()}
        assert s_cens[3.0] > s_evt[3.0]
        assert 2.0 not in s_cens and 2.0 in s_evt

    def test_two_proportion_ztest(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        rows = [(i, "a", 1 if i < 60 else 0) for i in range(100)]
        rows += [(1000 + i, "b", 1 if i < 40 else 0) for i in range(100)]
        df = spark.createDataFrame(rows, "id long, grp string, conv int")
        r = ml.two_proportion_ztest(df, "grp", "conv", "a", "b").collect()[0]
        # p_a=0.6 p_b=0.4 pooled=0.5 -> z = 0.2/sqrt(0.5*0.5*0.02) ~ 2.8284
        assert (r["n_a"], r["n_b"], r["rate_a"], r["rate_b"]) == (100, 100, 0.6, 0.4)
        assert abs(r["z"] - 2.828427) < 1e-6 and bool(r["significant"])


class TestMahalanobisAndSessions:
    def test_mahalanobis_flags_joint_outlier(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        # x2 ~ 10*x1 everywhere except row 99, which is per-column normal
        # but breaks the correlation — Mahalanobis must rank it first
        rows = [(i, float(i % 10 + 1), float((i % 10 + 1) * 10), 0.05)
                for i in range(99)]
        rows.append((99, 2.0, 90.0, 0.05))  # joint outlier
        df = spark.createDataFrame(rows, "rid long, a double, b double, c double")
        top = ml.mahalanobis_outliers(df, ["a", "b", "c"], "rid", top=3).collect()
        assert top[0]["rid"] == 99
        assert top[0]["d2"] > top[1]["d2"]

    def test_sessionize_capped_cuts(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import timeseries

        # user 1: events every 10 min for 3h -> pure-gap sessionization
        # would keep ONE session; a 1h cap must cut it into 4 (the first
        # event past each 60-min anchor window opens a new session)
        rows = [(i, 1, f"2024-01-01 00:{'%02d' % 0}:00") for i in range(0)]
        base = 1704067200  # 2024-01-01 00:00:00 UTC epoch seconds
        rows = [(i, 1, base + i * 600) for i in range(19)]  # 0..180 min
        df = spark.createDataFrame(rows, "event_id long, user_id long, es long") \
            .withColumn("ts", F.timestamp_seconds(F.col("es")))
        out = timeseries.sessionize_capped(
            df, "user_id", "ts", gap_seconds=1800, max_seconds=3600,
            tie_col="event_id",
        ).collect()
        sessions = sorted((r.session_id, r.n_events) for r in out)
        # anchors at 0/70/140min: 0-60 incl = 7 events, then 7, then 5
        assert sessions == [(1, 7), (2, 7), (3, 5)]
        # and a pure-gap run (no cap) keeps one session
        one = timeseries.sessionize_capped(
            df, "user_id", "ts", gap_seconds=1800, max_seconds=10**9,
            tie_col="event_id",
        ).collect()
        assert len(one) == 1 and one[0].n_events == 19
