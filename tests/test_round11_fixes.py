"""Round-11 regression tests for the ADVICE-r10 findings:
incremental_minhash_losers corpus-wins docstring contract,
ingest_log_report unknown-stage filtering, video_keyframe_plan empty
track, _sql_xxh64_bucket power-of-two guard, margin_pairs probe
short-circuit."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F


class TestIngestLogReportUnknownStages:
    def test_unknown_stage_excluded(self, spark):
        # a typo'd/unlisted stage must not appear in the report nor
        # perturb the lag()-based rows_in of the known stages
        from ecu_sbl_aace_datalake_spark.operators import pipeline

        rows = [
            (0, "arrived", 100),
            (0, "exact_dedup", 80),
            (0, "typo_door", 75),  # NOT in stage_order
            (0, "admitted", 70),
            (1, "arrived", 50),
            (1, "exact_dedup", 45),
            (1, "admitted", 40),
        ]
        log = spark.createDataFrame(
            rows, "batch_id long, stage string, n_rows long"
        )
        order = ("arrived", "exact_dedup", "admitted")
        out = pipeline.ingest_log_report(log, stage_order=order).collect()
        stages = [r.stage for r in out]
        assert stages == list(order)
        by = {r.stage: r for r in out}
        # admitted's rows_in is the previous KNOWN stage (exact_dedup):
        # 80 + 45, not polluted by the typo row's 75
        assert by["admitted"].rows_in == 125
        assert by["admitted"].rows_out == 110
        assert by["exact_dedup"].rows_in == 150
        assert by["exact_dedup"].n_rejected == 25

    def test_all_unknown_is_empty(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import pipeline

        log = spark.createDataFrame(
            [(0, "x", 10)], "batch_id long, stage string, n_rows long"
        )
        assert pipeline.ingest_log_report(
            log, stage_order=("a", "b")
        ).count() == 0


class TestVideoKeyframePlanEmptyTrack:
    def test_zero_frames_reports_zero_keyframes(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.multimodal import (
            build_mjpeg_mov, video_keyframe_plan,
        )

        mov = build_mjpeg_mov([], fps=25)
        df = spark.createDataFrame([(1, mov)], "vid long, payload binary")
        rows = video_keyframe_plan(df).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.parsed is True
        assert r.n_frames == 0
        assert r.n_keyframes == 0  # was 1 before the ADVICE-r10 fix
        assert r.frame_index is None and r.keyframe_index is None

    def test_nonempty_track_unchanged(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.multimodal import (
            build_mjpeg_mov, encode_jpeg_solid_gray, video_keyframe_plan,
        )

        frames = [encode_jpeg_solid_gray(100 + i, size=8) for i in range(5)]
        mov = build_mjpeg_mov(frames, fps=25, keyframe_every=2)
        df = spark.createDataFrame([(1, mov)], "vid long, payload binary")
        rows = video_keyframe_plan(df).collect()
        assert len(rows) == 5
        assert all(r.n_keyframes == 3 for r in rows)  # samples 1,3,5


class TestXxhashBucketPowerOfTwoGuard:
    @pytest.mark.parametrize("bad", [0, -8, 3, 100, 127])
    def test_non_power_of_two_raises(self, bad):
        from ecu_sbl_aace_datalake_spark.plans.driver_queries import (
            _sql_xxh64_bucket,
        )

        with pytest.raises(ValueError, match="power-of-two"):
            _sql_xxh64_bucket(bad)

    def test_power_of_two_ok(self):
        from ecu_sbl_aace_datalake_spark.plans.driver_queries import (
            _sql_xxh64_bucket,
        )

        for dim in (1, 2, 64, 128, 4096):
            assert "SELECT" in _sql_xxh64_bucket(dim).upper()


class TestMarginPairsProbeShortCircuit:
    def test_empty_x_skips_y_count_and_returns_empty(self, spark):
        # an empty x must not raise the guard even when y is huge
        # relative to the cap, and must return an empty result
        from ecu_sbl_aace_datalake_spark.operators import similarity

        x = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        y = spark.createDataFrame(
            [(i, [1.0, 0.0]) for i in range(10)],
            "vec_id long, embedding array<double>",
        )
        out = similarity.margin_pairs(x, y, k=2, max_exact_pairs=5)
        assert out.count() == 0


class TestIncrementalCorpusWinsContract:
    def test_batch_doc_with_smaller_id_still_loses_to_corpus(self, spark):
        # the documented contract: corpus-always-wins regardless of id
        # order — a batch doc whose id sorts BEFORE its corpus near-dup
        # is dropped (a full rebuild would have kept it)
        from ecu_sbl_aace_datalake_spark.operators import dedup

        text = (
            "the quick brown fox jumps over the lazy dog again and "
            "again while the cat watches from the warm windowsill"
        )
        corpus = spark.createDataFrame(
            [(100, text), (101, "completely unrelated corpus filler "
                                "about spark shuffles and parquet files")],
            "doc_id long, text string",
        )
        idx = dedup.persist_neardup_index(
            corpus, "doc_id",
            band_table="t_r11_nd_bands", shingle_table="t_r11_nd_shingles",
        )
        try:
            batch = spark.createDataFrame(
                [(5, text + " tail"),  # id 5 < corpus id 100: near-dup
                 (6, "fresh new batch document about structured streaming"
                     " watermarks and stateful aggregation semantics")],
                "doc_id long, text string",
            )
            losers = [
                r.doc_id
                for r in dedup.incremental_minhash_losers(
                    batch, "doc_id", idx, threshold=0.5
                ).collect()
            ]
            assert losers == [5]
        finally:
            spark.sql("DROP TABLE IF EXISTS t_r11_nd_bands")
            spark.sql("DROP TABLE IF EXISTS t_r11_nd_shingles")


class TestLshPlan:
    def test_curve_arithmetic_known_point(self):
        # 16 bands x 2 rows at s=0.5: 1 - (1 - 0.25)^16 = 1 - 0.75^16
        from ecu_sbl_aace_datalake_spark.operators import dedup

        p = dedup.lsh_plan(0.5, target_recall=0.95, max_hashes=64)
        rec = 1 - (1 - 0.5 ** p["rows"]) ** p["bands"]
        assert abs(p["recall_at_threshold"] - round(rec, 6)) < 1e-9
        assert p["recall_at_threshold"] >= 0.95
        assert p["bands"] * p["rows"] == p["num_hashes"]

    def test_smaller_than_fixed_default_at_half(self):
        # at threshold 0.5 / recall 0.95 the planner must beat the fixed
        # 64-hash default (the whole point of the knob)
        from ecu_sbl_aace_datalake_spark.operators import dedup

        p = dedup.lsh_plan(0.5, target_recall=0.95)
        assert p["num_hashes"] < 64

    def test_higher_recall_never_cheaper(self):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        lo = dedup.lsh_plan(0.7, target_recall=0.90)
        hi = dedup.lsh_plan(0.7, target_recall=0.999)
        assert hi["num_hashes"] >= lo["num_hashes"]
        assert hi["recall_at_threshold"] >= 0.999

    def test_unreachable_raises(self):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        with pytest.raises(ValueError, match="no .* plan"):
            dedup.lsh_plan(0.05, target_recall=0.999999, max_hashes=8)

    @pytest.mark.parametrize("bad_t", [0.0, 1.0, -0.5])
    def test_bad_threshold_raises(self, bad_t):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        with pytest.raises(ValueError, match="threshold"):
            dedup.lsh_plan(bad_t)

    def test_plan_param_flows_into_minhash_dedup(self, spark):
        # same duplicates removed with the planned banding as with the
        # fixed default (exact verify makes both correct); the plan's
        # banding shows up in the signature length
        from ecu_sbl_aace_datalake_spark.operators import dedup

        base = (
            "the quick brown fox jumps over the lazy dog near the "
            "river bank every single morning without fail"
        )
        rows = [(1, base), (2, base + " indeed"), (3, "totally different "
                "text about catalyst optimizer rules and shuffle plans")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        p = dedup.lsh_plan(0.5, target_recall=0.98)
        out_plan = dedup.minhash_dedup(
            df, "doc_id", "text", threshold=0.5, plan=p
        )
        out_fixed = dedup.minhash_dedup(
            df, "doc_id", "text", threshold=0.5, bands=32
        )
        assert sorted(r.doc_id for r in out_plan.collect()) == sorted(
            r.doc_id for r in out_fixed.collect()
        ) == [1, 3]

    def test_min_rows_floor_refuses_single_row_bands(self):
        # the default plan must never pick rows=1 (mega-bucket footgun:
        # candidate volume 1-(1-s)^b at every s)
        from ecu_sbl_aace_datalake_spark.operators import dedup

        for t in (0.3, 0.5, 0.7, 0.9):
            p = dedup.lsh_plan(t, target_recall=0.98)
            assert p["rows"] >= 2, p
        # explicit opt-in still works
        p1 = dedup.lsh_plan(0.5, target_recall=0.98, min_rows=1)
        assert p1["rows"] == 1 and p1["num_hashes"] < 10

    def test_max_fp_hard_constraint(self):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        p = dedup.lsh_plan(0.8, target_recall=0.95, max_fp=0.05)
        assert p["fp_at_low"] <= 0.05
        assert p["recall_at_threshold"] >= 0.95
        with pytest.raises(ValueError, match="no .* plan"):
            dedup.lsh_plan(0.5, target_recall=0.98, max_fp=0.01,
                           max_hashes=64)


class TestIvfArrowEquivalence:
    def test_arrow_bit_identical_to_expr(self, spark, sf_dir):
        # assign="arrow" replays the fold family's per-dim IEEE order;
        # results (ids, order, 6dp scores) must be IDENTICAL
        from ecu_sbl_aace_datalake_spark.operators import similarity
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        cents = similarity.kmeans_fit_exact(
            emb, k=8, max_iter=2, train_sample=256
        )
        q = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        a = similarity.ivf_topk(emb, q, cents, k=10, n_probe=3)
        b = similarity.ivf_topk(
            emb, q, cents, k=10, n_probe=3, assign="arrow"
        )
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )

    def test_arrow_handles_null_vectors(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import similarity

        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, None), (4, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        q = spark.createDataFrame(
            [(100, [1.0, 0.05])], "query_id long, embedding array<double>"
        )
        cents = [[1.0, 0.0], [0.0, 1.0]]
        out = similarity.ivf_topk(
            corpus, q, cents, k=2, n_probe=1, assign="arrow"
        ).collect()
        assert [r.vec_id for r in out] == [1, 2]


class TestQualityCutF1:
    def test_tuned_equals_manual_at_chosen_cut(self, spark, sf_dir):
        # prepare_corpus(quality_cut="f1") must admit EXACTLY the set a
        # manual classifier_floor run admits at the sweep's argmax-F1 cut
        from ecu_sbl_aace_datalake_spark.operators import (
            classifier, pipeline,
        )
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "source"
        )
        # replicate the pipeline's OWN sweep population (lang-kept docs,
        # heuristic label at min_quality) to derive the expected cut —
        # the oracled quality_cut_f1 query sweeps the raw table (the
        # gate_threshold_sweep pairing), which may pick a different
        # argmax on another fixture
        from ecu_sbl_aace_datalake_spark.operators import ml, textstats

        scored = textstats.with_quality_score(
            textstats.with_lang_id(docs, "text"), "text"
        )
        pop = scored.where(F.col("lang_pred") == "en")
        sc = classifier.classifier_scores(
            pop, classifier.WEIGHTS_QUALITY_V1
        )
        lab = pop.select(
            "doc_id", (F.col("quality_score") >= 0.5).alias("__label")
        )
        chosen = (
            ml.threshold_sweep(sc.join(lab, "doc_id"), "clf_score",
                               "__label", n_bins=10)
            .where(F.col("f1").isNotNull())
            .orderBy(F.col("f1").desc(), F.col("threshold").asc())
            .limit(1)
            .collect()[0]["threshold"]
        )
        tuned = pipeline.prepare_corpus(
            docs, pack_budget=512, neardup_bands=32,
            classifier_weights=classifier.WEIGHTS_QUALITY_V1,
            quality_cut="f1",
        )
        manual = pipeline.prepare_corpus(
            docs, pack_budget=512, neardup_bands=32,
            classifier_weights=classifier.WEIGHTS_QUALITY_V1,
            classifier_floor=float(chosen),
        )
        assert sorted(r.doc_id for r in tuned.select("doc_id").collect()) \
            == sorted(r.doc_id for r in manual.select("doc_id").collect())

    def test_quality_cut_requires_weights(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.operators import pipeline
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "source"
        )
        with pytest.raises(ValueError, match="classifier_weights"):
            pipeline.prepare_corpus(docs, quality_cut="f1")
        with pytest.raises(ValueError, match="quality_cut"):
            pipeline.prepare_corpus(docs, quality_cut="nope")

    def test_corpus_card_surfaces_cut(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.operators import pipeline
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        card = pipeline.corpus_card(docs, clf_cut=0.3).collect()[0]
        assert card.clf_cut == pytest.approx(0.3)
        plain = pipeline.corpus_card(docs)
        assert "clf_cut" not in plain.columns


class TestUrlDoorOrdering:
    def test_url_door_runs_before_lang_gate(self, spark):
        # doc 1 (non-en) and doc 2 (en) share a canonical URL. URL door
        # FIRST keeps doc 1 (smaller id, kills doc 2), then the lang
        # gate kills doc 1 -> NEITHER survives. A lang-first pipeline
        # would keep doc 2 — this asserts the streaming-parity order.
        from ecu_sbl_aace_datalake_spark.operators import pipeline

        en = ("the quick brown fox jumps over the lazy dog and the cat "
              "watches it happen every day in the garden for hours " * 3)
        es = ("el perro y el gato que corren por la casa con los "
              "amigos en un dia de sol por la tarde " * 3)
        ctrl = ("this is a completely different english control document "
                "about spark plans and parquet readers that survives " * 3)
        rows = [
            (1, es, "s1", "https://same.com/page"),
            (2, en, "s1", "https://same.com/page"),
            (3, ctrl, "s1", "https://other.com/x"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string, url string"
        )
        out = pipeline.prepare_corpus(
            df, pack_budget=512, neardup_bands=32, url_col="url"
        )
        assert [r.doc_id for r in out.select("doc_id").collect()] == [3]

    def test_url_door_provenance_column(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import pipeline

        en = ("the quick brown fox jumps over the lazy dog while the "
              "farmer and the miller argue about the harvest " * 3)
        other = ("structured streaming reads a source incrementally and "
                 "commits offsets after each micro batch completes " * 3)
        df = spark.createDataFrame(
            [(1, en, "s1", "https://a.com/x"),
             (2, other, "s1", "https://b.com/y")],
            "doc_id long, text string, source string, url string",
        )
        out = pipeline.prepare_corpus(
            df, pack_budget=512, neardup_bands=32, url_col="url"
        )
        assert "canonical_url" in out.columns
        assert out.count() == 2


class TestDunnsTest:
    def test_known_no_ties_example(self, spark):
        # A={1,2,3} B={4,5,6} C={7,8,9}: N=9, mean ranks 2/5/8,
        # sigma2 = N(N+1)/12 = 7.5, z(A,B) = -3/sqrt(7.5*(2/3)) = -1.341641
        import math

        from ecu_sbl_aace_datalake_spark.operators import ml

        rows = [("A", v) for v in (1.0, 2.0, 3.0)] + \
               [("B", v) for v in (4.0, 5.0, 6.0)] + \
               [("C", v) for v in (7.0, 8.0, 9.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {(r.group_a, r.group_b): r
               for r in ml.dunns_test(df, "g", "v").collect()}
        ab = out[("A", "B")]
        assert ab.mean_rank_a == pytest.approx(2.0)
        assert ab.mean_rank_b == pytest.approx(5.0)
        assert ab.z == pytest.approx(-3 / math.sqrt(5.0), abs=1e-6)
        # two-sided p from the exact normal tail
        p_exact = math.erfc(abs(ab.z) / math.sqrt(2.0))
        assert ab.p == pytest.approx(p_exact, abs=1e-6)
        ac = out[("A", "C")]
        assert ac.z == pytest.approx(-6 / math.sqrt(5.0), abs=1e-6)
        # extreme pair is the most significant
        assert ac.rank == 1

    def test_as_polynomial_accuracy(self, spark):
        # p within 2e-7 of math.erfc across a z sweep (A&S 26.2.17 bound)
        import math

        from ecu_sbl_aace_datalake_spark.operators import ml

        rows = []
        # construct groups whose mean-rank gaps sweep a range of z
        for gi in range(6):
            for v in range(10):
                rows.append((f"g{gi}", float(gi * 10 + v)))
        df = spark.createDataFrame(rows, "g string, v double")
        for r in ml.dunns_test(df, "g", "v").collect():
            p_exact = math.erfc(abs(r.z) / math.sqrt(2.0))
            assert r.p == pytest.approx(min(p_exact, 1.0), abs=2e-6)

    def test_bh_rejections_monotone(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        rows = [("A", v) for v in range(10)] + \
               [("B", v + 100) for v in range(10)] + \
               [("C", v + 0.5) for v in range(10)]
        df = spark.createDataFrame(
            [(g, float(v)) for g, v in rows], "g string, v double"
        )
        out = ml.dunns_test(df, "g", "v").collect()
        # rejected set is a prefix of the rank ordering (step-up property)
        rejected_ranks = [r.rank for r in out if r.rejected]
        if rejected_ranks:
            assert rejected_ranks == list(range(1, max(rejected_ranks) + 1))
        # far-separated groups must reject; A vs C overlap must not be
        # the most significant
        by_pair = {(r.group_a, r.group_b): r for r in out}
        assert by_pair[("A", "B")].rejected


class TestDedupHealthReport:
    def test_joined_door_and_cluster_signals(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import pipeline

        log = spark.createDataFrame(
            [(0, "arrived", 10), (0, "in_batch_exact", 8),
             (1, "arrived", 10), (1, "in_batch_exact", 5)],
            "batch_id long, stage string, n_rows long",
        )
        clusters = spark.createDataFrame(
            # cluster 1 = {1,2,3}; cluster 20 = {20,21}
            [(1, 1), (2, 1), (3, 1), (20, 20), (21, 20)],
            "node long, cluster long",
        )
        batch_map = spark.createDataFrame(
            [(i, i % 2) for i in range(1, 25)],
            "doc_id long, batch_id long",
        )
        out = {r.batch_id: r for r in pipeline.dedup_health_report(
            log, clusters, batch_map, dedup_stages=("in_batch_exact",),
            stage_order=("arrived", "in_batch_exact"),
        ).collect()}
        # door side: batch 0 rejects 2/10, batch 1 rejects 5/10
        assert out[0].dedup_reject_rate == pytest.approx(0.2)
        assert out[1].dedup_reject_rate == pytest.approx(0.5)
        # cluster side: batch 1 (odd ids) holds 1,3,21 clustered of 12
        assert out[1].n_docs == 12 and out[1].n_clustered == 3
        assert out[1].clustered_share == pytest.approx(0.25)
        assert out[1].max_cluster_size == 3
        # batch 0 (even ids) holds 2,20 clustered; max touched size 3
        assert out[0].n_clustered == 2
        assert out[0].max_cluster_size == 3


class TestNeardupPlanParity:
    def test_plan_flows_into_corpus_probe(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        base = ("the quick brown fox jumps over the lazy dog near the "
                "river bank every single morning without any fail at all")
        corpus = spark.createDataFrame(
            [(100, base)], "doc_id long, text string"
        )
        batch = spark.createDataFrame(
            [(1, base + " truly"), (2, "unrelated text about adaptive "
              "query execution and broadcast joins in spark runtime")],
            "doc_id long, text string",
        )
        p = dedup.lsh_plan(0.5, target_recall=0.98)
        out_plan = dedup.neardup_dedup_against_corpus(
            batch, corpus, "doc_id", threshold=0.5, plan=p
        )
        out_fixed = dedup.neardup_dedup_against_corpus(
            batch, corpus, "doc_id", threshold=0.5, bands=32
        )
        assert sorted(r.doc_id for r in out_plan.collect()) == sorted(
            r.doc_id for r in out_fixed.collect()
        ) == [2]


class TestCurriculumSchedule:
    def test_linear_pacing_exact_quartiles(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import packing

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 9)], "doc_id long, d double"
        )
        out = {r.doc_id: r.phase for r in packing.curriculum_schedule(
            df, "d", n_phases=4, pacing="linear"
        ).collect()}
        # N=8, linear: phase p admits rank <= 2(p+1)
        assert [out[i] for i in range(1, 9)] == [0, 0, 1, 1, 2, 2, 3, 3]

    def test_sqrt_pacing_front_loads(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import packing

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 101)], "doc_id long, d double"
        )
        lin = {r.doc_id: r.phase for r in packing.curriculum_schedule(
            df, "d", n_phases=4, pacing="linear"
        ).collect()}
        sq = {r.doc_id: r.phase for r in packing.curriculum_schedule(
            df, "d", n_phases=4, pacing="sqrt"
        ).collect()}
        # sqrt competence >= linear competence at every phase, so every
        # doc's first admitting phase can only be earlier
        assert all(sq[i] <= lin[i] for i in lin)
        # N=100 sqrt thresholds: floor(100*sqrt(p/4)) = 50, 70, 86, 100
        assert sq[50] == 0 and sq[51] == 1
        assert sq[70] == 1 and sq[71] == 2
        assert sq[86] == 2 and sq[87] == 3

    def test_ties_break_by_id_and_errors(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import packing

        df = spark.createDataFrame(
            [(2, 1.0), (1, 1.0)], "doc_id long, d double"
        )
        out = {r.doc_id: r.difficulty_rank
               for r in packing.curriculum_schedule(df, "d").collect()}
        assert out == {1: 1, 2: 2}
        with pytest.raises(ValueError, match="pacing"):
            packing.curriculum_schedule(df, "d", pacing="exp")
        with pytest.raises(ValueError, match="n_phases"):
            packing.curriculum_schedule(df, "d", n_phases=0)


class TestWaterfillAllocation:
    def test_hand_example(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        caps = spark.createDataFrame(
            [("a", 1), ("b", 5), ("c", 10)], "src string, cap long"
        )
        out = {r.src: r for r in transform.waterfill_allocation(
            caps, "src", "cap", total_budget=8
        ).collect()}
        # L = 3.5: a keeps 1 (capped), b and c get 3.5
        assert out["a"].allocation == 1.0 and out["a"].capped
        assert out["b"].allocation == 3.5 and not out["b"].capped
        assert out["c"].allocation == 3.5 and not out["c"].capped
        assert out["a"].water_level == 3.5
        total = sum(r.allocation for r in out.values())
        assert total == pytest.approx(8.0)

    def test_budget_exceeds_supply(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        caps = spark.createDataFrame(
            [("a", 3), ("b", 4)], "src string, cap long"
        )
        out = {r.src: r for r in transform.waterfill_allocation(
            caps, "src", "cap", total_budget=100
        ).collect()}
        assert out["a"].allocation == 3.0 and out["a"].capped
        assert out["b"].allocation == 4.0 and out["b"].capped
        assert out["a"].water_level is None

    def test_budget_below_smallest_cap(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        caps = spark.createDataFrame(
            [("a", 50), ("b", 70)], "src string, cap long"
        )
        out = {r.src: r for r in transform.waterfill_allocation(
            caps, "src", "cap", total_budget=10
        ).collect()}
        assert out["a"].allocation == 5.0 and out["b"].allocation == 5.0
        assert not out["a"].capped and not out["b"].capped

    def test_conservation_property(self, spark):
        # sum of allocations == min(budget, sum of caps) on a bigger mix
        from ecu_sbl_aace_datalake_spark.operators import transform

        rows = [(f"s{i}", (i * 37) % 90 + 1) for i in range(17)]
        caps = spark.createDataFrame(rows, "src string, cap long")
        supply = sum(c for _, c in rows)
        for budget in (0, 57, supply // 2, supply, supply + 10):
            got = sum(
                r.allocation
                for r in transform.waterfill_allocation(
                    caps, "src", "cap", total_budget=budget
                ).collect()
            )
            assert got == pytest.approx(min(budget, supply), abs=1e-4), budget

    def test_negative_budget_raises(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        caps = spark.createDataFrame([("a", 1)], "src string, cap long")
        with pytest.raises(ValueError, match="total_budget"):
            transform.waterfill_allocation(caps, "src", "cap", -1)


class TestNeardupPairStats:
    def test_subset_pair_direction(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        full = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lambda mu nu xi omicron pi rho sigma tau upsilon")
        frag = "alpha beta gamma delta epsilon zeta eta theta"
        df = spark.createDataFrame(
            [(1, full), (2, frag)], "doc_id long, text string"
        )
        sh = dedup.shingle_hashes(df, "text", n=3)
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        r = dedup.neardup_pair_stats(pairs, sh, "doc_id").collect()[0]
        # frag's 6 trigrams all inside full's 18
        assert r.size_a == 18 and r.size_b == 6
        assert r.containment_b == 1.0
        assert r.containment_a == pytest.approx(6 / 18, abs=1e-6)
        assert r.jaccard == pytest.approx(6 / 18, abs=1e-6)
        assert r.keep_hint == "a"  # keep the superset (doc 1)

    def test_symmetric_pair_is_either(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        t = ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lambda mu nu xi omicron pi rho sigma tau upsilon")
        df = spark.createDataFrame(
            [(1, t), (2, t + " phi")], "doc_id long, text string"
        )
        sh = dedup.shingle_hashes(df, "text", n=3)
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        r = dedup.neardup_pair_stats(pairs, sh, "doc_id").collect()[0]
        # 18 shared trigrams of 18 / 19: both containments >= 0.9
        assert r.containment_a == 1.0
        assert r.containment_b == pytest.approx(18 / 19, abs=1e-6)
        assert r.keep_hint == "either"


class TestCodeStructureStats:
    def test_code_doc_flagged_prose_not(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import textstats

        code = ("```\ndef add(aVal, bVal):\n    total = aVal + bVal;\n"
                "    return total;\n```")
        prose = ("The quick brown fox jumps over the lazy dog while the "
                 "miller watches from https://example.com in the morning.")
        df = spark.createDataFrame(
            [(1, code), (2, prose)], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in textstats.code_structure_stats(
            df
        ).collect()}
        c, p = out[1], out[2]
        assert c.is_code and not p.is_code
        assert c.fence_blocks == 1 and p.fence_blocks == 0
        assert c.indent_ratio == pytest.approx(2 / 5)
        assert c.semicolon_ratio == pytest.approx(2 / 5)
        assert c.camel_tokens == 4  # aVal, bVal (x2 uses each)
        assert p.n_urls == 1
        assert p.code_score < 0.3 < c.code_score

    def test_empty_and_null_text(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import textstats

        df = spark.createDataFrame(
            [(1, ""), (2, None)], "doc_id long, text string"
        )
        rows = textstats.code_structure_stats(df).collect()
        for r in rows:
            assert r.code_score == 0.0 and not r.is_code


class TestLangIdMargin:
    def test_margin_and_reject(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.operators import classifier
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents").limit(50)
        base = {r.doc_id: r for r in classifier.lang_id_nb_margin(
            docs, classifier.LANG_NB_V2
        ).collect()}
        plain = {r.doc_id: r.lang_pred for r in classifier.lang_id_nb(
            docs, classifier.LANG_NB_V2
        ).collect()}
        # without a reject cut the argmax must equal lang_id_nb exactly
        assert {k: v.lang_pred for k, v in base.items()} == plain
        assert all(
            v.margin_per_gram is None or v.margin_per_gram >= 0
            for v in base.values()
        )
        # an absurd cut routes every margin-bearing doc to 'und'
        gated = {r.doc_id: r.lang_pred for r in classifier.lang_id_nb_margin(
            docs, classifier.LANG_NB_V2, und_below=1e9
        ).collect()}
        for k, v in base.items():
            if v.margin_per_gram is not None:
                assert gated[k] == "und"

    def test_empty_text_null_margin(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import classifier

        df = spark.createDataFrame(
            [(1, ""), (2, "the quick brown fox and the lazy dog again")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in classifier.lang_id_nb_margin(
            df, classifier.LANG_NB_V2, und_below=0.0001
        ).collect()}
        assert out[1].margin_per_gram is None
        assert out[1].lang_pred != "und"  # no evidence != low confidence
        assert out[2].margin_per_gram is not None
