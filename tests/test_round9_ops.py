"""Round-9 operator tests: ANN candidate pools for margin_pairs /
hard_negatives (VERDICT r8 item #1 — retiring the repo's only exact
quadratic pair-scan at scale)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _vec(seed: int, dim: int = 8, bump: int | None = None) -> list[float]:
    # deterministic pseudo-vectors; bump makes near-duplicates
    base = [((seed * 31 + i * 17) % 13) - 6.0 for i in range(dim)]
    if bump is not None:
        base[bump % dim] += 0.25
    return base


class TestMarginPairsCandidates:
    def _sides(self, spark):
        rows_x = [(i, _vec(i)) for i in range(0, 20, 2)]
        rows_y = [(i + 1, _vec(i, bump=i)) for i in range(0, 20, 2)]
        x = spark.createDataFrame(rows_x, "vec_id long, embedding array<double>")
        y = spark.createDataFrame(rows_y, "vec_id long, embedding array<double>")
        return x, y

    def test_full_candidate_pool_equals_exact(self, spark):
        # candidates = the complete cross product → identical output to
        # the exact pair-scan (the margin logic downstream is shared)
        from ecu_sbl_aace_datalake_spark.operators import similarity

        x, y = self._sides(spark)
        exact = similarity.margin_pairs(x, y, k=3, threshold=1.0).collect()
        full_pool = x.select(F.col("vec_id").alias("x_id")).crossJoin(
            y.select(F.col("vec_id").alias("y_id"))
        )
        pooled = similarity.margin_pairs(
            x, y, k=3, threshold=1.0, candidates=full_pool
        ).collect()
        key = lambda r: (r.x_id, r.y_id)  # noqa: E731
        assert sorted(map(tuple, exact)) == sorted(map(tuple, pooled))
        assert len(exact) > 0  # non-vacuous
        assert len({key(r) for r in exact}) == len(exact)

    def test_candidates_path_has_no_cross_join(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import similarity

        x, y = self._sides(spark)
        pool = spark.createDataFrame(
            [(0, 1), (0, 3), (2, 1), (2, 3)], "x_id long, y_id long"
        )
        out = similarity.margin_pairs(x, y, k=2, candidates=pool)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "Join Cross" not in plan, plan
        physical = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in physical, physical
        assert "BroadcastNestedLoopJoin" not in physical, physical

    def test_restricted_pool_restricts_pairs(self, spark):
        # pairs outside the candidate pool can never be mined
        from ecu_sbl_aace_datalake_spark.operators import similarity

        x, y = self._sides(spark)
        pool = spark.createDataFrame(
            [(0, 1), (0, 3), (2, 3), (4, 5)], "x_id long, y_id long"
        )
        got = similarity.margin_pairs(
            x, y, k=2, threshold=0.0, candidates=pool
        ).collect()
        allowed = {(0, 1), (0, 3), (2, 3), (4, 5)}
        assert got and all((r.x_id, r.y_id) in allowed for r in got)

    def test_pooled_composition_mines_planted_pairs(self, spark):
        # each y_i is a bumped copy of x_i: the IVF-pooled composition
        # must mine every (i, i+1) translation pair the exact path finds
        from ecu_sbl_aace_datalake_spark.operators import similarity

        x, y = self._sides(spark)
        cents = [_vec(100), _vec(101), _vec(102)]
        exact = {
            (r.x_id, r.y_id)
            for r in similarity.margin_pairs(
                x, y, k=3, threshold=1.0
            ).collect()
        }
        pooled = {
            (r.x_id, r.y_id)
            for r in similarity.margin_pairs_pooled(
                x, y, cents, k=3, threshold=1.0, top_m=6, n_probe=3
            ).collect()
        }
        # ANN pool is a superset-probe approximation: with n_probe =
        # n_clusters the probe is exhaustive, so recall here is exact
        assert pooled == exact and len(pooled) > 0


class TestHardNegativesCandidates:
    def _data(self, spark):
        corpus = spark.createDataFrame(
            [(i, _vec(i)) for i in range(24)],
            "vec_id long, embedding array<double>",
        )
        anchors = spark.createDataFrame(
            [(100 + i, _vec(i, bump=2)) for i in range(3)],
            "anchor_id long, embedding array<double>",
        )
        return corpus, anchors

    def test_full_candidates_equal_default(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import similarity

        corpus, anchors = self._data(spark)
        base = similarity.hard_negatives(
            corpus, anchors, k=4, sim_floor=0.1, sim_ceiling=0.95
        ).collect()
        full = anchors.select("anchor_id").crossJoin(corpus.select("vec_id"))
        pooled = similarity.hard_negatives(
            corpus,
            anchors,
            k=4,
            sim_floor=0.1,
            sim_ceiling=0.95,
            candidates=full,
        ).collect()
        assert sorted(map(tuple, base)) == sorted(map(tuple, pooled))
        assert len(base) > 0

    def test_candidates_prune_and_no_cross_join(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import similarity

        corpus, anchors = self._data(spark)
        pool = spark.createDataFrame(
            [(100, 1), (100, 2), (101, 3)], "anchor_id long, vec_id long"
        )
        out = similarity.hard_negatives(
            corpus, anchors, k=4, sim_floor=-1.0, sim_ceiling=2.0,
            candidates=pool,
        )
        physical = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in physical
        assert "BroadcastNestedLoopJoin" not in physical
        got = {(r.anchor_id, r.vec_id) for r in out.collect()}
        assert got == {(100, 1), (100, 2), (101, 3)}, got


class TestLicenseSimilarity:
    def test_reflowed_mit_caught_ladder_misses(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import compliance
        from ecu_sbl_aace_datalake_spark.plans.driver_queries import (
            _MIT_PARAPHRASE as reflowed,
        )

        df = spark.createDataFrame(
            [(1, reflowed), (2, "just a plain document about birds")],
            "doc_id long, text string",
        )
        # ladder misses the paraphrase
        tagged = compliance.tag_licenses(df).collect()
        lad = {r.doc_id: r.license_id for r in tagged}
        assert lad[1] is None and lad[2] is None
        # similarity matcher catches it
        sim = {r.doc_id: r for r in
               compliance.license_similarity(df).collect()}
        assert sim[1].sim_license == "MIT" and sim[1].sim_score >= 0.5
        assert sim[2].sim_license is None

    def test_verbatim_bodies_match_their_license(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import compliance

        rows = [(i, t) for i, (_, t) in
                enumerate(compliance.LICENSE_CORPUS.items())]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r.sim_license for r in
               compliance.license_similarity(df).collect()}
        for i, lid in enumerate(compliance.LICENSE_CORPUS):
            assert got[i] == lid, (lid, got)

    def test_zero_shuffle_plan(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import compliance

        df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
        plan = (
            compliance.license_similarity(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan


class TestCapPerLanguage:
    def test_per_group_budget_map(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        rows = [(i, "en" if i < 10 else "de", 100) for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, g string, b long")
        kept = transform.cap_per_group_bytes_map(
            df, "g", "b", {"en": 300, "de": 1000}, "doc_id"
        ).collect()
        by_g = {}
        for r in kept:
            by_g.setdefault(r.g, []).append(r.doc_id)
        # en: 300 bytes / 100 each -> exactly 3 admitted; de: all 10 fit
        assert len(by_g["en"]) == 3 and len(by_g["de"]) == 10
        # prefix replay: same salt/ids -> same kept set
        again = transform.cap_per_group_bytes_map(
            df, "g", "b", {"en": 300, "de": 1000}, "doc_id"
        ).collect()
        assert sorted(map(tuple, kept)) == sorted(map(tuple, again))

    def test_default_none_is_unlimited_and_nulls_rejected(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        df = spark.createDataFrame(
            [(1, "x", 50), (2, "x", None), (3, "y", 10)],
            "doc_id long, g string, b long",
        )
        kept = sorted(
            r.doc_id
            for r in transform.cap_per_group_bytes_map(
                df, "g", "b", {"y": 0}, "doc_id", default_budget=None
            ).collect()
        )
        # x unlimited (but NULL bytes rejected); y budget 0 drops row 3
        assert kept == [1], kept

    def test_language_composition(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import pipeline

        df = spark.createDataFrame(
            [(i, "the quick brown fox jumps over the lazy dog " * 3)
             for i in range(12)],
            "doc_id long, text string",
        )
        kept = pipeline.cap_per_language(
            df, {"en": 300}, default_budget=None
        )
        rows = kept.collect()
        assert "lang_pred" in kept.columns
        got_bytes = sum(len(r.text.encode()) for r in rows
                        if r.lang_pred == "en")
        assert got_bytes <= 300


class TestPiiKAnonymity:
    def test_rare_and_colinked(self, spark):
        from ecu_sbl_aace_datalake_spark.functions import redact

        rows = [
            (1, "mail a@x.com and b@x.com"),        # shared-a + rare-b
            (2, "mail a@x.com call 202-555-0001"),  # shared-a + phone
            (3, "mail a@x.com"),
            (4, "mail a@x.com"),
            (5, "mail a@x.com"),                    # a@x.com df=5 -> safe
            (6, "mail c@x.com call 202-555-0001"),  # rare email + phone
            (7, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        rep = {r.pii_type: r
               for r in redact.pii_k_anonymity(df, k=5).collect()}
        em = rep["email"]
        assert em.n_values == 3           # a, b, c
        assert em.n_rare_values == 2      # b (df 1), c (df 1)
        assert em.n_docs_with_type == 6
        assert em.n_docs_with_rare == 2   # docs 1, 6
        assert em.n_docs_colinked == 1    # doc 6 (rare email + phone)
        ph = rep["phone"]
        assert ph.n_values == 1 and ph.n_rare_values == 1
        assert ph.n_docs_colinked == 2    # docs 2 and 6 carry email too

    def test_extraction_mirrors_redaction_chain(self, spark):
        from ecu_sbl_aace_datalake_spark.functions import redact

        # the digits inside the email must NOT also count as a phone:
        # extraction runs over progressively-redacted text
        df = spark.createDataFrame(
            [(1, "x 123-456-7890@example.com y")], "doc_id long, text string"
        )
        vals = redact.pii_values(df).collect()
        types = sorted(v.pii_type for v in vals)
        assert types == ["email"], vals


class TestFormatAwarePack:
    def _counted(self, spark):
        rows = [(i, "s", 100) for i in range(10)]
        return spark.createDataFrame(
            rows, "doc_id long, source string, n_tokens int"
        )

    def test_chat_overhead_charged(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import packing

        df = self._counted(spark)
        # plain capacity 512: five 100-token docs per pack; chat charges
        # 100+8 per doc against 510 -> only four per pack
        packed = packing.format_aware_pack(df, budget=512, template="chat")
        sizes = {}
        for r in packed.collect():
            sizes[r.pack_id] = sizes.get(r.pack_id, 0) + 1
        assert max(sizes.values()) == 4, sizes
        assert all(r.n_tokens_fmt == 108 for r in packed.collect())

    def test_oversize_drop_vs_singleton(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import packing

        df = spark.createDataFrame(
            [(1, "s", 600), (2, "s", 10)],
            "doc_id long, source string, n_tokens int",
        )
        kept = packing.format_aware_pack(
            df, budget=512, template="fim", oversize="drop"
        ).collect()
        assert [r.doc_id for r in kept] == [2]
        both = packing.format_aware_pack(
            df, budget=512, template="fim", oversize="singleton"
        ).collect()
        assert len(both) == 2
        assert len({r.pack_id for r in both}) == 2  # oversized isolated

    def test_bad_args_raise(self, spark):
        import pytest

        from ecu_sbl_aace_datalake_spark.operators import packing

        df = self._counted(spark)
        with pytest.raises(ValueError):
            packing.format_aware_pack(df, budget=512, template="nope")
        with pytest.raises(ValueError):
            packing.format_aware_pack(df, budget=9, template="chat")


class TestTokenizerFertility:
    def test_group_rollup(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import bpe

        df = spark.createDataFrame(
            [(1, "en", "aa bb"), (2, "en", "aa"), (3, "zz", None)],
            "doc_id long, lang string, text string",
        )
        got = {r.lang: r for r in bpe.tokenizer_fertility(
            df, bpe.MERGES_DOCS_BYTES_V1, byte_level=True
        ).collect()}
        en = got["en"]
        assert en.n_docs == 2 and en.n_words == 3
        assert en.n_tokens >= en.n_words  # subwords never fewer than words
        assert abs(en.fertility - en.n_tokens / en.n_words) < 1e-9
        # null-text group: zero words/tokens, NULL ratios (0/0)
        zz = got["zz"]
        assert zz.n_words == 0 and zz.n_tokens == 0
        assert zz.fertility is None and zz.bytes_per_token is None


class TestTruncationReport:
    def test_losses(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import packing

        df = spark.createDataFrame(
            [(1, 10), (2, 100), (3, 300)], "doc_id long, n_tokens int"
        )
        got = {r.budget: r for r in packing.truncation_report(
            df, [64, 256]
        ).collect()}
        b64 = got[64]
        assert b64.n_over == 2 and b64.tokens_total == 410
        assert b64.tokens_lost_truncate == (100 - 64) + (300 - 64)
        assert b64.tokens_lost_drop == 400
        b256 = got[256]
        assert b256.n_over == 1
        assert b256.tokens_lost_truncate == 44
        assert b256.tokens_lost_drop == 300

    def test_empty_budgets_raise(self, spark):
        import pytest

        from ecu_sbl_aace_datalake_spark.operators import packing

        df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens int")
        with pytest.raises(ValueError):
            packing.truncation_report(df, [])


class TestDupWeightedSample:
    def test_content_equal_mass(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        # cluster {1,2,3} (size 3), cluster {4,5} (size 2), 6 unclustered
        df = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(1, 7)], "doc_id long, text string"
        )
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)], "node long, cluster long"
        )
        out = dedup.dup_weighted_sample(df, clusters, k=6).collect()
        counts = {r.doc_id: r.dup_count for r in out}
        assert counts[1] == counts[2] == counts[3] == 3
        assert counts[4] == counts[5] == 2
        assert counts[6] == 1
        # ranking is deterministic and honors the de-weighting on
        # average: the unclustered doc outranks the triple-cluster docs
        # unless its Gumbel draw is unlucky; with k=6 all rows return,
        # scores strictly ordered
        scores = [r.resample_score for r in out]
        assert scores == sorted(scores, reverse=True)

    def test_determinism(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        df = spark.createDataFrame(
            [(i, "x") for i in range(50)], "doc_id long, text string"
        )
        clusters = spark.createDataFrame(
            [(i, 0) for i in range(25)], "node long, cluster long"
        )
        a = [r.doc_id for r in
             dedup.dup_weighted_sample(df, clusters, k=10).collect()]
        b = [r.doc_id for r in
             dedup.dup_weighted_sample(df, clusters, k=10).collect()]
        assert a == b and len(a) == 10


class TestCalibrationAndKappa:
    def test_calibration_bins(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        rows = [(i, 0.05, 0) for i in range(8)] + [(100 + i, 0.95, 1)
                                                   for i in range(8)]
        rows += [(200, 0.95, 0), (201, 0.05, 1), (202, None, 1),
                 (203, 0.5, None)]
        df = spark.createDataFrame(rows, "id long, s double, y int")
        rep = {r.bin: r for r in
               ml.calibration_report(df, "s", "y", n_bins=10).collect()}
        assert set(rep) == {0, 9}
        lo = rep[0]
        assert lo.n == 9 and abs(lo.mean_score - 0.05) < 1e-9
        assert abs(lo.frac_pos - 1 / 9) < 1e-6
        hi = rep[9]
        assert hi.n == 9 and abs(hi.frac_pos - 8 / 9) < 1e-6
        # perfectly calibrated data -> near-zero gap
        assert abs(hi.abs_gap - abs(hi.mean_score - hi.frac_pos)) < 1e-6
        ece = ml.expected_calibration_error(df, "s", "y", n_bins=10)
        assert 0.0 <= ece <= 1.0

    def test_score_one_lands_in_top_bin(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        df = spark.createDataFrame([(1, 1.0, 1)], "id long, s double, y int")
        rep = ml.calibration_report(df, "s", "y", n_bins=10).collect()
        assert rep[0].bin == 9  # least(floor(10.0), 9)

    def test_kappa_perfect_and_chance(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        perfect = spark.createDataFrame(
            [(True, True)] * 5 + [(False, False)] * 5, "a boolean, b boolean"
        )
        r = ml.cohens_kappa(perfect, "a", "b").collect()[0]
        assert r.kappa == 1.0 and r.p_observed == 1.0

        # statistical independence: agreement = chance -> kappa ~ 0
        chance = spark.createDataFrame(
            [(True, True), (True, False), (False, True), (False, False)],
            "a boolean, b boolean",
        )
        r2 = ml.cohens_kappa(chance, "a", "b").collect()[0]
        assert abs(r2.kappa) < 1e-9 and r2.p_expected == 0.5

    def test_kappa_constant_raters_null(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import ml

        const = spark.createDataFrame(
            [(True, True)] * 4, "a boolean, b boolean"
        )
        r = ml.cohens_kappa(const, "a", "b").collect()[0]
        assert r.kappa is None and r.p_expected == 1.0


class TestPackAttentionStats:
    def test_closed_form(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import packing

        packed = spark.createDataFrame(
            [(1, "s", 10, 0), (2, "s", 20, 0), (3, "s", 30, 1)],
            "doc_id long, source string, n_tokens int, pack_id long",
        )
        got = {r.pack_id: r for r in
               packing.pack_attention_stats(packed).collect()}
        p0 = got[0]
        assert p0.seq_tokens == 30
        assert p0.total_causal_pairs == 30 * 31 // 2
        within = 10 * 11 // 2 + 20 * 21 // 2
        assert p0.cross_doc_pairs == 30 * 31 // 2 - within
        # frac_cross is 6dp-rounded
        assert abs(p0.frac_cross
                   - p0.cross_doc_pairs / p0.total_causal_pairs) < 5e-7
        # single-doc pack: zero contamination
        p1 = got[1]
        assert p1.cross_doc_pairs == 0 and p1.frac_cross == 0.0

    def test_zero_token_pack(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import packing

        packed = spark.createDataFrame(
            [(1, "s", 0, 0)], "doc_id long, source string, n_tokens int, pack_id long"
        )
        r = packing.pack_attention_stats(packed).collect()[0]
        assert r.frac_cross == 0.0 and r.total_causal_pairs == 0
