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
