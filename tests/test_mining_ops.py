"""Unit tests for similarity.hard_negatives (contrastive negative mining)
and similarity.margin_pairs (LASER/CCMatrix margin-based pair mining)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ecu_sbl_aace_datalake_spark.operators import similarity


def _vdf(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestHardNegatives:
    def test_band_and_ranking(self, spark):
        # anchor along +x; candidates at controlled cosines
        rows = [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.001]),    # cos ~1.0 — above ceiling, excluded
            (2, [1.0, 0.5]),      # cos ~0.894 — hard negative
            (3, [1.0, 1.0]),      # cos ~0.707 — hard negative
            (4, [0.0, 1.0]),      # cos 0 — below floor, excluded
            (5, [-1.0, 0.0]),     # cos -1 — excluded
        ]
        df = _vdf(spark, rows)
        anchors = df.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("anchor_id"), "embedding"
        )
        got = similarity.hard_negatives(
            df, anchors, k=5, sim_floor=0.3, sim_ceiling=0.95
        ).collect()
        ids = [r.vec_id for r in sorted(got, key=lambda r: r.rank)]
        assert ids == [2, 3]
        assert got[0].score < 0.95 and got[-1].score >= 0.3

    def test_self_excluded_and_k_cap(self, spark):
        rows = [(i, [1.0, float(i) / 10]) for i in range(8)]
        df = _vdf(spark, rows)
        anchors = df.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("anchor_id"), "embedding"
        )
        got = similarity.hard_negatives(
            df, anchors, k=3, sim_floor=-1.0, sim_ceiling=2.0
        ).collect()
        assert len(got) == 3 and all(r.vec_id != 0 for r in got)


class TestMarginPairs:
    def test_mutual_translation_pair_mined(self, spark):
        # x0/y0 are near-identical (a "translation pair"); y9 is a hub
        # close to everything — margin normalization must not mine it
        import math

        def ring(i, n=8, r=1.0):
            a = 2 * math.pi * i / n
            return [r * math.cos(a), r * math.sin(a), 0.0]

        x = _vdf(spark, [(0, [1.0, 0.0, 0.2])] + [
            (i, ring(i)) for i in range(1, 5)
        ])
        y = _vdf(spark, [(100, [1.0, 0.01, 0.2])] + [
            (100 + i, ring(i, r=0.9)) for i in range(1, 5)
        ] + [(109, [0.0, 0.0, 1.0])])
        got = similarity.margin_pairs(x, y, k=2, threshold=1.0).collect()
        mined = {(r.x_id, r.y_id) for r in got}
        assert (0, 100) in mined
        for r in got:
            assert r.margin >= 1.0

    def test_mutuality_enforced(self, spark):
        # y has one vector that is x1's best match, but y's best match
        # is x0 — with mutual=True the (x1, y) pair must not survive
        x = _vdf(spark, [(0, [1.0, 0.0]), (1, [0.9, 0.4])])
        y = _vdf(spark, [(10, [1.0, 0.05])])
        mutual = similarity.margin_pairs(x, y, k=1, threshold=0.0)
        got = {(r.x_id, r.y_id) for r in mutual.collect()}
        assert got == {(0, 10)}
        loose = similarity.margin_pairs(x, y, k=1, threshold=0.0, mutual=False)
        got2 = {(r.x_id, r.y_id) for r in loose.collect()}
        assert got2 == {(0, 10), (1, 10)}

    def test_scope_pins_the_pair_scan(self, spark):
        from ecu_sbl_aace_datalake_spark.caching import CacheScope

        x = _vdf(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
        y = _vdf(spark, [(10, [1.0, 0.1])])
        scope = CacheScope()
        similarity.margin_pairs(x, y, k=1, scope=scope).collect()
        assert len(scope) == 1
        scope.unpersist()
