"""Salting utilities: semantic equivalence to unsalted forms + actual
spreading of a planted hot key."""

from __future__ import annotations

import pyspark.sql.functions as F

from ecu_sbl_aace_datalake_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
    with_salt,
)


def test_salted_join_equals_plain_join(spark, sf_dir):
    from ecu_sbl_aace_datalake_spark.sources.io import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(cust, "o_custkey").select("o_orderkey", "c_mktsegment")
    salted = salted_join(orders, cust, "o_custkey", salt_cols=["o_orderkey"]).select(
        "o_orderkey", "c_mktsegment"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_hot_key_actually_spreads(spark):
    # one key with 1000 rows: salt must spread it over multiple buckets
    rows = [(i, "hot") for i in range(1000)] + [(i + 1000, "cold") for i in range(5)]
    df = spark.createDataFrame(rows, "id long, k string")
    salted = with_salt(df, ["id"], buckets=8)
    spread = (
        salted.where(F.col("k") == "hot").select("__salt").distinct().count()
    )
    assert spread == 8


def test_salted_distinct_count_exact(spark, sf_dir):
    from ecu_sbl_aace_datalake_spark.sources.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    expected = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    got = {
        r.l_returnflag: r.n_distinct
        for r in salted_distinct_count(li, "l_returnflag", "l_partkey").collect()
    }
    assert got == expected


def test_salted_distinct_count_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("g", 1), ("g", None), ("g", 2), ("g", 1), ("h", None)],
        "k string, v int",
    )
    got = {r.k: r.n_distinct for r in salted_distinct_count(df, "k", "v").collect()}
    # exact COUNT(DISTINCT) semantics: nulls ignored, all-null groups kept
    # with count 0 (SQL GROUP BY keeps every group)
    assert got == {"g": 2, "h": 0}


class TestHeavyHittersExact:
    def _zipf(self, spark):
        # value i appears 2^(10-i) times: heavy skew, exact counts known
        rows = [(f"v{i}",) for i in range(10) for _ in range(2 ** (10 - i))]
        return spark.createDataFrame(rows, "token string").repartition(8)

    def test_matches_exact_groupby(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import heavy_hitters_exact

        df = self._zipf(spark)
        out = heavy_hitters_exact(df, "token", k=5, capacity=32).collect()
        assert [(r["token"], r["cnt"], r["rank"]) for r in out] == [
            ("v0", 1024, 1), ("v1", 512, 2), ("v2", 256, 3),
            ("v3", 128, 4), ("v4", 64, 5),
        ]

    def test_strict_raises_when_unprovable(self, spark):
        import pytest as _pytest

        from ecu_sbl_aace_datalake_spark.operators.skew import heavy_hitters_exact

        # near-uniform domain of 50 values, capacity 4: kth count is far
        # below n/(capacity+1) -> cannot be certified
        rows = [(f"u{i:02d}",) for i in range(50) for _ in range(20)]
        df = spark.createDataFrame(rows, "token string").repartition(4)
        with _pytest.raises(ValueError, match="provably exact"):
            heavy_hitters_exact(df, "token", k=5, capacity=4)

    def test_candidate_volume_is_bounded(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import heavy_hitters_exact

        # wide domain + skewed head: top-3 still exact with tiny capacity
        rows = [("hot", )] * 500 + [("warm",)] * 200 + [("mild",)] * 100
        rows += [(f"cold{i}",) for i in range(300)]
        df = spark.createDataFrame(rows, "token string").repartition(6)
        out = heavy_hitters_exact(df, "token", k=3, capacity=16).collect()
        assert [(r["token"], r["cnt"]) for r in out] == [
            ("hot", 500), ("warm", 200), ("mild", 100),
        ]

    def test_nulls_ignored(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import heavy_hitters_exact

        df = spark.createDataFrame(
            [("a",)] * 5 + [(None,)] * 10 + [("b",)] * 3, "token string"
        )
        out = heavy_hitters_exact(df, "token", k=2, capacity=8).collect()
        assert [(r["token"], r["cnt"]) for r in out] == [("a", 5), ("b", 3)]


class TestFrequentPairs:
    def test_support_threshold_and_pruning(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import frequent_pairs

        # items a,b co-occur in 3 baskets; c appears once (pruned)
        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"), (3, "c")]
        df = spark.createDataFrame(rows, "basket long, item string")
        out = frequent_pairs(df, "basket", "item", min_support=3).collect()
        assert [(r["item_a"], r["item_b"], r["pair_count"]) for r in out] == [
            ("a", "b", 3)
        ]

    def test_duplicate_items_in_basket_count_once(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import frequent_pairs

        rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
        df = spark.createDataFrame(rows, "basket long, item string")
        [r] = frequent_pairs(df, "basket", "item", min_support=2).collect()
        assert r["pair_count"] == 2

    def test_broadcast_probe_both_modes(self, spark):
        """Size-probed frequent-item prune: broadcast under the threshold,
        shuffle semi-join above it — the plan must show each mode
        (VERDICT r2 item 5, pagerank probe pattern)."""
        from ecu_sbl_aace_datalake_spark.operators.skew import frequent_pairs
        from ecu_sbl_aace_datalake_spark.plans.inspect import formatted_plan

        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b")]
        df = spark.createDataFrame(rows, "basket long, item string")

        # disable size-based auto-broadcast so the PLAN reflects the
        # operator's own dispatch, not Catalyst's small-table shortcut
        saved = {
            k: spark.conf.get(k, None)
            for k in ("spark.sql.autoBroadcastJoinThreshold",
                      "spark.sql.adaptive.autoBroadcastJoinThreshold")
        }
        try:
            for k in saved:
                spark.conf.set(k, "-1")

            small = frequent_pairs(df, "basket", "item", min_support=2,
                                   broadcast_threshold=1_000_000)
            plan = formatted_plan(small)
            assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
            assert [(r["item_a"], r["item_b"], r["pair_count"])
                    for r in small.collect()] == [("a", "b", 3)]

            big = frequent_pairs(df, "basket", "item", min_support=2,
                                 broadcast_threshold=0)
            plan = formatted_plan(big)
            semi_lines = [ln for ln in plan.splitlines() if "LeftSemi" in ln]
            assert semi_lines and all(
                "Broadcast" not in ln for ln in semi_lines
            )
            assert [(r["item_a"], r["item_b"], r["pair_count"])
                    for r in big.collect()] == [("a", "b", 3)]
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    def test_infrequent_pair_of_frequent_items_dropped(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import frequent_pairs

        # a and b each frequent (3 baskets) but never together
        rows = [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "b")]
        df = spark.createDataFrame(rows, "basket long, item string")
        assert frequent_pairs(df, "basket", "item", min_support=3).count() == 0

    def test_pruned_to_empty_raises_not_silently_empty(self, spark):
        import pytest as _pytest

        from ecu_sbl_aace_datalake_spark.operators.skew import heavy_hitters_exact

        # 300 distinct singletons with capacity 256: MG prunes everything,
        # the candidate set collapses — must raise, never return an
        # "exact" empty/short result
        rows = [(f"x{i:03d}",) for i in range(300)]
        df = spark.createDataFrame(rows, "token string").repartition(2)
        with _pytest.raises(ValueError, match="provably exact"):
            heavy_hitters_exact(df, "token", k=10, capacity=256)


class TestCountMinSketch:
    def _freqs(self, spark):
        rows = [("a",)] * 50 + [("b",)] * 20 + [("c",)] * 5 + [("d",)] * 1
        return spark.createDataFrame(rows, "v string").repartition(4)

    def test_estimate_upper_bounds_true_count(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import (
            cms_estimate,
            count_min_sketch,
        )

        df = self._freqs(spark)
        sk = count_min_sketch(df, "v", width=64, depth=3)
        keys = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("zz",)], "v string")
        est = {r.v: r.est for r in cms_estimate(sk, keys, "v", width=64, depth=3).collect()}
        true = {"a": 50, "b": 20, "c": 5, "d": 1, "zz": 0}
        for k, t in true.items():
            assert est[k] >= t, (k, est[k], t)
        # wide-enough sketch on a 4-value domain: estimates are exact
        sk2 = count_min_sketch(df, "v", width=1024, depth=3)
        est2 = {r.v: r.est for r in cms_estimate(sk2, keys, "v", width=1024, depth=3).collect()}
        assert est2 == true

    def test_merge_equals_rebuild(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import (
            count_min_sketch,
            merge_count_min,
        )

        a = spark.createDataFrame([("x",)] * 7 + [("y",)] * 3, "v string")
        b = spark.createDataFrame([("x",)] * 2 + [("z",)] * 5, "v string")
        merged = merge_count_min(
            count_min_sketch(a, "v", width=32, depth=2),
            count_min_sketch(b, "v", width=32, depth=2),
        )
        rebuilt = count_min_sketch(a.unionByName(b), "v", width=32, depth=2)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, rebuilt.collect())
        )

    def test_nulls_not_counted_and_sketch_size_bounded(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import count_min_sketch

        df = spark.createDataFrame([("x",), (None,), (None,)], "v string")
        sk = count_min_sketch(df, "v", width=16, depth=4).collect()
        assert sum(r.cnt for r in sk) == 4  # 1 non-null row x depth
        assert len(sk) <= 16 * 4


class TestHistogramSketch:
    def test_quantiles_within_bin_width(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import (
            histogram_sketch,
            quantile_estimate,
        )

        df = spark.range(1, 1001).select((F.col("id") * 1.0).alias("v"))
        sk = histogram_sketch(df, "v", lo=0.0, hi=1000.0, bins=100)
        est = {
            r.q: r.est
            for r in quantile_estimate(sk, [0.1, 0.5, 0.9], 0.0, 1000.0, 100).collect()
        }
        for q, e in est.items():
            assert abs(e - q * 1000) <= 10 + 1e-9, (q, e)

    def test_clamping_and_nulls(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import histogram_sketch

        df = spark.createDataFrame(
            [(-5.0,), (0.5,), (99.0,), (250.0,), (None,)], "v double"
        )
        rows = {r.bin: r.cnt for r in histogram_sketch(df, "v", 0.0, 100.0, 10).collect()}
        assert rows == {0: 2, 9: 2}  # -5 clamps to bin 0, 250 to bin 9; null skipped

    def test_merge_equals_rebuild(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import (
            histogram_sketch,
            merge_histograms,
        )

        a = spark.range(0, 500).select((F.col("id") * 1.0).alias("v"))
        b = spark.range(500, 1000).select((F.col("id") * 1.0).alias("v"))
        merged = merge_histograms(
            histogram_sketch(a, "v", 0.0, 1000.0, 32),
            histogram_sketch(b, "v", 0.0, 1000.0, 32),
        )
        rebuilt = histogram_sketch(a.unionByName(b), "v", 0.0, 1000.0, 32)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, rebuilt.collect())
        )

    def test_bad_bounds_raise(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import histogram_sketch
        import pytest as _pytest

        df = spark.createDataFrame([(1.0,)], "v double")
        with _pytest.raises(ValueError):
            histogram_sketch(df, "v", 10.0, 10.0, 8)


class TestNegativeSamplesRing:
    def test_deterministic_k_negatives_no_self(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.transform import (
            negative_samples_ring,
        )

        df = spark.range(100).select(F.col("id").alias("doc_id"))
        a = sorted(map(tuple, negative_samples_ring(df, "doc_id", k=3, n_buckets=8).collect()))
        b = sorted(map(tuple, negative_samples_ring(df, "doc_id", k=3, n_buckets=8).collect()))
        assert a == b  # reproducible
        assert all(x != y for x, y in a)  # never self
        from collections import Counter

        per_doc = Counter(x for x, _ in a)
        assert set(per_doc) == set(range(100))
        assert all(c <= 3 for c in per_doc.values())
        assert sum(per_doc.values()) >= 250  # most docs get all 3

    def test_seed_changes_pairs(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.transform import (
            negative_samples_ring,
        )

        df = spark.range(50).select(F.col("id").alias("doc_id"))
        a = set(map(tuple, negative_samples_ring(df, "doc_id", k=2, seed=1).collect()))
        b = set(map(tuple, negative_samples_ring(df, "doc_id", k=2, seed=2).collect()))
        assert a != b

    def test_tiny_buckets(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.transform import (
            negative_samples_ring,
        )

        df = spark.range(2).select(F.col("id").alias("doc_id"))
        out = negative_samples_ring(df, "doc_id", k=3, n_buckets=1).collect()
        # 2-id ring: each gets exactly the other, once (duplicates collapse)
        assert sorted((r.doc_id, r.neg_id) for r in out) == [(0, 1), (1, 0)]


class TestCmsJoinSize:
    def test_upper_bound_and_tightness(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import (
            cms_join_size_estimate,
            count_min_sketch,
        )

        a = spark.createDataFrame(
            [("k%d" % (i % 10),) for i in range(100)], "k string"
        )
        b = spark.createDataFrame(
            [("k%d" % (i % 5),) for i in range(50)], "k string"
        )
        # true join size: keys k0..k4 appear 10x in a, 10x in b -> 5*10*10
        true = a.join(b, "k").count()
        assert true == 500
        for width, depth in ((8, 3), (4096, 3)):
            ska = count_min_sketch(a, "k", width=width, depth=depth)
            skb = count_min_sketch(b, "k", width=width, depth=depth)
            est = cms_join_size_estimate(ska, skb).first().est
            assert est >= true, (width, est)
            if width == 4096:  # collision-free at this domain size
                assert est == true

    def test_disjoint_keys_estimate_small(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import (
            cms_join_size_estimate,
            count_min_sketch,
        )

        a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "k string")
        b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "k string")
        ska = count_min_sketch(a, "k", width=4096, depth=3)
        skb = count_min_sketch(b, "k", width=4096, depth=3)
        est = cms_join_size_estimate(ska, skb).first().est
        # no shared keys: estimate is collision noise only
        assert est is None or est <= 3


class TestGroupedHistogramQuantiles:
    def test_per_group_quantiles_within_bin(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import (
            histogram_sketch_grouped,
            quantile_estimate_grouped,
        )

        rows = [("a", float(i)) for i in range(1, 101)] + [
            ("b", float(i * 10)) for i in range(1, 101)
        ]
        df = spark.createDataFrame(rows, "k string, v double")
        sk = histogram_sketch_grouped(df, ["k"], "v", 0.0, 1000.0, 100)
        est = {
            (r.k, r.q): r.est
            for r in quantile_estimate_grouped(sk, ["k"], [0.5, 0.9], 0.0, 1000.0, 100).collect()
        }
        assert abs(est[("a", 0.5)] - 50) <= 10
        assert abs(est[("b", 0.5)] - 500) <= 10
        assert abs(est[("b", 0.9)] - 900) <= 10

    def test_grouped_merge_equals_rebuild(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import (
            histogram_sketch_grouped,
        )

        a = spark.createDataFrame([("x", 1.0), ("y", 2.0)], "k string, v double")
        b = spark.createDataFrame([("x", 3.0)], "k string, v double")
        merged = (
            histogram_sketch_grouped(a, ["k"], "v", 0.0, 10.0, 5)
            .unionByName(histogram_sketch_grouped(b, ["k"], "v", 0.0, 10.0, 5))
            .groupBy("k", "bin")
            .agg(F.sum("cnt").alias("cnt"))
        )
        rebuilt = histogram_sketch_grouped(a.unionByName(b), ["k"], "v", 0.0, 10.0, 5)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, rebuilt.collect())
        )


class TestParetoFrontier:
    def test_hand_points(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.transform import (
            pareto_frontier_2d,
        )

        # minimize x, maximize y
        pts = [
            (1, 1.0, 10),  # frontier (cheapest)
            (2, 2.0, 10),  # dominated by 1 (same y, higher x)
            (3, 2.0, 20),  # frontier
            (4, 3.0, 15),  # dominated by 3
            (5, 4.0, 25),  # frontier
            (6, 4.0, 25),  # identical duplicate -> also survives
        ]
        df = spark.createDataFrame(pts, "id long, x double, y long")
        got = sorted(r.id for r in pareto_frontier_2d(df, "x", "y").collect())
        assert got == [1, 3, 5, 6]

    def test_nulls_dropped(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.transform import (
            pareto_frontier_2d,
        )

        df = spark.createDataFrame(
            [(1, None, 5), (2, 1.0, None), (3, 1.0, 5)], "id long, x double, y long"
        )
        got = [r.id for r in pareto_frontier_2d(df, "x", "y").collect()]
        assert got == [3]


class TestAssociationRules:
    def test_hand_baskets(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.skew import association_rules

        # 4 baskets; {a,b} in 3, {a} alone in 1
        rows = [
            (1, "a"), (1, "b"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "b"),
            (4, "a"),
        ]
        df = spark.createDataFrame(rows, "b long, i string")
        got = {
            (r.antecedent, r.consequent): (r.pair_count, r.support, r.confidence, r.lift)
            for r in association_rules(df, "b", "i", min_support=2).collect()
        }
        # support 3/4; conf a->b = 3/4, lift = (3/4)/(3/4) = 1.0
        assert got[("a", "b")] == (3, 0.75, 0.75, 1.0)
        # conf b->a = 3/3 = 1.0, lift = 1/(4/4) = 1.0
        assert got[("b", "a")] == (3, 0.75, 1.0, 1.0)


class TestKMVSketch:
    def test_exact_below_k_and_estimate_above(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import skew

        rows = [("g1", f"v{i}") for i in range(10)] + [
            ("g2", f"w{i % 3}") for i in range(30)
        ]
        df = spark.createDataFrame(rows, "g string, v string")
        sk = skew.kmv_sketch(df, ["g"], "v", k=64)
        est = {r.g: r.distinct_estimate
               for r in skew.kmv_distinct_estimate(sk, ["g"], k=64).collect()}
        # both groups are below k -> exact
        assert est == {"g1": 10.0, "g2": 3.0}

    def test_estimate_accuracy_and_merge_equals_rebuild(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import skew

        rows = [("g", f"item{i}") for i in range(5000)]
        df = spark.createDataFrame(rows, "g string, v string")
        sk = skew.kmv_sketch(df, ["g"], "v", k=256)
        est = skew.kmv_distinct_estimate(sk, ["g"], k=256).collect()[0]
        assert abs(est.distinct_estimate - 5000) / 5000 < 0.15
        # merge of two halves == sketch of the whole
        h1 = skew.kmv_sketch(df.where(F.length("v") % 2 == 0), ["g"], "v", k=256)
        h2 = skew.kmv_sketch(df.where(F.length("v") % 2 == 1), ["g"], "v", k=256)
        merged = skew.kmv_merge(h1, h2, ["g"], k=256)
        assert sorted(r.kmv_hash for r in merged.collect()) == sorted(
            r.kmv_hash for r in sk.collect()
        )

    def test_intersection_estimator(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import skew

        a_rows = [("a", f"x{i}") for i in range(2000)]
        b_rows = [("b", f"x{i}") for i in range(1000, 3000)]  # 1000 shared
        a = skew.kmv_sketch(
            spark.createDataFrame(a_rows, "g string, v string"), ["g"], "v",
            k=256,
        )
        b = skew.kmv_sketch(
            spark.createDataFrame(b_rows, "g string, v string"), ["g"], "v",
            k=256,
        )
        got = skew.kmv_intersection_estimate(a, b, k=256).collect()[0]
        # truth: |A u B| = 3000, |A n B| = 1000, J = 1/3
        assert abs(got.union_estimate - 3000) / 3000 < 0.2
        assert abs(got.jaccard_estimate - 1 / 3) < 0.12
        assert abs(got.intersection_estimate - 1000) / 1000 < 0.35
