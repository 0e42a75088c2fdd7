"""PageRank: golden values vs an independent numpy power iteration."""

from __future__ import annotations

import numpy as np

from ecu_sbl_aace_datalake_spark.operators.graph import label_propagation, pagerank


def _numpy_pagerank(edge_list, iters, d):
    nodes = sorted({n for e in edge_list for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {i: [] for i in range(n)}
    for s, t in edge_list:
        out[idx[s]].append(idx[t])
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        for i, targets in out.items():
            if targets:
                share = d * r[i] / len(targets)
                for t in targets:
                    nxt[t] += share
        r = nxt
    return {nodes[i]: r[i] for i in range(n)}


class TestPageRank:
    EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]

    def test_matches_numpy_power_iteration(self, spark):
        sym = set(self.EDGES) | {(t, s) for s, t in self.EDGES}
        expected = _numpy_pagerank(sorted(sym), iters=8, d=0.85)
        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        got = {
            r.node: r.rank
            for r in pagerank(df, iterations=8, symmetrize=True).collect()
        }
        assert set(got) == set(expected)
        for node, val in expected.items():
            assert abs(got[node] - val) < 1e-6, node

    def test_mass_conserved_on_symmetric_graph(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
        import pyspark.sql.functions as F

        edges = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
            F.concat(F.lit("c"), "o_custkey").alias("src"),
            F.concat(F.lit("s"), "l_suppkey").alias("dst"),
        )
        pr = pagerank(edges, iterations=3, symmetrize=True)
        total = pr.agg(F.sum("rank")).first()[0]
        # symmetric graph has no dangling nodes -> total mass stays 1
        assert abs(total - 1.0) < 1e-3

    def test_weighted_edge_pulls_rank(self, spark):
        # hub→s0 carries 100x the weight of hub→s1..s3: s0 must outrank
        # the other spokes, which the unweighted form can't distinguish
        edges = [("hub", "s0", 100.0)] + [("hub", f"s{i}", 1.0) for i in (1, 2, 3)]
        df = spark.createDataFrame(edges, "src string, dst string, w double")
        got = {
            r.node: r.rank
            for r in pagerank(df, symmetrize=True, weight_col="w").collect()
        }
        assert all(got["s0"] > got[f"s{i}"] for i in (1, 2, 3))
        unw = {
            r.node: r.rank for r in pagerank(df, symmetrize=True).collect()
        }
        assert unw["s0"] == unw["s1"]  # without weights the spokes tie

    def test_personalized_concentrates_near_seeds(self, spark):
        # two disconnected triangles; seeding one triangle must leave the
        # other with zero rank (no teleport, no path)
        tri = lambda a, b, c: [(a, b), (b, c), (c, a)]  # noqa: E731
        edges = tri("a1", "a2", "a3") + tri("b1", "b2", "b3")
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r.node: r.rank
            for r in pagerank(df, symmetrize=True, seeds=["a1"]).collect()
        }
        assert got["b1"] == got["b2"] == got["b3"] == 0.0
        assert got["a1"] > got["a2"] > 0
        assert abs(sum(got.values()) - 1.0) < 1e-3  # mass stays in component

    def test_higher_degree_ranks_higher(self, spark):
        # star: hub connected to 4 spokes -> hub must outrank every spoke
        edges = [("hub", f"s{i}") for i in range(4)]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: r.rank for r in pagerank(df, symmetrize=True).collect()}
        assert all(got["hub"] > got[f"s{i}"] for i in range(4))


class TestLabelPropagation:
    def test_components_get_distinct_min_labels(self, spark):
        tri = lambda a, b, c: [(a, b), (b, c), (c, a)]  # noqa: E731
        edges = tri("a1", "a2", "a3") + tri("b1", "b2", "b3")
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: r.label for r in label_propagation(df, iterations=6).collect()}
        assert {got[n] for n in ("a1", "a2", "a3")} == {"a1"}
        assert {got[n] for n in ("b1", "b2", "b3")} == {"b1"}

    def test_deterministic_across_partitionings(self, spark):
        edges = [(f"n{i}", f"n{i+1}") for i in range(20)]
        df = spark.createDataFrame(edges, "src string, dst string")
        a = sorted(map(tuple, label_propagation(df, iterations=4).collect()))
        b = sorted(map(tuple, label_propagation(df.repartition(7), iterations=4).collect()))
        assert a == b


class TestBroadcastDispatch:
    EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"),
             ("e", "d"), ("c", "e")]

    def test_pagerank_shuffle_fallback_matches_broadcast(self, spark):
        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        bc = pagerank(df, iterations=6, broadcast_ranks=True).collect()
        sh = pagerank(df, iterations=6, broadcast_ranks=False).collect()
        assert sorted(map(tuple, bc)) == sorted(map(tuple, sh))
        # size probe: a threshold below |V| must take the shuffle path and
        # still produce identical ranks
        probed = pagerank(df, iterations=6, broadcast_threshold=1).collect()
        assert sorted(map(tuple, probed)) == sorted(map(tuple, bc))

    def test_lpa_shuffle_fallback_matches_broadcast(self, spark):
        df = spark.createDataFrame(self.EDGES, "src string, dst string")
        bc = label_propagation(df, iterations=4, broadcast_labels=True).collect()
        sh = label_propagation(df, iterations=4, broadcast_labels=False).collect()
        probed = label_propagation(df, iterations=4, broadcast_threshold=1).collect()
        assert sorted(map(tuple, bc)) == sorted(map(tuple, sh)) == sorted(map(tuple, probed))


class TestTriangleCount:
    def _count(self, spark, pairs):
        from ecu_sbl_aace_datalake_spark.operators.graph import triangle_count

        df = spark.createDataFrame(pairs, "src string, dst string")
        return triangle_count(df).collect()[0]["n_triangles"]

    def test_k4_has_four(self, spark):
        nodes = ["a", "b", "c", "d"]
        edges = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
        assert self._count(spark, edges) == 4

    def test_triangle_with_pendant(self, spark):
        assert self._count(
            spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
        ) == 1

    def test_path_and_star_have_none(self, spark):
        assert self._count(spark, [("a", "b"), ("b", "c"), ("c", "d")]) == 0
        assert self._count(spark, [("hub", x) for x in "abcde"]) == 0

    def test_shared_edge_two_triangles(self, spark):
        assert self._count(
            spark,
            [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("d", "c")],
        ) == 2

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        assert self._count(
            spark,
            [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "b"), ("a", "a")],
        ) == 1


class TestBfsHops:
    def test_hand_built_graph(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.graph import bfs_hops

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("d", "a")],
            "src string, dst string",
        )
        sources = spark.createDataFrame([("a",)], "node string")
        got = {r.node: r.hop for r in bfs_hops(edges, sources, 3).collect()}
        # directed: a->b->c->d (d->a is a back edge; x,y unreachable)
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3}

    def test_min_hop_wins_on_multiple_paths(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.graph import bfs_hops

        edges = spark.createDataFrame(
            [("s", "m"), ("m", "t"), ("s", "t")],
            "src string, dst string",
        )
        sources = spark.createDataFrame([("s",)], "node string")
        got = {r.node: r.hop for r in bfs_hops(edges, sources, 3).collect()}
        assert got["t"] == 1  # direct edge beats the 2-hop path

    def test_multi_source_and_zero_hop_dedup(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.graph import bfs_hops

        edges = spark.createDataFrame(
            [("a", "b"), ("c", "b")], "src string, dst string"
        )
        sources = spark.createDataFrame(
            [("a",), ("c",), ("a",)], "node string"
        )
        rows = bfs_hops(edges, sources, 2).collect()
        assert len(rows) == 3  # a, c (deduped), b
        assert {r.node: r.hop for r in rows}["b"] == 1


class TestSsspBellmanFord:
    def test_hand_graph_distances(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.graph import sssp_bellman_ford

        # a -1-> b -1-> c, a -5-> c, c -1-> d: dist c = 2 (via b), d = 3
        edges = spark.createDataFrame(
            [("a", "b", 1), ("b", "c", 1), ("a", "c", 5), ("c", "d", 1)],
            "src string, dst string, w long",
        )
        src = spark.createDataFrame([("a",)], "node string")
        got = {r.node: r.dist for r in sssp_bellman_ford(edges, src, rounds=4).collect()}
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3}

    def test_bounded_horizon_and_multi_source(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.graph import sssp_bellman_ford

        edges = spark.createDataFrame(
            [("a", "b", 2), ("b", "c", 2), ("c", "d", 2)],
            "src string, dst string, w long",
        )
        src = spark.createDataFrame([("a",), ("d",)], "node string")
        one = {r.node: r.dist for r in sssp_bellman_ford(edges, src, rounds=1).collect()}
        assert one == {"a": 0, "d": 0, "b": 2}  # c,d unreachable in 1 round from a
        # longer-path refinement: 5-weight shortcut loses to 2+2 later
        edges2 = spark.createDataFrame(
            [("a", "c", 5), ("a", "b", 2), ("b", "c", 2)],
            "src string, dst string, w long",
        )
        src2 = spark.createDataFrame([("a",)], "node string")
        r1 = {r.node: r.dist for r in sssp_bellman_ford(edges2, src2, rounds=1).collect()}
        r2 = {r.node: r.dist for r in sssp_bellman_ford(edges2, src2, rounds=2).collect()}
        assert r1["c"] == 5 and r2["c"] == 4

    def test_negative_weight_guard(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.graph import (
            validate_nonnegative_weights,
        )
        import pytest as _pytest

        edges = spark.createDataFrame(
            [("a", "b", -1)], "src string, dst string, w long"
        )
        with _pytest.raises(ValueError):
            validate_nonnegative_weights(edges)


class TestLinkPrediction:
    def test_square_graph(self, spark):
        # square 1-2-3-4-1: diagonals (1,3) and (2,4) each share 2
        # witnesses of degree 2 -> CN=2, AA = 2/ln(2)
        import math

        from ecu_sbl_aace_datalake_spark.operators import graph

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
        )
        got = {(r.u, r.v): r for r in
               graph.link_prediction_scores(edges).collect()}
        assert set(got) == {(1, 3), (2, 4)}
        want = round(2 * round(1 / math.log(2), 9), 6)
        for r in got.values():
            assert r.common_neighbors == 2
            assert abs(r.adamic_adar - want) < 1e-9

    def test_existing_edges_excluded_and_hub_discounted(self, spark):
        import math

        from ecu_sbl_aace_datalake_spark.operators import graph

        # hub 0 adjacent to everyone; 1-2 also direct neighbors
        edges = spark.createDataFrame(
            [(0, 1), (0, 2), (0, 3), (1, 2)], "src long, dst long"
        )
        got = {(r.u, r.v): r for r in
               graph.link_prediction_scores(edges).collect()}
        # (1,2) is an existing edge -> excluded; (1,3),(2,3) share hub 0
        assert set(got) == {(1, 3), (2, 3)}
        aa_hub = round(round(1 / math.log(3), 9), 6)
        assert abs(got[(1, 3)].adamic_adar - aa_hub) < 1e-9

    def test_witness_degree_cap(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import graph

        edges = spark.createDataFrame(
            [(0, 1), (0, 2), (0, 3), (9, 1), (9, 3)], "src long, dst long"
        )
        capped = {(r.u, r.v): r for r in graph.link_prediction_scores(
            edges, max_witness_degree=2
        ).collect()}
        # hub 0 (deg 3) is dropped as a WITNESS: (1,3) keeps only
        # witness 9, and (0,9) appears via witnesses 1 and 3 — the cap
        # removes hub-mediated evidence, not hub-endpoint pairs
        assert set(capped) == {(1, 3), (0, 9)}
        assert capped[(1, 3)].common_neighbors == 1
        assert capped[(0, 9)].common_neighbors == 2
        uncapped = {(r.u, r.v): r.common_neighbors for r in
                    graph.link_prediction_scores(edges).collect()}
        assert uncapped[(1, 3)] == 2  # hub witness counted without cap
