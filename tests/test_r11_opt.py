"""Round-11 optimization regression tests: the restructured CC internals
(one checkpointed narrow pair base; no intermediate per-round distincts in
big-star) must keep labels EXACTLY as before on the shapes the removed
dedup steps used to normalize — duplicated pair rows, reversed duplicates,
and self-pairs."""

import pytest

from ecu_sbl_aace_datalake_spark.operators.dedup import (
    duplicate_clusters,
    duplicate_clusters_bigstar,
)


@pytest.fixture(scope="module")
def spark():
    from ecu_sbl_aace_datalake_spark import get_spark

    s = get_spark("test-r11-opt", shuffle_partitions=4)
    yield s


class TestCCRestructuredInternals:
    def test_duplicated_and_reversed_pairs(self, spark):
        # every edge appears 3x, once reversed — multiplicity must not
        # change labels now that intermediate distincts are gone
        rows = [(2, 1), (2, 1), (1, 2), (2, 3), (2, 3), (3, 7), (10, 11), (11, 10)]
        pairs = spark.createDataFrame(rows, "id_a long, id_b long")
        expect = {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}
        a = {r.node: r.cluster for r in duplicate_clusters(pairs).collect()}
        b = {r.node: r.cluster for r in duplicate_clusters_bigstar(pairs).collect()}
        assert a == expect
        assert b == expect

    def test_self_pairs_yield_singleton_labels(self, spark):
        # self-pairs enter `nodes` (now derived from the checkpointed base)
        # but not `edges`; the node must still come back self-labeled
        pairs = spark.createDataFrame(
            [(5, 5), (2, 1), (9, 9)], "id_a long, id_b long"
        )
        b = {r.node: r.cluster
             for r in duplicate_clusters_bigstar(pairs).collect()}
        assert b == {1: 1, 2: 1, 5: 5, 9: 9}

    def test_stats_rounds_still_reported(self, spark):
        stats: dict = {}
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(16)], "id_a long, id_b long"
        )
        out = duplicate_clusters_bigstar(pairs, stats=stats, strict=True)
        assert out.select("cluster").distinct().count() == 1
        assert stats["converged"] and stats["rounds"] >= 1
