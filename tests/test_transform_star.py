"""Invariant tests for transforms + star kit (reference runtime self-checks
as properties: SURVEY.md §5 — simpleMap row-count preservation, castColumns
null-on-failure, idempotent re-mapping, contiguous index)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecu_sbl_aace_datalake_spark.operators import star, transform


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    from ecu_sbl_aace_datalake_spark.sources.io import load_table

    return load_table(spark, sf_dir, "orders")


class TestCastColumns:
    def test_null_on_failure_keeps_orig(self, spark):
        df = spark.createDataFrame(
            [("1", "a"), ("2", "b"), ("x", "c")], "num string, other string"
        )
        out, failures = transform.cast_columns(df, ["num"], cast="int")
        assert failures == {"num": 1}
        assert "num_orig" in out.columns  # kept because one cast failed
        rows = {r.num_orig: r.num for r in out.collect()}
        assert rows == {"1": 1, "2": 2, "x": None}

    def test_clean_cast_drops_orig(self, spark):
        df = spark.createDataFrame([("1",), ("2",)], "num string")
        out, failures = transform.cast_columns(df, ["num"], cast="int")
        assert failures == {"num": 0}
        assert out.columns == ["num"]

    def test_ordinal_position_preserved(self, spark):
        df = spark.createDataFrame([("a", "1", "b")], "x string, num string, y string")
        out, _ = transform.cast_columns(df, ["num"], cast="int")
        assert out.columns == ["x", "num", "y"]

    def test_single_validation_job_multi_col(self, spark):
        df = spark.createDataFrame(
            [("1", "z"), ("2", "9")], "a string, b string"
        )
        out, failures = transform.cast_columns(df, ["a", "b"], cast="int")
        assert failures == {"a": 0, "b": 1}


class TestIndexCol:
    def test_contiguous_and_ordered(self, spark):
        df = spark.createDataFrame([("c",), ("a",), ("b",)], "v string")
        out = transform.add_index_col(df, "idx", order_by=["v"]).collect()
        assert [(r.idx, r.v) for r in out] == [(1, "a"), (2, "b"), (3, "c")]

    def test_index_start(self, spark):
        df = spark.createDataFrame([("a",), ("b",)], "v string")
        out = transform.add_index_col(df, "idx", index_start=100, order_by=["v"])
        assert [r.idx for r in out.collect()] == [101, 102]

    def test_case_insensitive_replacement(self, spark):
        df = spark.createDataFrame([(9, "a")], "IDX long, v string")
        out = transform.add_index_col(df, "idx", order_by=["v"])
        assert out.columns == ["idx", "v"]


class TestIndexColDistributed:
    def test_matches_global_row_number(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
        got = transform.add_index_col_distributed(
            orders, "idx", order_by="o_orderkey", num_partitions=8
        )
        rows = [(r.idx, r.o_orderkey) for r in got.orderBy("idx").collect()]
        expected = [
            (i + 1, k)
            for i, k in enumerate(
                sorted(r.o_orderkey for r in orders.collect())
            )
        ]
        assert rows == expected

    def test_contiguous_any_partition_count(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table
        import pyspark.sql.functions as F

        cust = load_table(spark, sf_dir, "customer")
        n = cust.count()
        for parts in (1, 3, 16):
            out = transform.add_index_col_distributed(
                cust, "idx", index_start=10, order_by="c_custkey",
                num_partitions=parts,
            )
            stats = out.agg(
                F.min("idx"), F.max("idx"), F.countDistinct("idx")
            ).first()
            assert tuple(stats) == (11, 10 + n, n), parts

    def test_no_global_single_partition_exchange(self, spark, sf_dir):
        """The point of the operator: the id stage must not funnel through
        a SinglePartition exchange."""
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        orders = load_table(spark, sf_dir, "orders")
        out = transform.add_index_col_distributed(
            orders, "idx", order_by="o_orderkey", num_partitions=8
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan


class TestIndexColQuantile:
    def test_matches_global_row_number(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
        got = transform.add_index_col_quantile(
            orders, "o_orderkey", col_name="idx", num_partitions=8
        )
        rows = [(r.idx, r.o_orderkey) for r in got.orderBy("idx").collect()]
        expected = [
            (i + 1, k)
            for i, k in enumerate(sorted(r.o_orderkey for r in orders.collect()))
        ]
        assert rows == expected

    def test_contiguous_under_skewed_keys(self, spark):
        # all-equal keys collapse every quantile bound into one bucket —
        # ids must still be contiguous 1..n
        import pyspark.sql.functions as F

        df = spark.createDataFrame([(7,)] * 500, "k long")
        out = transform.add_index_col_quantile(df, "k", col_name="idx",
                                               num_partitions=8)
        stats = out.agg(F.min("idx"), F.max("idx"), F.countDistinct("idx")).first()
        assert tuple(stats) == (1, 500, 500)

    def test_no_single_partition_exchange_or_checkpoint(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        orders = load_table(spark, sf_dir, "orders")
        out = transform.add_index_col_quantile(
            orders, "o_orderkey", col_name="idx", num_partitions=8
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan
        # pure-function bucketing: nothing pinned in the plan lineage
        assert "Checkpoint" not in plan and "LogicalRDD" not in plan


class TestRenames:
    def test_prefix_roundtrip(self, spark):
        df = spark.createDataFrame([(1, "x")], "a long, b string")
        pre = transform.rename_columns_with_prefix(df, "p")
        assert pre.columns == ["p_a", "p_b"]
        back = transform.rename_columns_strip_prefix(pre, "p")
        assert back.columns == ["a", "b"]

    def test_strip_skips_empty_result(self, spark):
        df = spark.createDataFrame([(1,)], "p long")
        out = transform.rename_columns_strip_prefix(df, "p")
        assert out.columns == ["p"]  # stripping would leave '' → skipped


class TestListHelpers:
    def test_insert_value_pure(self):
        src = ["a", "b", "c"]
        out = transform.insert_value_into_list(src, "b", "x")
        assert src == ["a", "b", "c"]  # input NOT mutated (reference bug #7)
        assert out == ["a", "x", "c", "b"]

    def test_insert_noop_when_present(self):
        assert transform.insert_value_into_list(["a", "x"], "a", "x") == ["a", "x"]

    def test_insert_appends_when_old_absent(self):
        assert transform.insert_value_into_list(["a"], "zz", "x") == ["a", "x"]

    def test_replace(self):
        assert transform.replace_value_in_list([1, 2, 1], 1, 9) == [9, 2, 9]


class TestDimensionAndMap:
    def test_dim_contiguous_surrogates(self, orders):
        dim = star.build_dimension(orders, "o_orderpriority").collect()
        assert [r[0] for r in dim] == list(range(1, len(dim) + 1))
        vals = [r.o_orderpriority for r in dim]
        assert vals == sorted(vals)

    def test_simple_map_preserves_rows(self, orders):
        dim = star.build_dimension(orders, "o_orderpriority")
        mapped = star.simple_map(orders, dim, "o_orderpriority", validate=True)
        assert mapped.count() == orders.count()
        assert "indexoorderpriority" in mapped.columns
        assert "o_orderpriority" not in mapped.columns
        # ordinal position preserved
        assert mapped.columns.index("indexoorderpriority") == orders.columns.index(
            "o_orderpriority"
        )

    def test_null_keys_survive_null_safe_map(self, spark):
        fact = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b")], "id long, k string"
        )
        dim = star.build_dimension(fact, "k")
        assert dim.count() == 3  # null is a dimension member
        mapped = star.simple_map(fact, dim, "k", index_col="indexK", validate=True)
        assert mapped.count() == 3  # the null row joined via <=>

    def test_duplicate_surrogate_guard(self, orders):
        dim = star.build_dimension(orders, "o_orderpriority")
        mapped = star.simple_map(orders, dim, "o_orderpriority", validate=False)
        with_both = mapped.withColumn("o_orderpriority", F.lit("x"))
        with pytest.raises(ValueError, match="already present"):
            star.simple_map(with_both, dim, "o_orderpriority")

    def test_dim_with_count_measure(self, orders):
        dim = star.build_dimension(
            orders, "o_orderpriority", row_count_col="o_orderkey"
        )
        total = sum(r.o_orderkey for r in dim.collect())
        assert total == orders.count()


class TestExtraRowShape:
    def test_extra_row(self, spark):
        df = spark.createDataFrame([(1, "a", 5)], "k long, v string, n long")
        out = transform.create_extra_row(spark, df, [99, "zz"], zero_fill_cols=["n"])
        rows = {r.k: (r.v, r.n) for r in out.collect()}
        assert rows[99] == ("zz", 0)

    def test_df_shape(self, orders):
        rows, ncols, cols = transform.df_shape(orders)
        assert rows == orders.count()
        assert ncols == 6
        assert cols[0] == "o_orderkey"


class TestSplitByHash:
    def test_deterministic_and_partition_invariant(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        a = {r.doc_id: r.split for r in transform.split_by_hash(
            docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
        b = {r.doc_id: r.split for r in transform.split_by_hash(
            docs.repartition(7), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
        assert a == b  # stable under repartitioning

    def test_proportions_approximate(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        out = transform.split_by_hash(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r.split: r.n for r in out.groupBy("split").agg(
            F.count("*").alias("n")).collect()}
        n = sum(counts.values())
        assert 0.7 < counts["train"] / n < 0.9
        assert counts.keys() == {"train", "val", "test"}

    def test_bad_ratios_raise(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        with pytest.raises(ValueError, match="sum to 1"):
            transform.split_by_hash(docs, "doc_id", {"a": 0.5, "b": 0.6})


class TestSimpleMapMulti:
    def test_composite_key_roundtrip(self, orders):
        dim = star.build_dimension(orders, ["o_orderstatus", "o_orderpriority"])
        mapped = star.simple_map_multi(
            orders, dim, ["o_orderstatus", "o_orderpriority"], validate=True
        )
        assert mapped.count() == orders.count()
        idx = "indexoorderstatusoorderpriority"
        assert idx in mapped.columns
        assert "o_orderstatus" not in mapped.columns
        assert "o_orderpriority" not in mapped.columns
        # surrogate sits where the first key column was
        assert mapped.columns.index(idx) == orders.columns.index("o_orderstatus")
        # every surrogate resolves back through the dimension
        back = mapped.join(dim, idx)
        assert back.count() == orders.count()

    def test_single_col_delegates(self, orders):
        dim = star.build_dimension(orders, "o_orderpriority")
        a = star.simple_map_multi(orders, dim, ["o_orderpriority"], validate=False)
        b = star.simple_map(orders, dim, "o_orderpriority", validate=False)
        assert a.columns == b.columns

    def test_null_safe_composite(self, spark):
        import pyspark.sql.functions as F

        fact = spark.createDataFrame(
            [(1, "a", None), (2, None, "y"), (3, "b", "z")],
            "id long, k1 string, k2 string",
        )
        dim = star.build_dimension(fact, ["k1", "k2"])
        mapped = star.simple_map_multi(fact, dim, ["k1", "k2"], validate=True)
        assert mapped.count() == 3  # null components join via <=>


class TestSchemaDrift:
    def test_diff_reports_added_removed_changed(self, spark):
        old = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, score double")
        new = spark.createDataFrame([(1, "a", "2", True)], "id long, name string, score string, active boolean")
        d = transform.schema_diff(old, new)
        assert d["added"] == ["active"] and d["removed"] == []
        assert d["type_changed"] == [("score", "double", "string")]

    def test_conform_fills_casts_orders_and_guards(self, spark):
        import pytest as _pytest

        target = spark.createDataFrame(
            [], "id long, name string, score double"
        ).schema
        batch = spark.createDataFrame(
            [("7", "x", "extra")], "id string, name string, junk string"
        )
        with _pytest.raises(ValueError, match="junk"):
            transform.conform_to_schema(batch, target)
        out = transform.conform_to_schema(batch, target, strict_extras=False)
        assert out.columns == ["id", "name", "score"]
        row = out.first()
        assert row.id == 7 and row.score is None  # cast + typed null fill


class TestScd2:
    def _log(self, spark):
        return spark.createDataFrame(
            [
                (1, "u1", "2024-01-01 10:00:00", "bronze"),
                (2, "u1", "2024-01-02 10:00:00", "bronze"),   # no change
                (3, "u1", "2024-01-03 10:00:00", "silver"),   # change
                (4, "u1", "2024-01-04 10:00:00", "bronze"),   # back again → new run
                (5, "u2", "2024-01-01 09:00:00", "gold"),
            ],
            "event_id long, user_id string, ts string, tier string",
        ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) ts", "tier")

    def test_runs_collapse_and_validity_chain(self, spark):
        out = star.scd2_from_events(
            self._log(spark), "user_id", ["tier"], "ts", tiebreak_cols=["event_id"]
        )
        u1 = sorted(
            ((r.tier, r.valid_from.day, r.valid_to.day if r.valid_to else None,
              r.is_current) for r in out.collect() if r.user_id == "u1"),
            key=lambda t: t[1],
        )
        # bronze(1→3), silver(3→4), bronze(4→open): same attrs, separate runs
        assert u1 == [("bronze", 1, 3, False), ("silver", 3, 4, False),
                      ("bronze", 4, None, True)]
        u2 = [r for r in out.collect() if r.user_id == "u2"]
        assert len(u2) == 1 and u2[0].is_current

    def test_fixture_chain_invariants(self, spark, sf_dir):
        """On the real event log: per user exactly one open version, and
        every closed version's valid_to equals the next version's
        valid_from (no gaps, no overlaps)."""
        from ecu_sbl_aace_datalake_spark.sources.io import load_table
        import pyspark.sql.functions as F
        from pyspark.sql.window import Window

        evdf = load_table(spark, sf_dir, "events")
        dim = star.scd2_from_events(
            evdf, "user_id", ["event_type"], "ts", tiebreak_cols=["event_id"]
        )
        open_counts = (
            dim.groupBy("user_id")
            .agg(F.sum(F.col("is_current").cast("long")).alias("n_open"))
            .where(F.col("n_open") != 1)
        )
        assert open_counts.count() == 0
        w = Window.partitionBy("user_id").orderBy("valid_from")
        gaps = (
            dim.withColumn("next_from", F.lead("valid_from").over(w))
            .where(F.col("valid_to").isNotNull())
            .where(F.col("valid_to") != F.col("next_from"))
        )
        assert gaps.count() == 0

    def test_apply_close_insert_noop(self, spark):
        dim = star.scd2_from_events(
            self._log(spark), "user_id", ["tier"], "ts", tiebreak_cols=["event_id"]
        )
        changes = spark.createDataFrame(
            [
                ("u1", "gold", "2024-02-01 00:00:00"),   # change → close + insert
                ("u2", "gold", "2024-02-01 00:00:00"),   # same attrs → no-op
                ("u3", "bronze", "2024-02-01 00:00:00"), # new key → insert
            ],
            "user_id string, tier string, eff string",
        ).selectExpr("user_id", "tier", "CAST(eff AS TIMESTAMP) eff")
        out = star.scd2_apply(dim, changes, "user_id", ["tier"], "eff")
        cur = {r.user_id: r.tier for r in out.collect() if r.is_current}
        assert cur == {"u1": "gold", "u2": "gold", "u3": "bronze"}
        # the superseded u1 row is closed at the effective ts
        closed = [r for r in out.collect()
                  if r.user_id == "u1" and r.tier == "bronze" and r.valid_from.day == 4]
        assert len(closed) == 1 and closed[0].valid_to.month == 2
        # re-applying the same batch is a no-op (idempotent)
        again = star.scd2_apply(out, changes, "user_id", ["tier"], "eff")
        assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))


class TestStratifiedSample:
    def test_partition_invariant_and_stratum_rates(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        fr = {"en": 0.5, "de": 0.25}
        a = {r.doc_id for r in transform.stratified_sample_by_hash(
            docs, "lang", fr, id_col="doc_id", default_fraction=0.1).collect()}
        b = {r.doc_id for r in transform.stratified_sample_by_hash(
            docs.repartition(7), "lang", fr, id_col="doc_id", default_fraction=0.1).collect()}
        assert a == b and a  # identical kept set under repartitioning

    def test_zero_fraction_drops_stratum(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        out = transform.stratified_sample_by_hash(
            docs, "lang", {"en": 1.0}, id_col="doc_id", default_fraction=0.0)
        langs = {r.lang for r in out.select("lang").distinct().collect()}
        assert langs == {"en"}

    def test_bad_fraction_raises(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        with pytest.raises(ValueError, match="must be in"):
            transform.stratified_sample_by_hash(
                docs, "lang", {"en": 1.5}, id_col="doc_id")


class TestSampleFixedN:
    def test_exact_size_and_partition_invariance(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        a = {r.doc_id for r in transform.sample_fixed_n(docs, "doc_id", 50).collect()}
        b = {r.doc_id for r in transform.sample_fixed_n(
            docs.repartition(9), "doc_id", 50).collect()}
        assert a == b and len(a) == 50

    def test_weighted_favors_heavy_rows(self, spark):
        # one row with 1000x the weight of 999 others must (deterministically)
        # be sampled into a 100-row draw; zero/negative weights are excluded
        rows = [(i, 1000.0 if i == 7 else 1.0) for i in range(1000)] + [
            (1000, 0.0), (1001, -3.0)
        ]
        df = spark.createDataFrame(rows, "id long, w double")
        kept = {r.id for r in transform.sample_fixed_n(
            df, "id", 100, weight_col="w").collect()}
        assert 7 in kept and len(kept) == 100
        assert 1000 not in kept and 1001 not in kept

    def test_plan_is_take_ordered(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        plan = transform.sample_fixed_n(docs, "doc_id", 10)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan  # heap top-n, no global sort


class TestTfIdf:
    def test_golden_small_corpus(self, spark):
        import math

        from ecu_sbl_aace_datalake_spark.operators import textstats

        docs = spark.createDataFrame(
            [(1, "a b a"), (2, "a c"), (3, "d d d")], ["doc_id", "text"])
        rows = {(r.doc_id, r.token): r for r in textstats.tf_idf(docs).collect()}
        # 'a' appears twice in doc 1, in 2 of 3 docs
        r = rows[(1, "a")]
        assert r.tf == 2 and r.df_t == 2
        assert abs(r.idf - round(math.log(3 / 2), 6)) < 1e-9
        assert abs(r.tfidf - round(2 * math.log(3 / 2), 6)) < 1e-9
        # 'd' only in doc 3: idf = ln(3)
        assert abs(rows[(3, "d")].idf - round(math.log(3.0), 6)) < 1e-9
        # corpus-wide df even when filtered downstream
        filtered = textstats.tf_idf(docs).where(F.col("doc_id") == 1).collect()
        assert {r.token: r.df_t for r in filtered} == {"a": 2, "b": 1}


class TestTrailingRangeWindow:
    def test_hand_checked_frames(self, spark):
        import datetime as dt

        from ecu_sbl_aace_datalake_spark.streaming import events as ev

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            (1, 1, t0, 10.0),
            (1, 2, t0 + dt.timedelta(minutes=30), 20.0),
            (1, 3, t0 + dt.timedelta(minutes=61), 40.0),   # row 1 aged out
            (2, 4, t0, 7.0),                               # other user isolated
        ]
        df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
        out = {r.event_id: r for r in ev.with_trailing_range_agg(df).collect()}
        assert (out[1].trailing_n, out[1].trailing_sum_value) == (1, 10.0)
        assert (out[2].trailing_n, out[2].trailing_sum_value) == (2, 30.0)
        assert (out[3].trailing_n, out[3].trailing_sum_value) == (2, 60.0)
        assert (out[4].trailing_n, out[4].trailing_sum_value) == (1, 7.0)

    def test_exact_boundary_inclusive(self, spark):
        import datetime as dt

        from ecu_sbl_aace_datalake_spark.streaming import events as ev

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, 1, t0, 1.0), (1, 2, t0 + dt.timedelta(hours=1), 2.0)],
            ["user_id", "event_id", "ts", "value"])
        out = {r.event_id: r for r in ev.with_trailing_range_agg(df).collect()}
        assert out[2].trailing_n == 2  # exactly 1h earlier is inside the frame


class TestHashSplit:
    def test_group_leakage_guard_and_determinism(self, spark):
        import pyspark.sql.functions as F

        from ecu_sbl_aace_datalake_spark.operators.transform import hash_split

        df = spark.createDataFrame(
            [(i, f"grp{i % 40}") for i in range(2000)], "id long, grp string"
        )
        out = hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1},
                         by_col="grp")
        # every group maps to exactly one split
        per_grp = out.groupBy("grp").agg(
            F.count_distinct("split").alias("n")
        ).collect()
        assert all(r.n == 1 for r in per_grp)
        # proportions roughly respected at the group level (40 groups)
        frac = out.where("split = 'train'").count() / 2000
        assert 0.6 < frac < 0.95
        # partition-invariant
        again = hash_split(df.repartition(17), "id",
                           {"train": 0.8, "val": 0.1, "test": 0.1}, by_col="grp")
        assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))

    def test_row_level_split_proportions(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.transform import hash_split

        df = spark.range(10000).withColumnRenamed("id", "doc_id")
        out = hash_split(df, "doc_id", {"a": 0.5, "b": 0.5})
        n_a = out.where("split = 'a'").count()
        assert abs(n_a - 5000) < 300  # hash-uniformity tolerance


class TestApplyChangelog:
    def _snap(self, spark):
        return spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, status string, amount double",
        )

    def test_insert_update_delete_last_wins(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.star import apply_changelog

        changes = spark.createDataFrame(
            [
                # two competing updates on k=1: seq 2 wins
                (1, "u1", 11.0, "2024-06-01 00:00:00", 1, "U"),
                (1, "u2", 12.0, "2024-06-01 00:00:00", 2, "U"),
                # delete k=2
                (2, None, None, "2024-06-01 00:00:00", 1, "D"),
                # insert new key 9
                (9, "new", 90.0, "2024-06-01 00:00:00", 1, "I"),
            ],
            "k long, status string, amount double, ts string, seq long, op string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            r.k: (r.status, r.amount)
            for r in apply_changelog(
                self._snap(spark), changes, "k", seq_col="seq"
            ).collect()
        }
        assert out == {
            1: ("u2", 12.0),   # later seq wins
            3: ("c", 30.0),    # untouched passes through
            9: ("new", 90.0),  # inserted
        }  # k=2 deleted

    def test_delete_then_later_insert_resurrects(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.star import apply_changelog

        changes = spark.createDataFrame(
            [
                (2, None, None, "2024-06-01 00:00:00", 1, "D"),
                (2, "back", 21.0, "2024-06-02 00:00:00", 1, "I"),
            ],
            "k long, status string, amount double, ts string, seq long, op string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            r.k: r.status
            for r in apply_changelog(
                self._snap(spark), changes, "k", seq_col="seq"
            ).collect()
        }
        assert out[2] == "back"

    def test_idempotent_reapplication(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.star import apply_changelog

        changes = spark.createDataFrame(
            [(1, "u", 11.0, "2024-06-01 00:00:00", 1, "U")],
            "k long, status string, amount double, ts string, seq long, op string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        once = apply_changelog(self._snap(spark), changes, "k", seq_col="seq")
        twice = apply_changelog(once, changes, "k", seq_col="seq")
        assert sorted(map(tuple, once.collect())) == \
            sorted(map(tuple, twice.collect()))


class TestThrottleDedup:
    def test_first_survives_and_gap_enforced(self, spark):
        from ecu_sbl_aace_datalake_spark.streaming.events import throttle_dedup

        df = spark.createDataFrame(
            [
                (1, "c", 10, "2024-01-01 00:00:00"),
                (1, "c", 11, "2024-01-01 00:04:59"),   # <300s after #10: drop
                (1, "c", 12, "2024-01-01 00:05:00"),   # 300s after #11 RAW? 1s -> drop
                (1, "c", 13, "2024-01-01 00:10:00"),   # 300s after #12: keep
                (1, "x", 14, "2024-01-01 00:00:30"),   # other key: keep
                (2, "c", 15, "2024-01-01 00:00:01"),   # other user: keep
            ],
            "user_id long, event_type string, event_id long, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        kept = {
            r.event_id
            for r in throttle_dedup(
                df, ["user_id", "event_type"], min_gap_seconds=300,
                tiebreak_cols=["event_id"],
            ).collect()
        }
        assert kept == {10, 13, 14, 15}


class TestMixtureWeights:
    def test_weights_sum_to_one_and_temperature_flattens(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.operators import packing
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        w_half = {
            r.source: r.weight
            for r in packing.temperature_mixture_weights(docs, alpha=0.5).collect()
        }
        w_nat = {
            r.source: r.weight
            for r in packing.temperature_mixture_weights(docs, alpha=1.0).collect()
        }
        assert abs(sum(w_half.values()) - 1.0) < 1e-3
        assert abs(sum(w_nat.values()) - 1.0) < 1e-3
        # temperature < 1 compresses the spread
        spread = lambda w: max(w.values()) - min(w.values())  # noqa: E731
        assert spread(w_half) <= spread(w_nat) + 1e-9


class TestKeySkewReport:
    def test_counts_cover_all_rows(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.operators import skew
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        orders = load_table(spark, sf_dir, "orders")
        rep = skew.key_skew_report(orders, "o_custkey", buckets=16).collect()
        assert sum(r.n_rows for r in rep) == orders.count()
        assert all(0 <= r.bucket < 16 for r in rep)
        assert abs(sum(r.share for r in rep) - 1.0) < 1e-3

    def test_hot_key_detected(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import skew

        rows = [(1,)] * 900 + [(i,) for i in range(2, 102)]
        df = spark.createDataFrame(rows, "k long")
        rep = skew.key_skew_report(df, "k", buckets=8).collect()
        assert max(r.share for r in rep) > 0.8  # the hot key's bucket


class TestNeymanAllocation:
    def test_variance_weighted_budget(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        # stratum 'wide' has 4x the stddev of 'narrow' at equal size:
        # Neyman gives it ~4x the budget
        rows = [("wide", float(v)) for v in (0, 40, 0, 40) * 25] + [
            ("narrow", float(v)) for v in (0, 10, 0, 10) * 25
        ]
        df = spark.createDataFrame(rows, "s string, v double")
        got = {r.s: r for r in transform.neyman_allocation(
            df, "s", "v", total_n=50
        ).collect()}
        assert got["wide"].allocation + got["narrow"].allocation == 50
        assert got["wide"].allocation == 40 and got["narrow"].allocation == 10
        assert abs(got["wide"].stddev - 20.0) < 1e-6

    def test_remainder_and_cap(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        # 3 equal strata, budget 10 -> 3/3/4 with the remainder going to
        # the largest fractional part (all equal -> name tie-break 'a')
        rows = [(s, float(i % 5)) for s in ("a", "b", "c") for i in range(20)]
        df = spark.createDataFrame(rows, "s string, v double")
        got = {r.s: r.allocation for r in transform.neyman_allocation(
            df, "s", "v", total_n=10
        ).collect()}
        assert sum(got.values()) == 10
        assert got["a"] == 4 and got["b"] == 3 and got["c"] == 3

    def test_constant_strata_fall_back_proportional(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        rows = [("big", 1.0)] * 30 + [("small", 2.0)] * 10
        df = spark.createDataFrame(rows, "s string, v double")
        got = {r.s: r.allocation for r in transform.neyman_allocation(
            df, "s", "v", total_n=8
        ).collect()}
        assert got == {"big": 6, "small": 2}

    def test_allocation_capped_at_stratum_size(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        rows = [("tiny", float(i)) for i in range(3)] + [
            ("rest", 5.0)] * 100
        df = spark.createDataFrame(rows, "s string, v double")
        got = {r.s: r.allocation for r in transform.neyman_allocation(
            df, "s", "v", total_n=50
        ).collect()}
        assert got["tiny"] <= 3


class TestTokenDropout:
    def test_deterministic_and_salted(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        df = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog " * 8)],
            "doc_id long, text string",
        )
        a1 = transform.augment_token_dropout(df, "doc_id", salt="a").collect()[0]
        a2 = transform.augment_token_dropout(df, "doc_id", salt="a").collect()[0]
        b = transform.augment_token_dropout(df, "doc_id", salt="b").collect()[0]
        assert a1.augmented == a2.augmented          # replayable
        assert a1.augmented != b.augmented           # salted views differ
        assert 0 < a1.n_dropped < 72                 # some but not all

    def test_rate_zero_identity_and_null(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, None)], "doc_id long, text string"
        )
        got = {r.doc_id: r for r in transform.augment_token_dropout(
            df, "doc_id", rate=0.0
        ).collect()}
        assert got[1].augmented == "alpha beta gamma" and got[1].n_dropped == 0
        assert got[2].augmented is None and got[2].n_dropped is None
