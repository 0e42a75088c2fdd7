"""Z-order clustering: Morton bit math + the data-skipping layout claim."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
import pytest

from ecu_sbl_aace_datalake_spark.functions import zorder
from ecu_sbl_aace_datalake_spark.sources.catalog import Lakehouse
from ecu_sbl_aace_datalake_spark.sources.io import (
    cluster_table,
    read_pruned,
    read_table,
    write_table,
    zone_map,
    zorder_table,
)


class TestMortonMath:
    def test_interleave_known_bits(self, spark):
        # x=3 (0b11), y=1 (0b01), 2 bits: out bit i*2+d ← dim d bit i
        # x → bits 0,2 = 5; y bit0 → bit 1 = 2; total 7
        df = spark.createDataFrame([(3, 1)], ["x", "y"])
        z = df.select(
            zorder.morton_interleave([F.col("x"), F.col("y")], bits=2).alias("z")
        ).first()
        assert z.z == 7

    def test_interleave_is_monotone_per_dim(self, spark):
        df = spark.createDataFrame([(x, 0) for x in range(8)], ["x", "y"])
        zs = [
            r.z
            for r in df.select(
                zorder.morton_interleave([F.col("x"), F.col("y")], bits=3).alias("z")
            ).orderBy("z").collect()
        ]
        assert zs == sorted(zs) and len(set(zs)) == 8

    def test_bit_budget_guard(self):
        with pytest.raises(ValueError):
            zorder.morton_interleave([F.col("a"), F.col("b")], bits=32)

    def test_zvalue_bounds_and_null(self, spark):
        df = spark.createDataFrame(
            [(0.0, 10.0), (50.0, None), (100.0, 20.0)], ["a", "b"]
        )
        out = df.select(zorder.zvalue(df, ["a", "b"], bits=8).alias("z"))
        vals = [r.z for r in out.collect()]
        assert all(0 <= v < (1 << 16) for v in vals)


class TestZOrderLayout:
    @pytest.fixture(scope="class")
    def lakehouse(self, spark):
        lh = Lakehouse("zorder_test", tempfile.mkdtemp())
        grid = (
            spark.range(100).select(F.col("id").alias("x"))
            .crossJoin(spark.range(100).select(F.col("id").alias("y")))
            .withColumn("payload", F.col("x") * 1000 + F.col("y"))
        )
        write_table(lh, "grid", grid)
        return lh

    def _per_file_ranges(self, spark, lh, col):
        df = read_table(spark, lh, "grid").withColumn(
            "__file", F.input_file_name()
        )
        stats = (
            df.groupBy("__file")
            .agg((F.max(col) - F.min(col)).alias("range"))
            .agg(F.avg("range").alias("avg_range"), F.count("*").alias("n_files"))
            .first()
        )
        return float(stats.avg_range), int(stats.n_files)

    def test_zorder_narrows_every_dimension(self, spark, lakehouse):
        n_files = 16
        cluster_table(spark, lakehouse, "grid", by="x", n_files=n_files)
        x_lin, _ = self._per_file_ranges(spark, lakehouse, "x")
        y_lin, _ = self._per_file_ranges(spark, lakehouse, "y")
        # 1-D clustering: x tightly packed, y spans the world
        assert x_lin < 20
        assert y_lin > 90

        info = zorder_table(spark, lakehouse, "grid", by=["x", "y"], n_files=n_files)
        assert info["files"] == n_files
        x_z, nf = self._per_file_ranges(spark, lakehouse, "x")
        y_z, _ = self._per_file_ranges(spark, lakehouse, "y")
        assert nf == n_files
        # Morton layout: BOTH dims far narrower than the 0-99 global range
        # (ideal for 16 files is ~25 per dim)
        assert x_z < 50 and y_z < 50, (x_z, y_z)

    def test_rewrite_preserves_rows(self, spark, lakehouse):
        df = read_table(spark, lakehouse, "grid")
        assert df.count() == 10_000
        agg = df.agg(F.sum("payload")).first()[0]
        expected = sum(x * 1000 + y for x in range(100) for y in range(100))
        assert agg == expected


class TestZoneMapPruning:
    @pytest.fixture(scope="class")
    def lakehouse(self, spark):
        lh = Lakehouse("zmap_test", tempfile.mkdtemp())
        rows = (
            spark.range(10_000)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 97).alias("m"),
                (F.col("id") * 3).alias("payload"),
            )
        )
        write_table(lh, "facts", rows)
        # clustered layout so per-file k ranges are narrow and disjoint
        cluster_table(spark, lh, "facts", by="k", n_files=20)
        return lh

    def test_zone_map_covers_every_file_and_row(self, spark, lakehouse):
        zm = zone_map(spark, lakehouse, "facts", ["k", "m"]).collect()
        assert len(zm) == 20
        assert sum(r.n_rows for r in zm) == 10_000
        for r in zm:
            assert r.k_min <= r.k_max and r.m_min <= r.m_max

    def test_pruned_read_same_rows_fewer_files(self, spark, lakehouse):
        lo, hi = 4_000, 4_499
        pruned, info = read_pruned(spark, lakehouse, "facts", {"k": (lo, hi)})
        plain = (
            read_table(spark, lakehouse, "facts")
            .where((F.col("k") >= lo) & (F.col("k") <= hi))
        )
        assert sorted(map(tuple, pruned.collect())) == sorted(
            map(tuple, plain.collect())
        )
        assert info["files_total"] == 20
        # a 5% k-range over a k-clustered layout must skip most files
        assert info["files_read"] <= 3, info

    def test_open_bounds_and_no_match(self, spark, lakehouse):
        pruned, info = read_pruned(spark, lakehouse, "facts", {"k": (9_990, None)})
        assert pruned.count() == 10
        assert info["files_read"] <= 2
        empty, info0 = read_pruned(spark, lakehouse, "facts", {"k": (50_000, None)})
        assert empty.count() == 0 and info0["files_read"] == 0

    def test_unclustered_column_does_not_prune_but_stays_correct(
        self, spark, lakehouse
    ):
        # m cycles 0..96 in every file: zone map can't skip, rows still exact
        pruned, info = read_pruned(spark, lakehouse, "facts", {"m": (5, 5)})
        assert info["files_read"] == info["files_total"]
        assert pruned.count() == read_table(spark, lakehouse, "facts").where(
            F.col("m") == 5
        ).count()
