"""Z-order clustering: Morton bit math + the data-skipping layout claim."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
import pytest

from ecu_sbl_aace_datalake_spark.functions import zorder
from ecu_sbl_aace_datalake_spark.sources.catalog import Lakehouse
from ecu_sbl_aace_datalake_spark.sources.io import (
    cluster_table,
    read_table,
    write_table,
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
