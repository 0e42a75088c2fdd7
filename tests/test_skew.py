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
