"""Differential query fuzzing: generate seeded random SQL (filters,
group-bys, aggregates, having, order/limit) over the fixture tables, run it
on Spark AND DuckDB, compare canonicalized results.

The templates stay in the engine-portable SQL subset (no vendor functions),
so any mismatch is a real semantics/precision divergence — the class of bug
hand-written oracle pairs can't systematically hunt.

Usage: python tools/fuzz_differential.py [n_queries] [seed] [sf_dir]
Also consumed by tests/test_fuzz.py (small n, fixed seed).
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, ".")

TABLES = {
    "orders": {
        "int": ["o_orderkey", "o_custkey"],
        "num": ["o_totalprice"],
        "str": ["o_orderstatus", "o_orderpriority"],
    },
    "lineitem": {
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "num": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "str": ["l_returnflag", "l_linestatus"],
    },
    "customer": {
        "int": ["c_custkey", "c_nationkey"],
        "num": ["c_acctbal"],
        "str": ["c_mktsegment"],
    },
}
STR_VALUES = {
    "o_orderstatus": ["O", "F", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["O", "F"],
    "c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
}


def gen_query(rng: random.Random) -> str:
    table = rng.choice(list(TABLES))
    cols = TABLES[table]

    preds = []
    for _ in range(rng.randint(0, 3)):
        kind = rng.choice(["int", "num", "str"])
        col = rng.choice(cols[kind])
        if kind == "str":
            if rng.random() < 0.5:
                preds.append(f"{col} = '{rng.choice(STR_VALUES[col])}'")
            else:
                vals = rng.sample(STR_VALUES[col], k=min(2, len(STR_VALUES[col])))
                preds.append(f"{col} IN ({', '.join(repr(v) for v in vals)})")
        elif kind == "int":
            op = rng.choice(["<", ">", "<=", ">=", "%"])
            if op == "%":
                preds.append(f"{col} % {rng.randint(2, 7)} = {rng.randint(0, 1)}")
            else:
                preds.append(f"{col} {op} {rng.randint(1, 5000)}")
        else:
            op = rng.choice(["<", ">"])
            preds.append(f"{col} {op} {rng.randint(1, 200) * 500}.0")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""

    group_cols = rng.sample(cols["str"] + cols["int"][:1], k=rng.randint(0, 2))
    aggs = []
    for _ in range(rng.randint(1, 3)):
        fn = rng.choice(["COUNT", "SUM", "MIN", "MAX", "AVG"])
        is_int = rng.random() < 0.4
        col = rng.choice(cols["int"] if is_int else cols["num"])
        alias = f"a{len(aggs)}"
        # type discipline mirrors the hand-written oracles: integer aggs are
        # CAST to BIGINT on both engines (Spark SUM(int)->bigint vs DuckDB
        # ->int128/double would otherwise diverge), double aggs are ROUNDed
        if fn == "COUNT":
            aggs.append(f"CAST(COUNT({col}) AS BIGINT) AS {alias}")
        elif is_int and fn in ("SUM", "MIN", "MAX"):
            aggs.append(f"CAST({fn}({col}) AS BIGINT) AS {alias}")
        elif fn in ("SUM", "AVG"):
            aggs.append(f"ROUND({fn}(CAST({col} AS DOUBLE)), 3) AS {alias}")
        else:
            aggs.append(f"{fn}({col}) AS {alias}")

    if group_cols:
        select = ", ".join(group_cols + aggs)
        sql = f"SELECT {select} FROM {table}{where} GROUP BY {', '.join(group_cols)}"
        if rng.random() < 0.3:
            sql += " HAVING COUNT(*) > 1"
    else:
        sql = f"SELECT {', '.join(aggs)} FROM {table}{where}"
    return sql


def run_fuzz(n: int = 50, seed: int = 7, sf_dir: str = "/root/testdata/sf0.01"):
    """Returns (passed, failures:list[(sql, reason)])."""
    import duckdb

    from tools.check_oracle import rows_to_multiset

    from ecu_sbl_aace_datalake_spark import get_spark
    from ecu_sbl_aace_datalake_spark.sources.io import load_table

    rng = random.Random(seed)
    spark = get_spark("fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    passed, failures = 0, []
    for _ in range(n):
        sql = gen_query(rng)
        try:
            sdf = spark.sql(sql)
            sms, sc = rows_to_multiset(sdf.columns, [tuple(r) for r in sdf.collect()])
            res = con.execute(sql)
            dms, dc = rows_to_multiset(
                [d[0] for d in res.description], res.fetchall()
            )
            if sc != dc:
                failures.append((sql, f"schema {sc} != {dc}"))
            elif sms != dms:
                diff = next(
                    (i, a, b)
                    for i, (a, b) in enumerate(
                        zip(sms + [None] * len(dms), dms + [None] * len(sms))
                    )
                    if a != b
                )
                failures.append((sql, f"values at {diff[0]}: {diff[1]} != {diff[2]}"))
            else:
                passed += 1
        except Exception as e:  # noqa: BLE001 - fuzzing surfaces anything
            failures.append((sql, f"{type(e).__name__}: {str(e)[:200]}"))
    return passed, failures


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    passed, failures = run_fuzz(n, seed, sf)
    print(f"{passed}/{n} matched")
    for sql, reason in failures:
        print(f"\nFAIL: {sql}\n  {reason}")
    raise SystemExit(1 if failures else 0)
