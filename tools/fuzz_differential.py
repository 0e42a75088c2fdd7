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


JOINS = [
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
]


def gen_join_query(rng: random.Random) -> str:
    left, right, lk, rk = rng.choice(JOINS)
    how = rng.choice(["JOIN", "LEFT JOIN"])
    lcols, rcols = TABLES[left], TABLES[right]
    group = rng.choice(lcols["str"] + rcols["str"])
    num = rng.choice(lcols["num"])
    pred = ""
    if rng.random() < 0.6:
        col = rng.choice(rcols["str"])
        pred = f" WHERE {col} = '{rng.choice(STR_VALUES[col])}'"
        if how == "LEFT JOIN":
            # a WHERE on the right side turns a left join inner; keep the
            # template honest by filtering the LEFT side instead
            col = rng.choice(lcols["str"])
            pred = f" WHERE {col} = '{rng.choice(STR_VALUES[col])}'"
    return (
        f"SELECT {group}, CAST(COUNT(*) AS BIGINT) AS n, "
        f"ROUND(SUM(CAST({num} AS DOUBLE)), 3) AS s "
        f"FROM {left} {how} {right} ON {lk} = {rk}{pred} "
        f"GROUP BY {group}"
    )


def gen_window_query(rng: random.Random) -> str:
    table = rng.choice(["orders", "customer"])
    cols = TABLES[table]
    part = rng.choice(cols["str"])
    order_num = rng.choice(cols["num"])
    uniq = cols["int"][0]
    fn = rng.choice(
        ["row_number()", "rank()", "dense_rank()", f"lag({uniq}) OVER w IS NULL"]
    )
    if fn.startswith("lag"):
        expr = f"CAST({fn} AS BOOLEAN) AS w0"
    else:
        expr = f"CAST({fn} OVER w AS BIGINT) AS w0"
    return (
        f"SELECT {uniq}, {expr} FROM {table} "
        f"WINDOW w AS (PARTITION BY {part} ORDER BY {order_num}, {uniq})"
    )


def gen_subquery_query(rng: random.Random) -> str:
    """IN / NOT IN (null-free key domains) / EXISTS / scalar-subquery
    HAVING — the decorrelation surface Catalyst rewrites most."""
    kind = rng.choice(["in", "not_in", "exists", "scalar"])
    seg = rng.choice(STR_VALUES["c_mktsegment"])
    status = rng.choice(STR_VALUES["o_orderstatus"])
    if kind == "in":
        return (
            "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n FROM customer "
            "WHERE c_custkey IN (SELECT o_custkey FROM orders "
            f"WHERE o_orderstatus = '{status}') GROUP BY c_mktsegment"
        )
    if kind == "not_in":
        # o_custkey is non-null, so NOT IN has clean two-valued semantics
        return (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer "
            "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders "
            f"WHERE o_totalprice > {rng.randint(1, 300) * 1000}.0)"
        )
    if kind == "exists":
        return (
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n FROM orders o "
            "WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
            f"AND l.l_quantity > {rng.randint(20, 45)}) GROUP BY o_orderpriority"
        )
    return (
        "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n FROM customer "
        f"WHERE c_mktsegment = '{seg}' OR c_acctbal > "
        "(SELECT AVG(c_acctbal) FROM customer) GROUP BY c_mktsegment"
    )


def gen_setop_query(rng: random.Random) -> str:
    """INTERSECT / EXCEPT / UNION over key projections."""
    op = rng.choice(["INTERSECT", "EXCEPT", "UNION"])
    p1 = rng.randint(2, 5)
    p2 = rng.randint(2, 5)
    return (
        f"SELECT o_custkey AS k FROM orders WHERE o_orderkey % {p1} = 0 "
        f"{op} "
        f"SELECT o_custkey AS k FROM orders WHERE o_orderkey % {p2} = 1"
    )


def _equal_with_rounding_tolerance(a_rows, b_rows, atol: float = 1.5e-3) -> bool:
    """ROUND(x, 3) sits on a half-way boundary for some aggregates (found by
    this fuzzer at seed 123: AVG = ...7625 exactly), and engines legitimately
    disagree by one ulp-of-the-rounded-digit there — Spark rounds the decimal
    rendering HALF_UP, DuckDB rounds the binary double. Tolerate exactly
    that: numeric fields may differ by <= atol, everything else must match.
    (The hand-written oracle gate keeps strict equality; its queries are
    verified boundary-free at three scale factors.)"""
    if len(a_rows) != len(b_rows):
        return False

    # A half-way-rounded float can also SHIFT a row's position in the
    # canonical sort (seed 90210: one group's ROUND(AVG,3) differed, so
    # the zip compared unrelated group rows). Re-align by the EXACT-valued
    # fields (strings / integer renderings — group keys are always exact),
    # then tolerance-compare within each alignment group.
    from collections import defaultdict

    def is_exact(v) -> bool:
        s = str(v)
        try:
            float(s)
        except (TypeError, ValueError):
            return True  # non-numeric: exact
        return s.lstrip("-").isdigit()  # integer rendering: exact

    def exact_proj(r):
        return tuple(str(v) if is_exact(v) else None for v in r)

    ga, gb = defaultdict(list), defaultdict(list)
    for r in a_rows:
        ga[exact_proj(r)].append(r)
    for r in b_rows:
        gb[exact_proj(r)].append(r)
    if set(ga) != set(gb):
        return False
    for key in ga:
        ra = sorted(ga[key], key=lambda r: tuple(str(v) for v in r))
        rb = sorted(gb[key], key=lambda r: tuple(str(v) for v in r))
        if len(ra) != len(rb):
            return False
        for x, y in zip(ra, rb):
            for va, vb in zip(x, y):
                if va == vb:
                    continue
                try:
                    if abs(float(va) - float(vb)) <= atol:
                        continue
                except (TypeError, ValueError):
                    return False
                return False
    return True


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
    for i in range(n):
        r = rng.random()
        if r < 0.45:
            sql = gen_query(rng)
        elif r < 0.65:
            sql = gen_join_query(rng)
        elif r < 0.8:
            sql = gen_window_query(rng)
        elif r < 0.92:
            sql = gen_subquery_query(rng)
        else:
            sql = gen_setop_query(rng)
        try:
            sdf = spark.sql(sql)
            sms, sc = rows_to_multiset(sdf.columns, [tuple(r) for r in sdf.collect()])
            res = con.execute(sql)
            dms, dc = rows_to_multiset(
                [d[0] for d in res.description], res.fetchall()
            )
            if sc != dc:
                failures.append((sql, f"schema {sc} != {dc}"))
            elif sms != dms and not _equal_with_rounding_tolerance(sms, dms):
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
