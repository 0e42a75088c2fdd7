"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row-count, column
names, and an order-insensitive canonicalized value multiset.

Usage: python tools/check_oracle.py [--hostile] [--json OUT.json] [sf_dir] [query ...]

``--hostile`` replicates the driver's worst-case session: a fresh default
SparkSession with ANSI **on** and a non-UTC timezone — the engine must
defensively repin runtime confs at query entry (sources/io.py load_table)
for every query to pass. Any array/map/struct output column is flagged as a
failure in both modes: the driver's pandas canonicalizer cannot hash them.
"""

from __future__ import annotations

import datetime
import decimal
import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: collapse float noise
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def _sort_key(row):
    return tuple((v is None, type(v).__name__, str(v)) for v in row)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rows), key=_sort_key
    ), [cols[i] for i in order]


def main() -> int:
    args = sys.argv[1:]
    hostile = "--hostile" in args
    if hostile:
        args.remove("--hostile")
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod

    if hostile:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-hostile")
            .master("local[32]")
            .config("spark.driver.memory", "8g")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.sql.ansi.enabled", "true")
            .config("spark.sql.session.timeZone", "Australia/Perth")
            .getOrCreate()
        )
    else:
        from ecu_sbl_aace_datalake_spark import get_spark

        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures, passed, rows_only = [], 0, 0
    records: dict[str, dict] = {}
    import time as _time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        _t0 = _time.perf_counter()
        if hostile:
            # re-hostilize before EVERY query: each one must repin the
            # runtime confs itself (via load_table), not ride on a
            # previous query having fixed the session
            spark.conf.set("spark.sql.ansi.enabled", "true")
            spark.conf.set("spark.sql.session.timeZone", "Australia/Perth")
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        try:
            sdf = fn(spark, sf_dir)
            complex_cols = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                failures.append(
                    (name, f"COMPLEX OUTPUT (driver canonicalizer cannot hash): {complex_cols}")
                )
                records[name] = {"status": "fail", "reason": "complex-output",
                                 "wall_s": round(_time.perf_counter() - _t0, 2)}
                continue
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {str(e)[:400]}"))
            records[name] = {"status": "fail", "reason": "spark-error",
                             "wall_s": round(_time.perf_counter() - _t0, 2)}
            continue
        if name not in oracles:
            rows_only += 1
            print(f"  [rows-only] {name}: {len(srows)} rows")
            records[name] = {"status": "rows-only", "rows": len(srows),
                             "wall_s": round(_time.perf_counter() - _t0, 2)}
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {str(e)[:400]}"))
            records[name] = {"status": "fail", "reason": "duckdb-error",
                             "wall_s": round(_time.perf_counter() - _t0, 2)}
            continue
        sms, sc = rows_to_multiset(scols, srows)
        dms, dc = rows_to_multiset(dcols, drows)
        wall = round(_time.perf_counter() - _t0, 2)
        if sc != dc:
            failures.append((name, f"SCHEMA: spark={sc} duckdb={dc}"))
            records[name] = {"status": "fail", "reason": "schema", "wall_s": wall}
        elif len(sms) != len(dms):
            failures.append((name, f"ROWCOUNT: spark={len(sms)} duckdb={len(dms)}"))
            records[name] = {"status": "fail", "reason": "rowcount", "wall_s": wall}
        elif sms != dms:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(sms, dms)) if a != b
            )
            failures.append((name, f"VALUES at sorted-row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}"))
            records[name] = {"status": "fail", "reason": "values", "wall_s": wall}
        else:
            passed += 1
            print(f"  [PASS] {name}: {len(sms)} rows")
            records[name] = {"status": "pass", "rows": len(sms), "wall_s": wall}

    print(f"\n{passed} passed, {rows_only} rows-only, {len(failures)} failed")
    for name, msg in failures:
        print(f"\nFAIL {name}: {msg}")
    if json_out:
        import datetime as _dt
        import json as _json

        with open(json_out, "w") as f:
            _json.dump({
                "sweep": "hostile" if hostile else "plain",
                "sf_dir": sf_dir,
                "generated_utc": _dt.datetime.now(_dt.timezone.utc).isoformat(timespec="seconds"),
                "n_pass": passed,
                "n_rows_only": rows_only,
                "n_fail": len(failures),
                "queries": records,
            }, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
