"""Full-registry timing sweep (VERDICT_r07 item #6): ONE timed run of
EVERY registered query at $SPARK_GRAFT_SF_DIR (default sf0.1), so no
query can hide a pathological plan outside the audited headline set.
Single run (medians reserved for the headline bench); calib rows
included for box normalization. Writes BENCH_DETAIL_full.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ecu_sbl_aace_datalake_spark import get_spark  # noqa: E402
from ecu_sbl_aace_datalake_spark.plans.driver_queries import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "bench_full", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["flagship_pricing_summary"](spark, sf_dir).count()  # warmup

    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    calib = {}
    for name, fn in {
        "calib_cpu": lambda: spark.range(1_000_000_000)
        .select(F.sum(F.xxhash64("id")).alias("h")).count(),
        "calib_scan": lambda: lineitem.select(
            F.sum("l_extendedprice").alias("s"), F.count("*").alias("n")
        ).count(),
    }.items():
        fn()
        t0 = time.perf_counter()
        fn()
        calib[name] = round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # record, keep sweeping
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        print(f"{name}: {timings.get(name, 'ERR')}", file=sys.stderr, flush=True)

    out = {
        "metric": "full_registry_single_run",
        "n_queries": len(timings),
        "n_errors": len(errors),
        "total_sec": round(sum(timings.values()), 3),
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        **calib,
        "queries": dict(sorted(timings.items(), key=lambda kv: -kv[1])),
        "errors": errors,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL_full.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    spark.stop()


if __name__ == "__main__":
    main()
