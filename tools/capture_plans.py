"""Capture `.explain("formatted")` output for named queries into
plans/<round>/<query>_<tag>.txt — the optimization-round evidence files.

Usage: python tools/capture_plans.py <tag> <query> [query ...]
       python tools/capture_plans.py <tag> --file list.txt
Round dir defaults to r12; override with $PLANS_ROUND.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans",
    os.environ.get("PLANS_ROUND", "r12"),
)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names and names[0] == "--file":
        with open(names[1]) as f:
            names = [ln.strip() for ln in f if ln.strip()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ecu_sbl_aace_datalake_spark import get_spark
    from ecu_sbl_aace_datalake_spark.plans.driver_queries import QUERIES
    from ecu_sbl_aace_datalake_spark.plans.inspect import formatted_plan

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan-capture", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = formatted_plan(df)
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
