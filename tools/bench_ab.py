"""Worktree A/B bench adjudicator (round 11, VERDICT r10 item #6).

calib_cpu under-predicted real-query behavior in round 10 — the
single-threaded codegen loop is not a sufficient load proxy for
shuffle-heavy queries. The adjudicator that DID settle round-10's
watch items was a same-box A/B of the previous round's tree; this tool
formalizes it:

  python tools/bench_ab.py --base <ref> --out AB_r11.json q1 q2 ...

- checks out ``--base`` into a temporary git worktree
- runs the watch queries ONE VARIANT PER PROCESS (the SCALING.md
  round-10 measurement rule: shared-session ordering spreads identical
  code 4x from warm-up alone), interleaving base/head process launches
  so box drift cancels
- each process also measures the calib_cpu probe, recorded per run
- emits a JSON the verdict can read: per-query base/head walls,
  medians, and the head/base ratio

Queries must exist in BOTH trees (watch items are by definition
round-over-round comparable). A query missing in the base tree is
recorded as {"missing_in_base": true} and skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
root = sys.argv[1]
sf_dir = sys.argv[2]
names = json.loads(sys.argv[3])
sys.path.insert(0, root)
os.chdir(root)
from ecu_sbl_aace_datalake_spark import get_spark
from ecu_sbl_aace_datalake_spark.plans.driver_queries import QUERIES
spark = get_spark("bench_ab", extra_conf={
    "spark.ui.showConsoleProgress": "false"})
# calib_cpu: the bench.py codegen probe (box-state record, not a scaler)
t0 = time.monotonic()
spark.range(1_000_000_000).selectExpr("xxhash64(id) h").selectExpr(
    "sum(h)").collect()
calib = time.monotonic() - t0
out = {"__calib_cpu": round(calib, 3)}
# one warmup query absorbs session JIT (same recipe as bench.py)
QUERIES["flagship_pricing_summary"](spark, sf_dir).count()
for n in names:
    if n not in QUERIES:
        out[n] = None
        continue
    t0 = time.monotonic()
    QUERIES[n](spark, sf_dir).count()
    out[n] = round(time.monotonic() - t0, 3)
print("ABJSON:" + json.dumps(out))
spark.stop()
"""


def run_variant(root: str, sf_dir: str, names: list[str]) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, root, sf_dir, json.dumps(names)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABJSON:"):
            return json.loads(line[len("ABJSON:"):])
    raise RuntimeError(
        f"variant at {root} produced no ABJSON line (rc={p.returncode}):\n"
        + p.stdout[-2000:] + p.stderr[-2000:]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True, help="git ref of the base tree")
    ap.add_argument("--out", default=None, help="output JSON path")
    ap.add_argument("--runs", type=int, default=2,
                    help="interleaved rounds per variant")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    head_ref = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    base_ref = subprocess.run(
        ["git", "rev-parse", args.base], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    wt = tempfile.mkdtemp(prefix="bench_ab_base_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, base_ref],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        runs: dict[str, list[dict]] = {"base": [], "head": []}
        for r in range(args.runs):
            # interleave, alternating which variant goes first per round
            order = (
                [("base", wt), ("head", REPO)]
                if r % 2 == 0
                else [("head", REPO), ("base", wt)]
            )
            for variant, root in order:
                res = run_variant(root, args.sf_dir, args.queries)
                runs[variant].append(res)
                print(f"run {r} {variant}: calib={res['__calib_cpu']}")
        out = {
            "base_ref": base_ref,
            "head_ref": head_ref,
            "sf_dir": args.sf_dir,
            "runs": args.runs,
            "calib_cpu": {
                v: [x["__calib_cpu"] for x in runs[v]] for v in runs
            },
            "queries": {},
        }
        for q in args.queries:
            b = [x[q] for x in runs["base"]]
            h = [x[q] for x in runs["head"]]
            if any(x is None for x in b):
                out["queries"][q] = {"missing_in_base": True,
                                     "head": [x for x in h]}
                continue
            bm, hm = statistics.median(b), statistics.median(h)
            out["queries"][q] = {
                "base": b, "head": h,
                "base_median": round(bm, 3), "head_median": round(hm, 3),
                "ratio": round(hm / bm, 3) if bm > 0 else None,
            }
        text = json.dumps(out, indent=1)
        if args.out:
            with open(args.out, "w") as f:
                f.write(text + "\n")
        print(text)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, capture_output=True,
        )


if __name__ == "__main__":
    main()
