"""Round-10 attribution WITHIN the pack+report stage (VERDICT r9 item
#3): the round-9 table showed 'pack + report' growing ~0 -> 40.9 ->
47.0 s at 1x/4x/8x even though minhash survivors are flat (~3.5-3.6 k
rows at every mult) — a flat workload cannot legitimately cost 40 s
more, so either the stage hides a super-linear step or the prefix-delta
METHOD mis-attributes upstream work to the last stage.

This tool isolates the question: materialize the minhash survivors once
per mult (localCheckpoint — lineage truncated, so NO upstream
re-execution can leak into any timing), then time each pack+report
sub-step on the pinned input:

  1. with_token_count       (map-side token counting)
  2. greedy_pack            (applyInPandas shard walk)
  3. corpus_report          (pack_summary + per-shard roll-up)

and separately time the FULL prepare_corpus+corpus_report query and the
survivor build, so full-wall - survivor-wall gives the method's view of
'pack+report' for comparison against the checkpoint-isolated truth.

Prints RAW lines incrementally and a markdown table for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ecu_sbl_aace_datalake_spark import get_spark  # noqa: E402
from ecu_sbl_aace_datalake_spark.operators import (  # noqa: E402
    compliance as comp,
    dedup,
    packing,
    pipeline,
    textstats,
)
from tools.scaling_r9b import planted_docs  # noqa: E402

FAMS = ("permissive", "public-domain", "unknown")


def survivors_of(src):
    df = src.where(~F.coalesce(comp.opt_out_col("text"), F.lit(False)))
    df = df.where(comp.license_family_col("text").isin(*FAMS))
    df = (
        dedup.dedup_lines_within_doc(df, "doc_id", "text", out_col="__ld")
        .drop("text")
        .withColumnRenamed("__ld", "text")
    )
    tagged = textstats.with_lang_id(df, "text")
    scored = textstats.with_quality_score(tagged, "text")
    df = scored.where(
        F.col("lang_pred").isin("en") & (F.col("quality_score") >= 0.5)
    )
    normed = df.withColumn(
        "__norm",
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
    )
    df = dedup.exact_dedup(normed, ["__norm"], tiebreak=["doc_id"]).drop(
        "__norm"
    )
    return dedup.minhash_dedup(df, "doc_id", "text", threshold=0.7, bands=32)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scaling_r10_pack")
    rows = []
    for mult in (1, 4, 8):
        src = planted_docs(spark, sf_dir, mult)

        t0 = time.perf_counter()
        surv = survivors_of(src).localCheckpoint()
        n_surv = surv.count()
        w_surv = time.perf_counter() - t0
        print(f"RAW mult={mult} survivors={n_surv} build={w_surv:.2f}",
              flush=True)

        t0 = time.perf_counter()
        counted = packing.with_token_count(surv).localCheckpoint()
        counted.count()
        w_count = time.perf_counter() - t0

        t0 = time.perf_counter()
        packed = packing.greedy_pack(
            counted, 512, shard_cols=("source",), order_col="doc_id"
        ).localCheckpoint()
        packed.count()
        w_pack = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_rep = pipeline.corpus_report(packed, pack_budget=512).count()
        w_rep = time.perf_counter() - t0

        t0 = time.perf_counter()
        full = pipeline.prepare_corpus(
            src, pack_budget=512, neardup_bands=32,
            drop_opted_out=True, license_families=FAMS, line_dedup=True,
        )
        pipeline.corpus_report(full, pack_budget=512).count()
        w_full = time.perf_counter() - t0

        print(
            f"RAW mult={mult} token_count={w_count:.2f} pack={w_pack:.2f}"
            f" report={w_rep:.2f} (rows={n_rep})"
            f" | isolated_total={w_count + w_pack + w_rep:.2f}"
            f" | full_query={w_full:.2f} survivor_build={w_surv:.2f}"
            f" method_delta={max(w_full - w_surv, 0):.2f}",
            flush=True,
        )
        rows.append((mult, n_surv, w_count, w_pack, w_rep, w_surv, w_full))

    print("\n| mult | survivors | token_count s | greedy_pack s |"
          " report s | survivor build s | full query s |")
    print("|---|---|---|---|---|---|---|")
    for m, n, wc, wp, wr, ws, wf in rows:
        print(f"| {m}x | {n} | {wc:.2f} | {wp:.2f} | {wr:.2f}"
              f" | {ws:.2f} | {wf:.2f} |")


if __name__ == "__main__":
    main()
