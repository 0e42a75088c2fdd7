"""Round-10 diagnostic: why does the FULL prepare_corpus query cost far
more than doors+scrub+lang+exact+minhash at 4x (162.6 s vs 89.3 s
survivor build, while isolated pack+report is 1.5 s)?

Hypothesis: a lazily-persisted boundary inside the pipeline is computed
more than once within the single materializing job at larger inputs.
A/B/C at one mult:

  A. library prepare_corpus -> corpus_report count (as benched)
  B. inline replica of the same stages, LAZY persist (sanity: ~= A)
  C. inline replica with the exact boundary EAGERLY materialized
     (persist + count) before the near-dup stage

If C << A ~= B, the lazy boundary is the driver.
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
MULT = int(os.environ.get("DIAG_MULT", "4"))


def upstream(src):
    df = src.where(~F.coalesce(comp.opt_out_col("text"), F.lit(False)))
    df = df.where(comp.license_family_col("text").isin(*FAMS))
    df = (
        dedup.dedup_lines_within_doc(df, "doc_id", "text", out_col="__ld")
        .drop("text")
        .withColumnRenamed("__ld", "text")
    )
    tagged = textstats.with_lang_id(df, "text")
    scored = textstats.with_quality_score(tagged, "text")
    kept = scored.where(
        F.col("lang_pred").isin("en") & (F.col("quality_score") >= 0.5)
    )
    normed = kept.withColumn(
        "__norm",
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
    )
    return dedup.exact_dedup(normed, ["__norm"], tiebreak=["doc_id"]).drop(
        "__norm"
    )


def downstream(exact):
    pruned = dedup.minhash_dedup(
        exact, "doc_id", "text", threshold=0.7, bands=32
    )
    counted = packing.with_token_count(pruned)
    packed = packing.greedy_pack(counted, 512, shard_cols=("source",),
                                 order_col="doc_id")
    return pipeline.corpus_report(packed, pack_budget=512)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # run variants in SEPARATE processes (DIAG_VARIANT=A|B|C|ALL):
    # shared-session ordering contaminates timings (JIT warm-up, page
    # cache, leaked persist-and-forget storage)
    variants = os.environ.get("DIAG_VARIANT", "ALL").upper()
    spark = get_spark("diag_r10")
    src = planted_docs(spark, sf_dir, MULT)

    if variants in ("A", "ALL"):
        t0 = time.perf_counter()
        full = pipeline.prepare_corpus(
            src, pack_budget=512, neardup_bands=32,
            drop_opted_out=True, license_families=FAMS, line_dedup=True,
        )
        pipeline.corpus_report(full, pack_budget=512).count()
        print(f"A library lazy      : {time.perf_counter() - t0:.2f} s",
              flush=True)

    if variants in ("B", "ALL"):
        t0 = time.perf_counter()
        exact_b = upstream(src).persist()
        downstream(exact_b).count()
        print(f"B inline lazy       : {time.perf_counter() - t0:.2f} s",
              flush=True)
        exact_b.unpersist()

    if variants in ("C", "ALL"):
        t0 = time.perf_counter()
        exact_c = upstream(src).persist()
        n = exact_c.count()
        t1 = time.perf_counter()
        downstream(exact_c).count()
        print(f"C inline eager      : {time.perf_counter() - t0:.2f} s"
              f" (boundary {t1 - t0:.2f} s + rest"
              f" {time.perf_counter() - t1:.2f} s, {n} rows)", flush=True)
        exact_c.unpersist()


if __name__ == "__main__":
    main()
