"""Round-10 scaling rows for the new operator family: replicate the
input 1x/4x/8x and measure wall per op (one process per mult is NOT
needed here — each op is measured per-mult in its own fresh loop
iteration inside one session, and the CLAIM is growth SHAPE per op, so
shared-session JIT warms equally across mults after the 1x leg; the 1x
leg is therefore reported from a second pass).

Ops:
  mann_whitney / kruskal_wallis  — value-cardinality-bounded rank tests
  c4_line_filters                — map-side line scrub (expect ~linear CPU)
  gate_threshold_sweep shape     — threshold_sweep over classifier scores
  pack_boundary_offsets shape    — token count + greedy pack + boundaries
  dim_truncation_eval            — per-dim corpus scans, broadcast queries

Prints RAW rows + a markdown table for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ecu_sbl_aace_datalake_spark import get_spark  # noqa: E402
from ecu_sbl_aace_datalake_spark.operators import (  # noqa: E402
    classifier,
    ml,
    packing,
    similarity,
    textstats,
)
from ecu_sbl_aace_datalake_spark.sources.io import load_table  # noqa: E402


def replicate(df, mult, id_col):
    parts = []
    for c in range(mult):
        parts.append(df.withColumn(id_col, F.col(id_col) + F.lit(c * 10_000_000)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scaling_r10c")
    orders0 = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    docs0 = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    emb0 = load_table(spark, sf_dir, "embeddings")
    results: dict[str, dict[int, float]] = {}

    def run(name, mult, fn):
        t0 = time.perf_counter()
        fn().count()
        w = time.perf_counter() - t0
        results.setdefault(name, {})[mult] = w
        print(f"RAW {name} mult={mult} wall={w:.2f}", flush=True)

    for pass_no in (0, 1):  # pass 0 warms JIT; pass 1 is reported
        for mult in (1, 4, 8):
            orders = replicate(orders0, mult, "o_orderkey")
            docs = replicate(docs0, mult, "doc_id")
            emb = replicate(emb0, mult, "vec_id")
            q16 = emb0.where(F.col("vec_id") < 16).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            run("mann_whitney", mult, lambda: ml.mann_whitney_u(
                orders, "o_orderpriority", "o_totalprice", "1-URGENT", "5-LOW"))
            run("kruskal_wallis", mult, lambda: ml.kruskal_wallis(
                orders, "o_orderpriority", "o_totalprice"))
            run("c4_line_filters", mult, lambda: textstats.c4_line_filters(
                docs.withColumn("text", F.concat_ws(
                    "\n", F.col("text"),
                    F.lit("A second sentence with plenty of words here."),
                    F.lit("A third closing sentence with enough words too."),
                ))))
            run("threshold_sweep", mult, lambda: ml.threshold_sweep(
                classifier.classifier_scores(
                    docs, classifier.WEIGHTS_QUALITY_V1
                ).join(
                    textstats.with_quality_score(docs, "text").select(
                        "doc_id",
                        (F.col("quality_score") >= 0.5).alias("__l"),
                    ),
                    "doc_id",
                ),
                "clf_score", "__l"))
            run("pack_boundaries", mult, lambda: packing.pack_boundaries(
                packing.greedy_pack(packing.with_token_count(docs), 512)))
            run("dim_truncation_eval", mult, lambda:
                similarity.dim_truncation_eval(emb, q16, dims=[4, 16, 64], k=10))
        if pass_no == 0:
            results.clear()

    print("\n| op | 1x s | 4x s | 8x s | 8x/1x |")
    print("|---|---|---|---|---|")
    for name, row in results.items():
        r = row.get(8, 0) / max(row.get(1, 1e-9), 1e-9)
        print(f"| {name} | {row.get(1, 0):.2f} | {row.get(4, 0):.2f}"
              f" | {row.get(8, 0):.2f} | {r:.2f}x |")


if __name__ == "__main__":
    main()
