"""Round-8 continuation scaling measurement: 1x/4x/8x corpus replication
for the new operator families —

1. template_clusters — must scale like exact dedup (one hash-shuffle on
   the 32-hex template key); wall should grow ~linearly with rows, per-doc
   cost flat-or-falling.
2. dedup_lines_within_doc — pure map-side higher-order expressions; zero
   shuffles, so per-doc cost must be flat.
3. binary_topk vs cosine_topk vs quantized_topk at a FIXED query set over
   a growing corpus — all three are map-side candidate scans + rerank;
   the claim to verify is that the binary Hamming stage does not grow
   faster than the float scan (the 32x bandwidth win is the 100 TB
   argument; local[32] is compute-bound, so parity is the pass bar).
4. link_prediction_scores with max_witness_degree — the capped wedge join
   must grow with the CAPPED wedge count, not the hub blowup.

Replication matches tools/scaling_r7.py (distinct ids, per-copy token
perturbation). Prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ecu_sbl_aace_datalake_spark import get_spark  # noqa: E402
from ecu_sbl_aace_datalake_spark.operators import (  # noqa: E402
    dedup,
    graph,
    similarity,
    textstats,
)
from ecu_sbl_aace_datalake_spark.sources.io import load_table  # noqa: E402


def replicate(df, k, id_col, text=True):
    parts = []
    for c in range(k):
        part = df.withColumn(id_col, F.col(id_col) + F.lit(c * 1_000_000_000))
        if c > 0 and text:
            part = part.withColumn(
                "text", F.concat(F.lit(f"v{c} "), F.col("text"))
            )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return time.perf_counter() - t0, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "scaling-r8b", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 20 == 0)
        .select("l_orderkey", "l_suppkey")
    )

    rows = []
    for k in (1, 4, 8):
        d = replicate(docs, k, "doc_id")
        n_docs = d.count()

        w, _ = timed(lambda: textstats.template_clusters(d).count())
        rows.append(("template_clusters", k, n_docs, w))

        w, _ = timed(
            lambda: dedup.dedup_lines_within_doc(d)
            .agg(F.sum(F.length("text_deduped"))).collect()
        )
        rows.append(("dedup_lines_within_doc", k, n_docs, w))

        e = replicate(emb, k, "vec_id", text=False)
        n_vecs = e.count()
        w, _ = timed(
            lambda: similarity.binary_topk(e, queries, k=10).count()
        )
        rows.append(("binary_topk", k, n_vecs, w))
        w, _ = timed(
            lambda: similarity.cosine_topk(e, queries, k=10).count()
        )
        rows.append(("cosine_topk (exact)", k, n_vecs, w))

        # edges replicate by shifting both endpoints into a disjoint id
        # space per copy (k disjoint copies of the same graph)
        parts = []
        for c in range(k):
            parts.append(
                li.select(
                    (F.col("l_orderkey") + F.lit(c * 1_000_000_000)).alias(
                        "l_orderkey"
                    ),
                    (F.col("l_suppkey") + F.lit(c * 1_000_000)).alias(
                        "l_suppkey"
                    ),
                )
            )
        lik = parts[0]
        for p in parts[1:]:
            lik = lik.unionByName(p)
        a, b = lik.alias("x"), lik.alias("y")
        edges = (
            a.join(b, F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            .where(F.col("x.l_suppkey") < F.col("y.l_suppkey"))
            .select(
                F.col("x.l_suppkey").alias("src"),
                F.col("y.l_suppkey").alias("dst"),
            )
            .distinct()
        )
        n_edges = edges.count()
        w, _ = timed(
            lambda: graph.link_prediction_scores(
                edges, min_common=2, max_witness_degree=64
            ).count()
        )
        rows.append(("link_prediction (deg<=64)", k, n_edges, w))

    print("| operator | k | rows | wall s | s per 1k rows |")
    print("|---|---|---|---|---|")
    for op, k, n, w in rows:
        print(f"| {op} | {k}x | {n} | {w:.2f} | {1000 * w / n:.4f} |")
    spark.stop()


if __name__ == "__main__":
    main()
