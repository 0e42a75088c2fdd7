"""Round-9 scaling measurement: margin mining exact vs ANN-pooled at
1x/4x/8x corpus replication (VERDICT r8 item #1).

The exact margin_pairs pair-scan is O(n·m): at 8x per side the pair
count grows 64x. margin_pairs_pooled replaces it with IVF candidate
generation per side; with the coarse quantizer sized ~sqrt(n) (the
standard IVF sizing), per-CANDIDATE cost must stay flat while the
candidate count grows only linearly with the corpus — the flat-wall
evidence that the pooled composition is the 100 TB path.

Embeddings replicate with distinct ids and a deterministic per-copy
element perturbation (copies must not be exact duplicates or the
cosine top-k degenerates to ties). Prints a markdown table for
SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ecu_sbl_aace_datalake_spark import get_spark  # noqa: E402
from ecu_sbl_aace_datalake_spark.operators import similarity  # noqa: E402
from ecu_sbl_aace_datalake_spark.sources.io import load_table  # noqa: E402


def replicate_emb(df, k):
    parts = []
    for c in range(k):
        part = df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(c * 1_000_000_000)
        )
        if c > 0:
            # deterministic per-copy perturbation: rotate-ish bump on one
            # coordinate so copies are near but not identical
            part = part.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda v, i: F.when(
                        i == F.lit(c % 64), v + F.lit(0.37 * c)
                    ).otherwise(v),
                ),
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


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scaling_r9")
    emb = load_table(spark, sf_dir, "embeddings")
    rows = []
    for mult in (1, 4, 8):
        rep = replicate_emb(emb, mult).persist()
        n_side = rep.where(F.col("vec_id") % 2 == 0).count()
        x = rep.where(F.col("vec_id") % 2 == 0)
        y = rep.where(F.col("vec_id") % 2 == 1)
        # IVF sizing ~ sqrt(side): 8 / 16 / 24 clusters, probe 3
        n_cl = {1: 8, 4: 16, 8: 24}[mult]
        cents = similarity.kmeans_fit(rep, k=n_cl, train_sample=2048)
        # candidate count: top_m=8 per query per direction (pre-dedup)
        t_pool, n_pool = timed(
            lambda: similarity.margin_pairs_pooled(
                x, y, cents, k=4, threshold=1.0, top_m=8, n_probe=3
            ).count()
        )
        n_cand = 2 * 8 * n_side  # upper bound, both directions
        per_cand_us = t_pool / n_cand * 1e6
        if mult <= 4:
            t_exact, n_exact = timed(
                lambda: similarity.margin_pairs(
                    x, y, k=4, threshold=1.0
                ).count()
            )
            per_pair_ns = t_exact / (n_side * n_side) * 1e9
            exact_s = f"{t_exact:.2f}"
            exact_pp = f"{per_pair_ns:.1f}"
        else:
            exact_s, exact_pp = "(skipped: 64x pairs)", "-"
        rows.append(
            (mult, n_side, n_cl, f"{t_pool:.2f}", f"{per_cand_us:.2f}",
             exact_s, exact_pp, n_pool)
        )
        rep.unpersist()
    print("\n| mult | side rows | clusters | pooled wall s | "
          "pooled us/cand | exact wall s | exact ns/pair | mined |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(v) for v in r) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
