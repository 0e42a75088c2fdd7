"""Round-11: ivf_topk expr vs arrow at 8x/32x corpus replication —
where does the Arrow fold-exact path win? Cold (fresh expressions per
variant within one session is NOT valid for JIT claims, so run one
variant per process: pass expr|arrow)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    variant = sys.argv[1]
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ecu_sbl_aace_datalake_spark import get_spark
    from ecu_sbl_aace_datalake_spark.operators import similarity
    from ecu_sbl_aace_datalake_spark.sources.io import load_table

    spark = get_spark("ivfscale", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    emb = load_table(spark, sf_dir, "embeddings")
    big = emb
    for c in range(1, mult):
        big = big.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(c * 10_000_000))
        )
    big = big.localCheckpoint()
    print(f"corpus={big.count()}")
    centroids = similarity.kmeans_fit_exact(emb, k=8, max_iter=2,
                                            train_sample=256)
    queries = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kw = {"assign": "arrow"} if variant == "arrow" else {}
    import hashlib
    for run in ("cold", "warm"):
        t0 = time.monotonic()
        rows = similarity.ivf_topk(
            big, queries, centroids, k=10, n_probe=3, **kw
        ).collect()
        t = time.monotonic() - t0
        h = hashlib.md5(str(sorted(map(tuple, rows))).encode()).hexdigest()
        print(f"{variant} {mult}x {run}: {t:.2f}s rows={len(rows)} md5={h}")
    spark.stop()


if __name__ == "__main__":
    main()
