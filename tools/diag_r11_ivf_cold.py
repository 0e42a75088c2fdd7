"""Round-11 cold-start triage for ivf_topk (VERDICT r10 item #2): stage
timestamps of ONE cold embedding_topk_ivf at sf0.1 in a fresh process.
Usage: python tools/diag_r11_ivf_cold.py [variant]
  variant: expr (current), arrow (pandas_udf fold-exact assignment+probe)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "expr"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t0 = time.monotonic()
    from ecu_sbl_aace_datalake_spark import get_spark
    from ecu_sbl_aace_datalake_spark.operators import similarity
    from ecu_sbl_aace_datalake_spark.sources.io import load_table

    spark = get_spark("ivfcold", extra_conf={
        "spark.ui.showConsoleProgress": "false"
    })
    t1 = time.monotonic()
    emb = load_table(spark, sf_dir, "embeddings")
    emb.count()
    t2 = time.monotonic()
    centroids = similarity.kmeans_fit_exact(
        emb, k=8, max_iter=2, train_sample=256
    )
    t3 = time.monotonic()
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.ivf_topk(
        emb, queries, centroids, k=10, n_probe=3,
        **({"assign": "arrow"} if variant == "arrow" else {}),
    )
    rows = out.collect()
    t4 = time.monotonic()
    rows2 = out.collect()
    t5 = time.monotonic()
    print(f"variant={variant} rows={len(rows)}")
    print(f"session_start={t1-t0:.2f}s scan={t2-t1:.2f}s "
          f"kmeans_fit={t3-t2:.2f}s ivf_cold={t4-t3:.2f}s ivf_warm={t5-t4:.2f}s "
          f"total_cold={t4-t0:.2f}s")
    import hashlib
    h = hashlib.md5(str(sorted(map(tuple, rows))).encode()).hexdigest()
    print(f"result_md5={h}")
    spark.stop()


if __name__ == "__main__":
    main()
