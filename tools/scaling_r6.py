"""Round-6 scaling measurement: 8x corpus replication for the new
operators (byte-level BPE token counts, trained lang-id scoring,
per-group caps, exact-trained IVF). Appends nothing — prints a markdown
table to paste into SCALING.md.

Replication scheme (same as prior rounds): k copies of sf0.1 documents
with distinct ids (id + copy * 10^9) and the first token perturbed per
copy so replicas are near- not byte-dups; embeddings replicated with
distinct vec_ids for the IVF row.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ecu_sbl_aace_datalake_spark import get_spark  # noqa: E402
from ecu_sbl_aace_datalake_spark.operators import (  # noqa: E402
    bpe,
    classifier,
    similarity,
    transform,
)
from ecu_sbl_aace_datalake_spark.sources.io import load_table  # noqa: E402


def replicate(df, k, id_col):
    parts = []
    for c in range(k):
        part = df.withColumn(id_col, F.col(id_col) + F.lit(c * 1_000_000_000))
        if "text" in df.columns and c > 0:
            part = part.withColumn(
                "text", F.concat(F.lit(f"v{c} "), F.col("text"))
            )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "scaling_r6", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    emb0 = load_table(spark, sf_dir, "embeddings")

    rows = []
    for k in (1, 2, 4, 8):
        docs = replicate(docs0, k, "doc_id").persist()
        emb = replicate(emb0, k, "vec_id").persist()
        n = docs.count()
        emb.count()

        t0 = time.perf_counter()
        bpe.bpe_token_counts(
            docs, bpe.MERGES_DOCS_BYTES_V1, byte_level=True
        ).count()
        t_bpe = time.perf_counter() - t0

        t0 = time.perf_counter()
        classifier.lang_id_nb(docs, classifier.LANG_NB_V1).count()
        t_lang = time.perf_counter() - t0

        t0 = time.perf_counter()
        transform.cap_per_group(docs, "source", cap=100, id_col="doc_id").count()
        t_cap = time.perf_counter() - t0

        t0 = time.perf_counter()
        cents = similarity.kmeans_fit_exact(emb, k=8, max_iter=2, train_sample=256)
        queries = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        similarity.ivf_topk(emb, queries, cents, k=10, n_probe=3).count()
        t_ivf = time.perf_counter() - t0

        rows.append((k, n, t_bpe, t_lang, t_cap, t_ivf))
        docs.unpersist()
        emb.unpersist()
        print(
            f"k={k} docs={n} bpe={t_bpe:.1f}s lang={t_lang:.1f}s "
            f"cap={t_cap:.1f}s ivf={t_ivf:.1f}s",
            flush=True,
        )

    print("\n| k | docs | byte-BPE counts | lang_id_nb | cap_per_group | exact-IVF fit+probe |")
    print("|---|---|---|---|---|---|")
    for k, n, a, b, c, d in rows:
        print(f"| {k} | {n:,} | {a:.1f} s | {b:.1f} s | {c:.1f} s | {d:.1f} s |")
    spark.stop()


if __name__ == "__main__":
    main()
