"""Round-7 scaling measurement (VERDICT_r06 item #7): 64x corpus
replication for the two flagship LLM paths SCALING.md previously only
covered to 8x —

1. the PERSISTED near-dup index probe: the corpus index is built per k
   (build time reported separately), then a FIXED 500-doc batch probes it
   via the bucketed band tables. The per-batch probe cost must stay flat
   as the corpus grows 64x (bucket-pruned candidate join, no corpus-side
   exchange).
2. cap_per_group + token_mixture composed: per-source contribution caps
   followed by weighted token-budget mixture sampling — one window shuffle
   plus one cumulative window; per-doc cost must be flat-or-falling.

Replication scheme matches tools/scaling_r6.py: k copies of sf0.1
documents with distinct ids and a per-copy first-token perturbation so
replicas are near- not byte-dups. Prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ecu_sbl_aace_datalake_spark import get_spark  # noqa: E402
from ecu_sbl_aace_datalake_spark.operators import dedup, packing, transform  # noqa: E402
from ecu_sbl_aace_datalake_spark.sources.io import load_table  # noqa: E402


def replicate(df, k, id_col):
    parts = []
    for c in range(k):
        part = df.withColumn(id_col, F.col(id_col) + F.lit(c * 1_000_000_000))
        if c > 0:
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
        "scaling_r7", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    # fixed probe batch: 500 docs, half near-dups of corpus docs (prefix
    # perturbation), half fresh — constant across k
    batch = (
        docs0.where(F.col("doc_id") < 500)
        .withColumn("doc_id", F.col("doc_id") + F.lit(5_000_000_000))
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0, F.concat(F.lit("probe "), F.col("text"))
            ).otherwise(F.reverse(F.col("text"))),
        )
        .persist()
    )
    batch.count()

    rows = []
    for k in (1, 8, 64):
        docs = replicate(docs0, k, "doc_id").persist()
        n = docs.count()

        t0 = time.perf_counter()
        idx = dedup.persist_neardup_index(
            docs, "doc_id",
            band_table=f"r7_bands_k{k}", shingle_table=f"r7_shingles_k{k}",
        )
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        dedup.neardup_pairs_against_index(batch, "doc_id", idx).count()
        t_probe = time.perf_counter() - t0

        t0 = time.perf_counter()
        capped = transform.cap_per_group(docs, "source", cap=100 * k, id_col="doc_id")
        packing.sample_token_mixture(
            capped, {"src0": 3.0, "src1": 1.0, "src2": 1.0},
            total_tokens=1500 * k,
        ).count()
        t_mix = time.perf_counter() - t0

        rows.append((k, n, t_build, t_probe, t_mix))
        docs.unpersist()
        for tbl in (f"r7_bands_k{k}", f"r7_shingles_k{k}"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        print(
            f"k={k} docs={n} index_build={t_build:.1f}s probe={t_probe:.1f}s "
            f"cap+mixture={t_mix:.1f}s",
            flush=True,
        )

    print("\n| k | docs | index build | fixed-batch probe | cap_per_group + token_mixture |")
    print("|---|---|---|---|---|")
    for k, n, a, b, c in rows:
        print(f"| {k} | {n:,} | {a:.1f} s | {b:.1f} s | {c:.1f} s |")
    spark.stop()


if __name__ == "__main__":
    main()
