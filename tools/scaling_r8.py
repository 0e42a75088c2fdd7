"""Round-8 scaling measurement (VERDICT_r07 item #5 + new operators):

1. POOLED MMR (mmr_selection with candidate_top_m): the corpus grows
   1x/4x/8x but the greedy loop runs over a fixed top-m pool — the
   per-round cost must stay flat (only the single relevance pass scales
   with the corpus). Contrast with the unpooled form, whose EVERY round
   rescans the corpus.
2. URL canonicalization + dedup: pure map-side regexp canonicalization
   plus one hash-shuffle dedup — per-URL cost must be flat-or-falling
   as the corpus grows.
3. cap_per_group_bytes: one window shuffle per source — flat per-doc.

Replication scheme matches tools/scaling_r6.py/r7.py: k copies with
distinct ids (embeddings perturb one dimension per copy so replicas are
distinct vectors). Prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ecu_sbl_aace_datalake_spark import get_spark  # noqa: E402
from ecu_sbl_aace_datalake_spark.operators import similarity, transform, urls  # noqa: E402
from ecu_sbl_aace_datalake_spark.sources.io import load_table  # noqa: E402


def rep_emb(df, k):
    parts = []
    for c in range(k):
        part = df.withColumn("vec_id", F.col("vec_id") + F.lit(c * 1_000_000_000))
        if c > 0:
            part = part.withColumn(
                "embedding",
                F.concat(
                    F.array((F.element_at("embedding", 1) + F.lit(c * 0.001)).cast("float")),
                    F.slice("embedding", 2, 63),
                ),
            )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rep_docs(df, k):
    parts = []
    for c in range(k):
        parts.append(df.withColumn("doc_id", F.col("doc_id") + F.lit(c * 1_000_000_000)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def synth_url():
    d = F.col("doc_id")
    return F.concat(
        F.lit("https://"),
        F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("site"), (d % 7).cast("string"), F.lit(".Example.COM"),
        F.lit("/p/"), (d % 1000).cast("string"),
        F.when(d % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.lit("?utm_source=feed&b=2&a=1")).otherwise(F.lit("")),
    )


def t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scaling_r8", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    emb0 = load_table(spark, sf_dir, "embeddings")
    docs0 = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    print("| op | 1x | 4x | 8x | note |")
    print("|---|---|---|---|---|")
    rows = {}
    for name in ("mmr_pooled_k5_m20", "mmr_unpooled_k5", "url_canon_dedup", "cap_bytes"):
        rows[name] = {}
    for k in (1, 4, 8):
        emb = rep_emb(emb0, k).localCheckpoint()
        docs = rep_docs(docs0, k).localCheckpoint()
        n = emb.count()
        rows["mmr_pooled_k5_m20"][k] = min(
            t(lambda: similarity.mmr_selection(emb, 0, k=5, candidate_top_m=20).count())
            for _ in range(2)
        )
        rows["mmr_unpooled_k5"][k] = min(
            t(lambda: similarity.mmr_selection(emb, 0, k=5).count())
            for _ in range(2)
        )
        tagged = docs.withColumn("url", synth_url())
        rows["url_canon_dedup"][k] = min(
            t(lambda: urls.url_dedup(tagged, "url", tiebreak="doc_id").count())
            for _ in range(2)
        )
        rows["cap_bytes"][k] = min(
            t(lambda: transform.cap_per_group_bytes(
                docs, "source", "n_chars", 50_000, "doc_id").count())
            for _ in range(2)
        )
        print(f"(k={k}: {n} vectors / {docs.count()} docs)", file=sys.stderr)
    notes = {
        "mmr_pooled_k5_m20": "one corpus relevance pass + fixed 20-row greedy loop",
        "mmr_unpooled_k5": "every greedy round rescans the corpus (contrast)",
        "url_canon_dedup": "map-side canonicalize + one hash shuffle",
        "cap_bytes": "one window shuffle per source",
    }
    for name, vals in rows.items():
        print(
            f"| {name} | {vals[1]:.2f} s | {vals[4]:.2f} s | {vals[8]:.2f} s |"
            f" {notes[name]} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
