"""Per-stage noop-sink prefix attribution of the corpus_prepare bench query
at sf0.1 (guide §1.4/§1.5) — where does the wall go on THIS box?

Usage: python tools/profile_r11_pipeline.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from ecu_sbl_aace_datalake_spark import get_spark
    from ecu_sbl_aace_datalake_spark.operators import dedup, packing, pipeline, textstats

    spark = get_spark("profile-pipe", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text", "source"
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def prefix(stage: str):
        tagged = textstats.with_lang_id(docs, "text")
        scored = textstats.with_quality_score(tagged, "text")
        kept = scored.where(
            F.col("lang_pred").isin("en") & (F.col("quality_score") >= 0.5)
        )
        if stage == "lang_quality":
            return kept
        normed = kept.withColumn(
            "__norm", F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        )
        exact = dedup.exact_dedup(normed, ["__norm"], tiebreak=["doc_id"]).drop("__norm")
        if stage == "exact":
            return exact
        exact = exact.persist()
        pruned = dedup.minhash_dedup(exact, "doc_id", "text", threshold=0.7, bands=16)
        if stage == "minhash":
            return pruned
        counted = packing.with_token_count(pruned, "text")
        packed = packing.greedy_pack(counted, 512, shard_cols=["source"], order_col="doc_id")
        if stage == "pack":
            return packed
        return pipeline.corpus_report(packed, pack_budget=512)

    stages = ["lang_quality", "exact", "minhash", "pack", "report"]
    # warmup full
    noop(prefix("report"))
    for st in stages:
        runs = []
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"prefix:{st} [{i}]")
            t0 = time.perf_counter()
            noop(prefix(st))
            runs.append(time.perf_counter() - t0)
        print(f"prefix {st:12s} median {statistics.median(runs):6.2f}s runs {[round(r,2) for r in runs]}", flush=True)
    # the real bench action for reference
    from ecu_sbl_aace_datalake_spark.plans.driver_queries import QUERIES
    runs = []
    for i in range(n_runs):
        t0 = time.perf_counter()
        QUERIES["corpus_prepare"](spark, sf_dir).count()
        runs.append(time.perf_counter() - t0)
    print(f"bench corpus_prepare count() median {statistics.median(runs):6.2f}s runs {[round(r,2) for r in runs]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
