"""Round-10 scaling row for prepare_corpus(neardup_index=) (VERDICT r9
item #7): a FIXED 500-doc batch prepared against corpora of 1x/4x/8x
size. The indexed path's wall must track the batch (flat), while the
direct pipeline over corpus ∪ batch re-runs the full banded self-join
and grows with the corpus.

Run ONE mult per process (see SCALING.md round-10 note: shared-session
ordering contaminates pipeline-scale timings):

    DIAG_MULT=4 python tools/scaling_r10_indexed.py

Prints one RAW line: index build wall (one-time, amortized over every
later batch), indexed batch-prepare wall, direct corpus∪batch wall.
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
    pipeline,
    textstats,
)
from ecu_sbl_aace_datalake_spark.sources.io import load_table  # noqa: E402

MULT = int(os.environ.get("DIAG_MULT", "1"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scaling_r10_indexed")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    parts = []
    for c in range(MULT):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * 1_000_000))
        if c > 0:
            p = p.withColumn("text", F.concat(F.lit(f"c{c} "), F.col("text")))
        parts.append(p)
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    # fixed batch: 500 docs, ids ABOVE every corpus id (incremental-ingest
    # convention the equality argument needs); text word-reversed so the
    # batch is FRESH content (verbatim batch==corpus text would be 100%
    # probe-dropped — correct, but a degenerate scaling fixture)
    batch = (
        docs.where(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000_000))
        .withColumn(
            "text",
            F.array_join(F.reverse(F.split(F.col("text"), " ")), " "),
        )
    )

    gated = (
        textstats.with_quality_score(
            textstats.with_lang_id(corpus, "text"), "text"
        )
        .where((F.col("lang_pred") == "en") & (F.col("quality_score") >= 0.5))
        .select("doc_id", "text", "source")
    )
    t0 = time.perf_counter()
    idx = dedup.persist_neardup_index(
        gated, "doc_id", bands=32,
        band_table=f"s10_bands_{MULT}", shingle_table=f"s10_shingles_{MULT}",
    )
    w_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_idx = pipeline.prepare_corpus(
        batch, pack_budget=512, neardup_bands=32, neardup_index=idx
    ).count()
    w_indexed = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_dir = pipeline.prepare_corpus(
        corpus.unionByName(batch), pack_budget=512, neardup_bands=32
    ).count()
    w_direct = time.perf_counter() - t0

    print(
        f"RAW mult={MULT} corpus_rows={MULT * 5000} index_build={w_build:.2f}"
        f" indexed_batch_prepare={w_indexed:.2f} (rows={n_idx})"
        f" direct_corpus_plus_batch={w_direct:.2f} (rows={n_dir})",
        flush=True,
    )


if __name__ == "__main__":
    main()
