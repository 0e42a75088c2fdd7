"""Round-9 stage-attributed scaling for corpus_prepare_compliant
(VERDICT r8 item #5): 1x/4x/8x documents replication, per-stage wall
attribution via cumulative prefixes of the SAME stage order
prepare_corpus runs (doors -> line scrub -> lang/quality floor ->
exact dedup -> minhash dedup -> pack+report). Stage wall = delta
between consecutive prefix actions, so each row names the dominant
stage and the table localizes the next regression without re-deriving
the pipeline.

Prefix deltas re-execute shared upstream work per checkpoint, so
absolute sums exceed the one-shot query wall; the DELTAS are the
attribution signal. Prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ecu_sbl_aace_datalake_spark import get_spark  # noqa: E402
from ecu_sbl_aace_datalake_spark.operators import (  # noqa: E402
    compliance as comp,
    dedup,
    pipeline,
    textstats,
)
from ecu_sbl_aace_datalake_spark.sources.io import load_table  # noqa: E402


def planted_docs(spark, sf_dir, mult):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    parts = []
    for c in range(mult):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * 1_000_000_000))
        if c > 0:
            p = p.withColumn("text", F.concat(F.lit(f"v{c} "), F.col("text")))
        parts.append(p)
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionByName(p)
    d = F.col("doc_id")
    footered = rep.withColumn(
        "text",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(d % 10 == 3, F.lit(" noai"))
            .when(d % 10 == 6, F.lit(" gnu general public license version 3"))
            .otherwise(F.lit("")),
        ),
    )
    nav = F.lit("Nav | Menu")
    return footered.withColumn(
        "text",
        F.when(
            d % 4 == 0,
            F.concat(nav, F.lit("\n"), F.col("text"), F.lit("\n"), nav),
        ).otherwise(F.col("text")),
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scaling_r9b")
    fams = ("permissive", "public-domain", "unknown")
    all_rows = []
    for mult in (1, 4, 8):
        src = planted_docs(spark, sf_dir, mult)

        # cumulative prefixes mirroring prepare_corpus stage order
        def doors(df):
            df = df.where(~F.coalesce(comp.opt_out_col("text"), F.lit(False)))
            return df.where(comp.license_family_col("text").isin(*fams))

        def scrub(df):
            return (
                dedup.dedup_lines_within_doc(df, "doc_id", "text", out_col="__ld")
                .drop("text").withColumnRenamed("__ld", "text")
            )

        def floor(df):
            tagged = textstats.with_lang_id(df, "text")
            scored = textstats.with_quality_score(tagged, "text")
            return scored.where(
                F.col("lang_pred").isin("en")
                & (F.col("quality_score") >= 0.5)
            )

        def exact(df):
            normed = df.withColumn(
                "__norm",
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
            )
            return dedup.exact_dedup(
                normed, ["__norm"], tiebreak=["doc_id"]
            ).drop("__norm")

        def mh(df):
            return dedup.minhash_dedup(
                df, "doc_id", "text", threshold=0.7, bands=32
            )

        def full(df):
            packed = pipeline.prepare_corpus(
                df, pack_budget=512, neardup_bands=32,
                drop_opted_out=True, license_families=fams, line_dedup=True,
            )
            return pipeline.corpus_report(packed, pack_budget=512)

        prefixes = [
            ("doors", lambda d: doors(d)),
            ("line_scrub", lambda d: scrub(doors(d))),
            ("lang+quality", lambda d: floor(scrub(doors(d)))),
            ("exact_dedup", lambda d: exact(floor(scrub(doors(d))))),
            ("minhash_dedup", lambda d: mh(exact(floor(scrub(doors(d)))))),
            ("pack+report", full),
        ]
        walls, prev = [], 0.0
        for name, fn in prefixes:
            t0 = time.perf_counter()
            n = fn(src).count()
            w = time.perf_counter() - t0
            delta = max(w - prev, 0.0)
            walls.append((name, w, delta, n))
            prev = w
            # print incrementally: an OOM at a later mult must not lose
            # the earlier measurements
            print(f"RAW mult={mult} stage={name} wall={w:.2f}"
                  f" delta={delta:.2f} rows={n}", flush=True)
        all_rows.append((mult, walls))

    print("\n| stage | " + " | ".join(
        f"{m}x delta s (rows)" for m, _ in all_rows) + " |")
    print("|---|" + "---|" * len(all_rows))
    stage_names = [n for n, _, _, _ in all_rows[0][1]]
    for i, sname in enumerate(stage_names):
        cells = []
        for _, walls in all_rows:
            name, w, delta, n = walls[i]
            cells.append(f"{delta:.2f} ({n})")
        print(f"| {sname} | " + " | ".join(cells) + " |")
    for m, walls in all_rows:
        print(f"| full-query wall {m}x | {walls[-1][1]:.2f} s |")
    spark.stop()


if __name__ == "__main__":
    main()
