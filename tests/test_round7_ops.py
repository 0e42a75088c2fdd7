"""Round-7 operator tests: fully-wired prepare_corpus (both
decontamination doors + deterministic shuffle) and the
neardup_contamination_ids flag form."""

from __future__ import annotations

import pyspark.sql.functions as F


class TestPrepareCorpusFull:
    def _docs(self, spark):
        # distinct-word docs so bigram Jaccard is exactly constructible
        rows = [
            (1, "alpha bravo charlie delta echo foxtrot golf hotel india "
                "juliet kilo lima mike november oscar papa quebec romeo", "s0"),
            (2, "sierra tango uniform victor whiskey xray yankee zulu "
                "one two three four five six seven eight", "s0"),
            (3, "red orange yellow green blue indigo violet pink brown "
                "black white gray silver gold bronze copper", "s1"),
            (4, "north south east west up down left right front back "
                "center middle inner outer top bottom", "s1"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, source string")

    def test_both_doors_and_shuffle(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import pipeline

        docs = self._docs(spark)
        # benchmark: doc 2 verbatim (exact door) + doc 1 paraphrased with a
        # marker after every 6th word (no shared 8-gram; bigram J ~ 0.68)
        w = docs.where("doc_id = 1").collect()[0]["text"].split()
        fuzzy_bench = " ".join(
            sum(([t, "zzmk"] if (i + 1) % 6 == 0 else [t] for i, t in enumerate(w)), [])
        )
        exact_bench = docs.where("doc_id = 2").collect()[0]["text"]
        bench = spark.createDataFrame(
            [(exact_bench,), (fuzzy_bench,)], "text string"
        )
        packed = pipeline.prepare_corpus(
            docs,
            keep_langs=("en", "und"),
            min_quality=0.0,
            pack_budget=64,
            benchmark_df=bench,
            decontaminate_fuzzy_ngram=2,
            decontaminate_fuzzy_threshold=0.5,
            shuffle_salt="epoch0",
        )
        kept = {r.doc_id for r in packed.collect()}
        assert kept == {3, 4}, kept  # doc 2 exact-door, doc 1 fuzzy-door
        assert "shuffle_pos" in packed.columns
        # a different salt permutes shuffle_pos but keeps the survivor set
        packed2 = pipeline.prepare_corpus(
            docs,
            keep_langs=("en", "und"),
            min_quality=0.0,
            pack_budget=64,
            benchmark_df=bench,
            decontaminate_fuzzy_ngram=2,
            decontaminate_fuzzy_threshold=0.5,
            shuffle_salt="epoch1",
        )
        assert {r.doc_id for r in packed2.collect()} == {3, 4}
        pos = {r.doc_id: r.shuffle_pos for r in packed.collect()}
        assert sorted(pos.values()) == [0, 1]

    def test_flag_form_matches_filter_form(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        docs = self._docs(spark)
        w = docs.where("doc_id = 1").collect()[0]["text"].split()
        bench = spark.createDataFrame(
            [(" ".join(sum(([t, "zzmk"] if (i + 1) % 6 == 0 else [t]
                            for i, t in enumerate(w)), [])),)],
            "text string",
        )
        flagged = {
            r.doc_id
            for r in dedup.neardup_contamination_ids(
                docs, bench, "doc_id", n=2, threshold=0.5
            ).collect()
        }
        survivors = {
            r.doc_id
            for r in dedup.decontaminate_neardup(
                docs, bench, "doc_id", n=2, threshold=0.5
            ).collect()
        }
        assert flagged == {1}
        assert survivors == {2, 3, 4}
        all_ids = {r.doc_id for r in docs.collect()}
        assert survivors == all_ids - flagged
