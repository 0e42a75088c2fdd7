"""Sequence-packing invariants: the properties a trainer relies on."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ecu_sbl_aace_datalake_spark.operators import packing
from ecu_sbl_aace_datalake_spark.sources.io import load_table

BUDGET = 64


@pytest.fixture(scope="module")
def counted(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    return packing.with_token_count(docs).cache()


class TestTokenCount:
    def test_matches_whitespace_split(self, spark):
        df = spark.createDataFrame(
            [("a b  c",), ("  ",), ("one",), (None,)], ["text"]
        )
        got = [r.n_tokens for r in packing.with_token_count(df).collect()]
        assert got == [3, 0, 1, 0]


class TestGreedyPack:
    def test_every_doc_assigned_once(self, counted):
        packed = packing.greedy_pack(counted, BUDGET)
        assert packed.count() == counted.count()
        assert packed.select("doc_id").distinct().count() == counted.count()

    def test_no_pack_overflows_unless_singleton(self, counted):
        packed = packing.greedy_pack(counted, BUDGET)
        bad = (
            packed.groupBy("source", "pack_id")
            .agg(F.sum("n_tokens").alias("tok"), F.count("*").alias("n"))
            .where((F.col("tok") > BUDGET) & (F.col("n") > 1))
        )
        assert bad.count() == 0, bad.collect()[:5]

    def test_pack_ids_dense_from_zero(self, counted):
        packed = packing.greedy_pack(counted, BUDGET)
        per_shard = packed.groupBy("source").agg(
            F.min("pack_id").alias("lo"),
            F.max("pack_id").alias("hi"),
            F.countDistinct("pack_id").alias("n"),
        )
        off = per_shard.where(
            (F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)
        )
        assert off.count() == 0

    def test_monotone_in_doc_order(self, counted):
        packed = packing.greedy_pack(counted, BUDGET)
        from pyspark.sql import Window

        w = Window.partitionBy("source").orderBy("doc_id")
        regress = packed.withColumn("prev", F.lag("pack_id").over(w)).where(
            F.col("prev").isNotNull() & (F.col("pack_id") < F.col("prev"))
        )
        assert regress.count() == 0

    def test_oversized_doc_gets_own_pack(self, spark):
        df = spark.createDataFrame(
            [(1, 10, "s"), (2, 500, "s"), (3, 10, "s")],
            ["doc_id", "n_tokens", "source"],
        )
        packed = {
            r.doc_id: r.pack_id
            for r in packing.greedy_pack(df, BUDGET, token_col="n_tokens").collect()
        }
        # doc 2 overflows any pack: alone; docs 1 and 3 in different packs
        # (greedy is sequential, not bin-repacking)
        assert packed[1] != packed[2] and packed[2] != packed[3]

    def test_deterministic(self, counted):
        a = sorted(
            map(tuple, packing.greedy_pack(counted, BUDGET).collect())
        )
        b = sorted(
            map(tuple, packing.greedy_pack(counted, BUDGET).collect())
        )
        assert a == b


class TestFfdPack:
    def test_assignment_complete_and_budget_respected(self, counted):
        packed = packing.ffd_pack(counted, BUDGET)
        assert packed.count() == counted.count()
        bad = (
            packed.groupBy("source", "pack_id")
            .agg(F.sum("n_tokens").alias("tok"), F.count("*").alias("n"))
            .where((F.col("tok") > BUDGET) & (F.col("n") > 1))
        )
        assert bad.count() == 0

    def test_never_more_packs_than_greedy(self, counted):
        ffd_n = (
            packing.ffd_pack(counted, BUDGET)
            .groupBy("source")
            .agg(F.countDistinct("pack_id").alias("n"))
        )
        greedy_n = (
            packing.greedy_pack(counted, BUDGET)
            .groupBy("source")
            .agg(F.countDistinct("pack_id").alias("n"))
        )
        worse = (
            ffd_n.alias("f")
            .join(greedy_n.alias("g"), "source")
            .where(F.col("f.n") > F.col("g.n"))
        )
        assert worse.count() == 0

    def test_deterministic(self, counted):
        a = sorted(map(tuple, packing.ffd_pack(counted, BUDGET).collect()))
        b = sorted(map(tuple, packing.ffd_pack(counted, BUDGET).collect()))
        assert a == b

    def test_ffd_beats_greedy_on_adversarial_input(self, spark):
        # sizes 6,5,4,3,2,1 with budget 9: greedy in id order (6,5,4,3,2,1)
        # → [6], [5,4], [3,2,1]? no: 6+5>9 → packs [6],[5,4],[3,2,1] = 3;
        # sizes chosen so FFD pairs large+small: (6,3),(5,4),(2,1) = 3 too —
        # use a case where greedy wastes: 5,5,4,4 budget 9: greedy
        # [5],[5,4]... order 5,4,5,4 → [5,4],[5,4]=2, id-order 5,5,4,4 →
        # [5],[5,4],[4]=3; FFD sorts 5,5,4,4 → [5,4],[5,4]=2.
        df = spark.createDataFrame(
            [(1, 5, "s"), (2, 5, "s"), (3, 4, "s"), (4, 4, "s")],
            ["doc_id", "n_tokens", "source"],
        )
        greedy = packing.greedy_pack(df, 9, token_col="n_tokens")
        ffd = packing.ffd_pack(df, 9, token_col="n_tokens")
        assert greedy.select("pack_id").distinct().count() == 3
        assert ffd.select("pack_id").distinct().count() == 2


class TestCorpusPipeline:
    @pytest.fixture(scope="class")
    def packed(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.operators import pipeline

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "source"
        )
        return pipeline.prepare_corpus(docs, pack_budget=128).cache()

    def test_kept_subset_of_input(self, spark, sf_dir, packed):
        docs = load_table(spark, sf_dir, "documents")
        extra = packed.select("doc_id").join(
            docs.select("doc_id"), "doc_id", "left_anti"
        )
        assert extra.count() == 0
        assert 0 < packed.count() <= docs.count()

    def test_no_exact_duplicate_texts_survive(self, packed):
        normed = packed.select(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ").alias("t")
        )
        assert normed.count() == normed.distinct().count()

    def test_only_kept_langs_and_quality(self, packed):
        bad = packed.where(
            (F.col("lang_pred") != "en") | (F.col("quality_score") < 0.5)
        )
        assert bad.count() == 0

    def test_packs_respect_budget(self, packed):
        overflow = (
            packed.groupBy("source", "pack_id")
            .agg(F.sum("n_tokens").alias("tok"), F.count("*").alias("n"))
            .where((F.col("tok") > 128) & (F.col("n") > 1))
        )
        assert overflow.count() == 0

    def test_report_totals_consistent(self, spark, sf_dir, packed):
        from ecu_sbl_aace_datalake_spark.operators import pipeline

        report = pipeline.corpus_report(packed, pack_budget=128)
        totals = report.agg(
            F.sum("n_docs").alias("docs"), F.sum("sum_tokens").alias("toks")
        ).first()
        direct = packed.agg(
            F.count("*").alias("docs"), F.sum("n_tokens").alias("toks")
        ).first()
        assert (totals.docs, totals.toks) == (direct.docs, direct.toks)


class TestChunkPack:
    def test_boundaries_exact(self, spark):
        df = spark.createDataFrame(
            [(i, 30, "s") for i in range(10)], ["doc_id", "n_tokens", "source"]
        )
        packed = {
            r.doc_id: r.pack_id
            for r in packing.chunk_pack(df, 64, token_col="n_tokens").collect()
        }
        # exclusive cumsum: docs start at 0,30,60,90,... → packs 0,0,0,1,1,2,...
        assert [packed[i] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 3, 3, 4]

    def test_greedy_never_beats_chunk_fill(self, counted):
        """Chunk packing (documents straddle boundaries) always yields
        full packs except the last per shard — its pack count is a lower
        bound for greedy's."""
        chunk_n = (
            packing.chunk_pack(counted, BUDGET)
            .groupBy("source")
            .agg(F.countDistinct("pack_id").alias("n"))
        )
        greedy_n = (
            packing.greedy_pack(counted, BUDGET)
            .groupBy("source")
            .agg(F.countDistinct("pack_id").alias("n"))
        )
        worse = (
            chunk_n.alias("c")
            .join(greedy_n.alias("g"), "source")
            .where(F.col("c.n") > F.col("g.n"))
        )
        assert worse.count() == 0


class TestFullPipelineGates:
    def test_opt_in_stages_compose(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.operators import pipeline

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "source"
        )
        bench = docs.where(F.col("doc_id") < 5).select("doc_id", "text")
        corpus = docs.where(F.col("doc_id") >= 5)
        packed = pipeline.prepare_corpus(
            corpus, pack_budget=128,
            gopher_gates=True,
            paragraph_level_dedup=True,
            decontaminate_against=bench,
        )
        out = packed.select("doc_id", "text").cache()
        try:
            n = out.count()
            assert 0 < n < corpus.count()
            # decontamination: no surviving doc shares an 8-gram with bench
            from ecu_sbl_aace_datalake_spark.operators import dedup

            flags = dedup.contamination_flags(out, bench, "doc_id", n=8)
            assert flags.where("contaminated").count() == 0
            # gopher gates: no surviving doc violates the repetition rules
            from ecu_sbl_aace_datalake_spark.operators.textstats import (
                with_repetition_stats,
            )

            bad = with_repetition_stats(out).where(
                "dup_line_frac > 0.30 OR top_2gram_frac > 0.20"
            )
            assert bad.count() == 0
        finally:
            out.unpersist()

    def test_span_removal_and_lm_floor_compose(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.operators import dedup, pipeline

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "source"
        )
        packed = pipeline.prepare_corpus(
            docs, pack_budget=128,
            remove_dup_spans=True,
            lm_quality_quantile=0.1,
        )
        out = packed.select("doc_id", "text").cache()
        try:
            baseline = pipeline.prepare_corpus(docs, pack_budget=128)
            n, nb = out.count(), baseline.count()
            assert 0 < n <= nb
            # span removal: the surviving corpus has no 10-token window
            # repeated across documents
            stats = dedup.duplicate_span_stats(out, "doc_id", n=10)
            cross = stats.agg(F.sum("n_dup_spans").alias("s")).collect()[0]["s"]
            assert cross == 0
        finally:
            out.unpersist()


class TestTokenMixture:
    def test_budgets_and_determinism(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import packing

        docs = spark.createDataFrame(
            [(i, "w " * 10, "a") for i in range(20)]
            + [(100 + i, "w " * 10, "b") for i in range(20)]
            + [(200 + i, "w " * 10, "c") for i in range(5)],
            "doc_id long, text string, source string",
        )
        out = packing.sample_token_mixture(
            docs, {"a": 3.0, "b": 1.0}, total_tokens=120
        )
        rows = out.collect()
        by_src = {}
        for r in rows:
            by_src.setdefault(r.source, []).append(r)
        # budgets: a → 90 tokens → 9 docs of 10; b → 30 → 3 docs; c dropped
        assert len(by_src["a"]) == 9 and len(by_src["b"]) == 3
        assert "c" not in by_src
        assert all(r.n_tokens == 10 for r in rows)
        # deterministic across partitionings
        again = packing.sample_token_mixture(
            docs.repartition(13), {"a": 3.0, "b": 1.0}, total_tokens=120
        ).collect()
        assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in rows)

    def test_never_overshoots_budget(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import packing

        docs = spark.createDataFrame(
            [(1, "w " * 7, "a"), (2, "w " * 7, "a"), (3, "w " * 7, "a")],
            "doc_id long, text string, source string",
        )
        out = packing.sample_token_mixture(docs, {"a": 1.0}, total_tokens=20)
        total = sum(r.n_tokens for r in out.collect())
        assert total <= 20 and total == 14  # two 7-token docs fit, third doesn't


class TestPackBoundaries:
    """pack_boundaries (round 10): the cu_seqlens / attention-mask table."""

    def _check_contiguous(self, rows, base=0):
        # rows: list of Row with source, pack_id, doc_pos, start/end_offset
        from collections import defaultdict

        by_pack = defaultdict(list)
        for r in rows:
            by_pack[(r.source, r.pack_id)].append(r)
        for key, docs in by_pack.items():
            docs.sort(key=lambda r: r.doc_pos)
            assert docs[0].start_offset == base, (key, docs[0])
            assert [d.doc_pos for d in docs] == list(range(len(docs))), key
            for a, b in zip(docs, docs[1:]):
                assert b.start_offset == a.end_offset, (key, a, b)
        return by_pack

    def test_greedy_offsets_contiguous_and_sum_to_seq(self, counted):
        packed = packing.greedy_pack(counted, BUDGET)
        bounds = packing.pack_boundaries(packed)
        rows = bounds.collect()
        assert len(rows) == counted.count()
        by_pack = self._check_contiguous(rows)
        # last end_offset == pack seq length from pack_summary
        summary = {
            (r.source, r.pack_id): r.sum_tokens
            for r in packing.pack_summary(packed, BUDGET).collect()
        }
        for key, docs in by_pack.items():
            assert max(d.end_offset for d in docs) == summary[key], key

    def test_span_width_is_token_count(self, counted):
        packed = packing.greedy_pack(counted, BUDGET)
        joined = packing.pack_boundaries(packed).join(
            counted.select("doc_id", "n_tokens"), "doc_id"
        )
        bad = joined.where(
            F.col("end_offset") - F.col("start_offset") != F.col("n_tokens")
        )
        assert bad.count() == 0

    def test_composes_with_chat_template(self, counted):
        # chat template: 8 sentinel tokens per doc, 2 reserved per
        # sequence -> offsets index the SERIALIZED stream (base 2, spans
        # of n_tokens_fmt)
        packed = packing.format_aware_pack(counted, budget=512, template="chat")
        bounds = packing.pack_boundaries(
            packed, token_col="n_tokens_fmt", base_offset=2
        )
        rows = bounds.collect()
        by_pack = self._check_contiguous(rows, base=2)
        # serialized end never exceeds the budget for multi-doc packs
        from collections import defaultdict

        sizes = defaultdict(int)
        for r in rows:
            sizes[(r.source, r.pack_id)] = max(
                sizes[(r.source, r.pack_id)], r.end_offset
            )
        ndocs = {k: len(v) for k, v in by_pack.items()}
        for key, end in sizes.items():
            if ndocs[key] > 1:
                assert end <= 512, (key, end)

    def test_cross_doc_pairs_matches_boundary_mask_arithmetic(self, counted):
        # pack_attention_stats' cross_doc_pairs must equal the pair count
        # a block-diagonal mask built from pack_boundaries removes
        packed = packing.greedy_pack(counted, BUDGET)
        stats = {
            (r.source, r.pack_id): (r.cross_doc_pairs, r.total_causal_pairs)
            for r in packing.pack_attention_stats(packed).collect()
        }
        from collections import defaultdict

        spans = defaultdict(list)
        for r in packing.pack_boundaries(packed).collect():
            spans[(r.source, r.pack_id)].append(
                r.end_offset - r.start_offset
            )
        for key, widths in spans.items():
            T = sum(widths)
            total = T * (T + 1) // 2
            within = sum(t * (t + 1) // 2 for t in widths)
            assert stats[key] == (total - within, total), key


class TestPaddingWaste:
    def test_known_buckets_and_overflow(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, 60), (3, 100), (4, 700), (5, 900)],
            "doc_id long, n_tokens int",
        )
        rows = {r.bucket_bound: r for r in packing.padding_waste_report(
            df, [64, 128]
        ).collect()}
        # bucket 64: docs 10, 60 -> padded 128, real 70
        assert rows[64].n_docs == 2 and rows[64].sum_padded == 128
        assert rows[64].pad_tokens == 58
        # bucket 128: doc 100 -> padded 128
        assert rows[128].pad_tokens == 28
        # overflow: docs 700, 900 pad to max 900
        assert rows[900].n_docs == 2 and rows[900].sum_padded == 1800
        assert rows[900].pad_tokens == 200

    def test_empty_boundaries_raise(self, spark):
        df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens int")
        with pytest.raises(ValueError):
            packing.padding_waste_report(df, [])

    def test_pad_frac_vs_pack_fill(self, counted):
        # packing's waste (1 - avg fill) should beat bucketed padding
        # waste on the fixture -- the table's whole argument
        packed = packing.greedy_pack(counted, BUDGET)
        fills = packing.pack_summary(packed, BUDGET).agg(
            F.avg("fill_ratio")
        ).collect()[0][0]
        waste_pack = 1 - fills
        rep = packing.padding_waste_report(counted, [BUDGET // 2, BUDGET])
        tot = rep.agg(
            F.sum("pad_tokens").alias("p"), F.sum("sum_padded").alias("s")
        ).collect()[0]
        waste_bucket = tot.p / tot.s
        assert waste_pack < waste_bucket
