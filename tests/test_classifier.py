"""Trained quality classifier: determinism, provenance, scoring, pipeline."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from ecu_sbl_aace_datalake_spark.operators import classifier


def _seed_labels(docs):
    from ecu_sbl_aace_datalake_spark.operators import textstats

    return textstats.with_quality_score(docs).withColumn(
        "label", (F.col("quality_score") >= 0.75).cast("int")
    )


class TestTraining:
    def test_fixed_weights_provenance(self, spark):
        """WEIGHTS_QUALITY_V1 == train_logreg(sf0.01 docs, heuristic seed,
        defaults). Training must be bit-deterministic (decimal-summed
        gradient), so this re-derivation is exact."""
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        got = classifier.train_logreg(_seed_labels(docs), "label")
        assert got == classifier.WEIGHTS_QUALITY_V1

    def test_training_learns_the_seed(self, spark, sf_dir):
        """AUC of trained scores vs seed labels > 0.95 on the fixture —
        the distillation actually works."""
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        labeled = _seed_labels(docs)
        w = classifier.train_logreg(labeled, "label", epochs=16, lr=1.0)
        rows = (
            classifier.classifier_scores(labeled, w)
            .join(labeled.select("doc_id", "label"), "doc_id")
            .collect()
        )
        pos = sorted(r.clf_score for r in rows if r.label == 1)
        neg = sorted(r.clf_score for r in rows if r.label == 0)
        import bisect

        wins = sum(bisect.bisect_left(neg, s) for s in pos)
        ties = sum(
            bisect.bisect_right(neg, s) - bisect.bisect_left(neg, s)
            for s in pos
        )
        auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
        assert auc > 0.95, auc

    def test_loss_decreases_with_epochs(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        labeled = _seed_labels(docs)

        def logloss(w):
            rows = (
                classifier.classifier_scores(labeled, w)
                .join(labeled.select("doc_id", "label"), "doc_id")
                .collect()
            )
            eps = 1e-9
            return -sum(
                r.label * math.log(max(r.clf_score, eps))
                + (1 - r.label) * math.log(max(1 - r.clf_score, eps))
                for r in rows
            ) / len(rows)

        l2 = logloss(classifier.train_logreg(labeled, "label", epochs=2))
        l16 = logloss(classifier.train_logreg(labeled, "label", epochs=16))
        assert l16 < l2


class TestScoring:
    def test_scores_in_unit_interval(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        rows = classifier.classifier_scores(
            docs, classifier.WEIGHTS_QUALITY_V1
        ).collect()
        assert len(rows) == docs.count()
        assert all(0.0 <= r.clf_score <= 1.0 for r in rows)

    def test_empty_doc_scores_bias_only(self, spark):
        df = spark.createDataFrame([(1, "")], "doc_id long, text string")
        got = classifier.classifier_scores(
            df, classifier.WEIGHTS_QUALITY_V1
        ).collect()[0].clf_score
        bias = classifier.WEIGHTS_QUALITY_V1[-1]
        want = round(1.0 / (1.0 + math.exp(-round(bias, 6))) + 1e-9, 6)
        assert got == want

    def test_scoring_plan_is_python_free(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        plan = classifier.classifier_scores(
            docs, classifier.WEIGHTS_QUALITY_V1
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestPipeline:
    def test_prepare_corpus_classifier_floor(self, spark, sf_dir):
        """Opt-in classifier floor removes the lowest-scoring docs and the
        pipeline still packs."""
        from ecu_sbl_aace_datalake_spark.operators import pipeline
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        base = pipeline.prepare_corpus(docs, min_quality=0.0)
        gated = pipeline.prepare_corpus(
            docs,
            min_quality=0.0,
            classifier_weights=classifier.WEIGHTS_QUALITY_V1,
            classifier_floor=0.55,
        )
        n_base, n_gated = base.count(), gated.count()
        assert 0 < n_gated < n_base
        # every surviving doc scores >= the floor
        scored = classifier.classifier_scores(
            docs, classifier.WEIGHTS_QUALITY_V1
        )
        kept_ids = {r.doc_id for r in gated.select("doc_id").collect()}
        for r in scored.collect():
            if r.doc_id in kept_ids:
                assert r.clf_score >= 0.55

    def test_prepare_corpus_bpe_budget(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.operators import bpe, pipeline
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        packed = pipeline.prepare_corpus(
            docs, min_quality=0.0, bpe_merges=bpe.MERGES_DOCS_V1
        )
        rows = packed.collect()
        assert rows and all(r.n_tokens > 0 for r in rows)
        # greedy_pack respects the budget for docs under it
        assert all(
            r.n_tokens <= 512 or r.pack_id is not None for r in rows
        )


class TestLangNB:
    def _synth(self, spark):
        en = [
            "the cat sat on the mat and the dog ran",
            "this is a good day for the market and the people",
            "we think that the results are strong and clear",
        ]
        es = [
            "el gato se sienta en la alfombra y el perro corre",
            "este es un buen dia para el mercado y la gente",
            "creemos que los resultados son fuertes y claros",
        ]
        de = [
            "die katze sitzt auf der matte und der hund rennt",
            "das ist ein guter tag fuer den markt und die leute",
            "wir denken dass die ergebnisse stark und klar sind",
        ]
        rows, i = [], 0
        for lang, txts in (("en", en), ("es", es), ("de", de)):
            for t in txts * 4:
                rows.append((i, t, lang))
                i += 1
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_real_signal_separates_perfectly(self, spark):
        df = self._synth(spark)
        m = classifier.train_lang_nb(df)
        pred = classifier.lang_id_nb(df, m).join(df.select("doc_id", "lang"), "doc_id")
        acc = pred.where(F.col("lang") == F.col("lang_pred")).count() / pred.count()
        assert acc == 1.0

    def test_frozen_model_provenance(self, spark):
        """LANG_NB_V1 == train_lang_nb(sf0.01 documents, 75% md5 split)."""
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        split = (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
            ).cast("long")
            % 4
        )
        got = classifier.train_lang_nb(docs.where(split != 0))
        assert got == classifier.LANG_NB_V1

    def test_heldout_accuracy_at_least_heuristic(self, spark):
        """On the held-out fixture quarter the trained model must not lose
        to the marker-token heuristic. (Fixture text is label-independent
        by construction, so both hover near the class prior — the trained
        model's edge is length-normalized calibration; REAL language
        separation is proven by test_real_signal_separates_perfectly.)"""
        from ecu_sbl_aace_datalake_spark.operators import textstats
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        split = (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
            ).cast("long")
            % 4
        )
        held = docs.where(split == 0)
        pred = classifier.lang_id_nb(held, classifier.LANG_NB_V1).join(
            held.select("doc_id", "lang"), "doc_id"
        )
        acc_nb = pred.where(F.col("lang") == F.col("lang_pred")).count() / pred.count()
        h = textstats.with_lang_id(held, "text")
        acc_h = h.where(F.col("lang") == F.col("lang_pred")).count() / h.count()
        assert acc_nb >= acc_h, (acc_nb, acc_h)

    def test_empty_and_short_texts_fall_back_to_prior(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "ab"), (4, "the quick brown fox " * 5)],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.lang_pred
            for r in classifier.lang_id_nb(df, classifier.LANG_NB_V1).collect()
        }
        # max-prior lang in LANG_NB_V1 is 'en'
        assert got[1] == "en" and got[2] == "en" and got[3] == "en"
        assert got[4] in classifier.LANG_NB_V1["langs"]
        assert len(got) == 4


class TestLangNbV2:
    """LANG_NB_V2 (round 10): the xxhash64-bucket retrain — same split,
    same recipe, ~3x cheaper per-gram hashing."""

    def test_frozen_v2_provenance(self, spark):
        """LANG_NB_V2 == train_lang_nb(sf0.01 documents, 75% md5 split,
        algo='xx') — the split stays md5-deterministic; only the gram
        bucket changed."""
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        split = (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
            ).cast("long")
            % 4
        )
        got = classifier.train_lang_nb(docs.where(split != 0), algo="xx")
        assert got == classifier.LANG_NB_V2

    def test_v2_real_signal_separates_perfectly(self, spark):
        rows = []
        corpus = {
            "aa": "kapa tala mesu rano liko " * 12,
            "bb": "zorn blitz krach wulf stein " * 12,
            "cc": "xilo quexa zuvi ñopa jilka " * 12,
        }
        i = 0
        for lang, text in corpus.items():
            for _ in range(6):
                rows.append((i, lang, text))
                i += 1
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        m = classifier.train_lang_nb(df, algo="xx")
        assert m["algo"] == "xx"
        pred = classifier.lang_id_nb(df, m).join(
            df.select("doc_id", "lang"), "doc_id"
        )
        acc = pred.where(F.col("lang") == F.col("lang_pred")).count() / pred.count()
        assert acc == 1.0

    def test_v2_empty_short_fallback(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "ab")], "doc_id long, text string"
        )
        got = {
            r.doc_id: r.lang_pred
            for r in classifier.lang_id_nb(df, classifier.LANG_NB_V2).collect()
        }
        assert got == {1: "en", 2: "en", 3: "en"}


class TestXxhashOracleParity:
    """The DuckDB XXH64 SQL replica (driver_queries._sql_xxh64_bucket)
    must be bit-exact with Spark's xxhash64 bucket on real text —
    including multi-byte UTF-8 (zh) and every small-input length path
    (8-byte round, 4-byte word, tail bytes)."""

    def test_python_reference_matches_spark(self, spark):
        # pure-Python reference XXH64(seed=42) == F.xxhash64 on strings
        # covering 1..40 bytes (stripe path included for completeness)
        P1, P2 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F
        P3, P4, P5 = 0x165667B19E3779F9, 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
        M = (1 << 64) - 1

        def rotl(x, r):
            return ((x << r) | (x >> (64 - r))) & M

        def rnd(acc, inp):
            return (rotl((acc + inp * P2) & M, 31) * P1) & M

        def xxh64(data, seed=42):
            n, i = len(data), 0
            if n >= 32:
                v = [(seed + P1 + P2) & M, (seed + P2) & M, seed, (seed - P1) & M]
                while i + 32 <= n:
                    for t in range(4):
                        v[t] = rnd(v[t], int.from_bytes(data[i:i + 8], "little"))
                        i += 8
                h = (rotl(v[0], 1) + rotl(v[1], 7) + rotl(v[2], 12) + rotl(v[3], 18)) & M
                for x in v:
                    h = ((h ^ rnd(0, x)) * P1 + P4) & M
            else:
                h = (seed + P5) & M
            h = (h + n) & M
            while i + 8 <= n:
                h = (rotl(h ^ rnd(0, int.from_bytes(data[i:i + 8], "little")), 27) * P1 + P4) & M
                i += 8
            while i + 4 <= n:
                h = (rotl(h ^ ((int.from_bytes(data[i:i + 4], "little") * P1) & M), 23) * P2 + P3) & M
                i += 4
            while i < n:
                h = (rotl(h ^ ((data[i] * P5) & M), 11) * P1) & M
                i += 1
            h ^= h >> 33
            h = (h * P2) & M
            h ^= h >> 29
            h = (h * P3) & M
            return h ^ (h >> 32)

        def signed(x):
            return x - (1 << 64) if x >= (1 << 63) else x

        tests = ["a", "ab", "abc", "abcd", "abcdefgh", "abcdefghi",
                 "abcdefghijkl", "ü", "üüü", "中文字", "中a文b字c",
                 "x" * 31, "y" * 32, "z" * 40, ""]
        df = spark.createDataFrame([(t,) for t in tests], "s string")
        sp = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
        for t in tests:
            assert signed(xxh64(t.encode())) == sp[t], t

    def test_duckdb_fragment_matches_spark_on_fixture_trigrams(self, spark):
        import duckdb

        from ecu_sbl_aace_datalake_spark.operators.classifier import (
            _char_ngram_buckets,
        )
        from ecu_sbl_aace_datalake_spark.plans.driver_queries import (
            _sql_xxh64_bucket,
        )
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        sp = sorted(
            (r.doc_id, r.b, r.c)
            for r in docs.select(
                "doc_id",
                F.explode(_char_ngram_buckets("text", 3, 128, "xx")).alias("b"),
            )
            .groupBy("doc_id", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.01/documents.parquet'"
        )
        duck = con.execute(f"""
WITH g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(text) - 1, 1)),
                               i -> substring(text, i, 3))) AS gram
  FROM documents
)
SELECT doc_id, b, COUNT(*) AS c FROM ({_sql_xxh64_bucket(128)})
GROUP BY 1, 2 ORDER BY 1, 2
""").fetchall()
        assert sp == [tuple(x) for x in duck]
