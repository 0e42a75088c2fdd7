"""Unit tests for operators/compliance.py — license tagging ladder
precedence, SPDX override, opt-out flags, and the per-source report."""

from __future__ import annotations

from ecu_sbl_aace_datalake_spark.operators import compliance


def _tag_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = compliance.tag_licenses(df).collect()[0]
    return r.license_id, r.license_family, r.opted_out


class TestLicenseLadder:
    def test_spdx_wins_over_body_text(self, spark):
        # body says GPL, SPDX header says MIT — SPDX wins
        lic, fam, _ = _tag_one(
            spark,
            "SPDX-License-Identifier: MIT\nGNU General Public License, "
            "version 3 applies to bundled bits",
        )
        assert (lic, fam) == ("MIT", "permissive")

    def test_unknown_spdx_falls_through_to_ladder(self, spark):
        lic, fam, _ = _tag_one(
            spark, "SPDX-License-Identifier: WTFPL\nmit license text here"
        )
        assert (lic, fam) == ("MIT", "permissive")

    def test_lgpl_not_swallowed_by_gpl3(self, spark):
        lic, fam, _ = _tag_one(spark, "Shipped under LGPL-3.0 terms.")
        assert (lic, fam) == ("LGPL-2.1", "weak-copyleft")

    def test_agpl_before_gpl(self, spark):
        lic, fam, _ = _tag_one(
            spark, "GNU Affero General Public License version 3"
        )
        assert (lic, fam) == ("AGPL-3.0", "copyleft")

    def test_gpl_versions_distinguished(self, spark):
        assert _tag_one(
            spark,
            "under the terms of the GNU General Public License, as "
            "published by the Free Software Foundation, version 2",
        )[0] == "GPL-2.0"
        assert _tag_one(spark, "licensed gpl-3.0")[0] == "GPL-3.0"

    def test_cc_precedence_nc_sa_by(self, spark):
        assert _tag_one(
            spark, "Creative Commons Attribution-NonCommercial 4.0"
        )[0] == "CC-BY-NC-4.0"
        assert _tag_one(
            spark, "Creative Commons Attribution-ShareAlike 4.0"
        )[0] == "CC-BY-SA-4.0"
        assert _tag_one(
            spark, "Creative Commons Attribution 4.0 International"
        )[0] == "CC-BY-4.0"

    def test_proprietary_catch_all_is_last(self, spark):
        # a permissive notice that ALSO says "all rights reserved"
        # (the MIT preamble does) must tag as MIT, not Proprietary
        lic, _, _ = _tag_one(
            spark,
            "Copyright (c) 2024. All rights reserved.\n"
            "Permission is hereby granted, free of charge, to any person",
        )
        assert lic == "MIT"
        assert _tag_one(spark, "(c) 2024 MegaCorp. All Rights Reserved.")[
            0
        ] == "Proprietary"

    def test_no_match_is_null_unknown(self, spark):
        lic, fam, out = _tag_one(spark, "just an ordinary paragraph")
        assert lic is None and fam == "unknown" and out is False

    def test_null_text(self, spark):
        lic, fam, out = _tag_one(spark, None)
        assert lic is None and fam == "unknown" and out is None


class TestOptOut:
    def test_opt_out_tokens(self, spark):
        for t in (
            '<meta name="robots" content="noai, noimageai">',
            "X-Robots-Tag: noindex",
            "tdm-reservation: 1",
            "see TDMRep policy",
            "do notrain on this",
        ):
            assert _tag_one(spark, t)[2] is True, t

    def test_substring_does_not_trigger(self, spark):
        # 'noai'/'noindex' must be whole tokens
        assert _tag_one(spark, "paranoia and renoindexing")[2] is False


class TestComplianceReport:
    def test_counts_and_rates(self, spark):
        rows = [
            (1, "s1", "mit license"),
            (2, "s1", "gpl-3.0 terms"),
            (3, "s1", "plain text"),
            (4, "s1", "noai. all rights reserved"),
            (5, "s2", "cc by-nc content"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {
            r.source: r.asDict()
            for r in compliance.compliance_report(df).collect()
        }
        s1 = got["s1"]
        assert s1["n_docs"] == 4 and s1["n_licensed"] == 3
        assert s1["frac_permissive"] == 0.25
        assert s1["frac_copyleft"] == 0.25
        assert s1["frac_proprietary"] == 0.25
        assert s1["frac_opted_out"] == 0.25
        s2 = got["s2"]
        assert s2["frac_noncommercial"] == 1.0 and s2["frac_opted_out"] == 0.0


class TestTemplateSpam:
    def test_slot_masking_and_clustering(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import textstats

        spam = [
            (i, f"WIN ${i*7} now at https://p{i%2}.ex.com/c?id={i} "
                f"mail bot{i}@ex.com code {'%012x' % (i * 99991)}")
            for i in range(1, 7)
        ]
        rows = spam + [
            (100, "an ordinary paragraph about geese"),
            (101, "an ordinary paragraph about geese"),  # exact dup pair
            (102, "something else entirely"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = textstats.template_clusters(df, min_docs=3).collect()
        by_spam = {r.is_spam: r for r in got if r.n_docs > 1}
        spam_c = by_spam[True]
        assert spam_c.n_docs == 6 and spam_c.n_distinct_raw == 6
        assert spam_c.slot_variability == 1.0 and spam_c.min_id == 1
        # the exact-dup pair is NOT template spam (1 distinct raw)
        dup_c = by_spam[False]
        assert dup_c.n_docs == 2 and dup_c.n_distinct_raw == 1

    def test_template_normalization_contract(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import textstats
        import pyspark.sql.functions as F

        df = spark.createDataFrame(
            [(1, "Visit https://a.b/x?u=1 or mail A.b-c%d@host.org "
                 "ref deadbeef1234 on 2024-05-06\t\tnow")],
            "doc_id long, text string",
        )
        tpl = df.select(
            textstats.template_col("text").alias("t")
        ).collect()[0].t
        assert tpl == "visit <url> or mail <email> ref <hex> on 0-0-0 now"

    def test_short_template_not_flagged(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import textstats

        # many docs collapsing to a tiny template must not flag
        df = spark.createDataFrame(
            [(i, str(i)) for i in range(10)], "doc_id long, text string"
        )
        got = textstats.template_clusters(df, min_docs=3).collect()
        assert len(got) == 1 and not got[0].is_spam


class TestReadability:
    def test_known_sentence(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import textstats

        # "the cat sat on the mat." -> 6 words, 1 sentence, 6 syllables
        df = spark.createDataFrame(
            [(1, "The cat sat on the mat."), (2, ""), (3, None),
             (4, "Incomprehensibility notwithstanding, heterogeneous "
                 "phenomenological methodologies persist!")],
            "doc_id long, text string",
        )
        from ecu_sbl_aace_datalake_spark.operators.textstats import (
            readability_scores,
        )
        got = {r.doc_id: r for r in readability_scores(df).collect()}
        r1 = got[1]
        assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (6, 1, 6)
        # flesch = 206.835 - 1.015*6 - 84.6*1 = 116.145
        assert r1.flesch == 116.145
        assert got[2].n_words == 0 and got[2].flesch is None
        assert got[3].flesch is None
        # polysyllabic monster scores much lower / higher grade
        assert got[4].flesch < 10 and got[4].fk_grade > 15


class TestLineDedupWithinDoc:
    def test_first_kept_blanks_preserved(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        rows = [
            (1, "Home | About\nreal content\nHome | About\nmore\nhome   | about"),
            (2, "a\n\nb\n\na"),
            (3, None),
            (4, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r.text_deduped
               for r in dedup.dedup_lines_within_doc(df).collect()}
        # normalized key: casing/whitespace variants collapse to first form
        assert got[1] == "Home | About\nreal content\nmore"
        # blank lines survive as structure
        assert got[2] == "a\n\nb\n"
        assert got[3] is None and got[4] == ""


class TestPipelineComplianceStages:
    def test_compliance_and_line_dedup_in_prepare_corpus(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import pipeline

        rows = [
            (1, "the quick brown fox jumps over the lazy dog today", "s0"),
            (2, "the cat sat on the mat and watched the rain fall "
                "gnu general public license version 3", "s0"),  # copyleft
            (3, "the sun rose over the hills and the valley below "
                "noai", "s0"),                                   # opted out
            (4, "Nav | Menu\nthe ship sailed out across the open sea "
                "at dawn\nNav | Menu", "s0"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = pipeline.prepare_corpus(
            df,
            keep_langs=("en",),
            min_quality=0.0,
            drop_opted_out=True,
            license_families=("permissive", "unknown"),
            line_dedup=True,
        )
        got = {r.doc_id: r.text for r in out.collect()}
        assert set(got) == {1, 4}
        # doc 4's trailing nav chrome was scrubbed before hashing
        assert got[4] == (
            "Nav | Menu\nthe ship sailed out across the open sea at dawn"
        )


class TestSurgicalSpanDecon:
    def test_leaked_span_cut_rest_kept(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        bench = spark.createDataFrame(
            [(1, "what is the capital of france and why does it matter")],
            "q long, text string",
        )
        docs = spark.createDataFrame(
            [
                (1, "intro words here what is the capital of france and why "
                    "does it matter closing thoughts remain intact"),
                (2, "completely unrelated prose about rivers and mountains "
                    "flowing gently to the sea"),
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in dedup.remove_contaminated_spans(
            docs, bench, "doc_id", n=8
        ).collect()}
        # the leaked 11-token span dies; surrounding prose survives
        assert "capital" not in got[1].cleaned_text
        assert got[1].cleaned_text.startswith("intro words here")
        assert got[1].cleaned_text.endswith("closing thoughts remain intact")
        # untouched doc passes through whole
        assert got[2].cleaned_text == docs.collect()[1].text
        assert got[2].n_tokens_kept == 12

    def test_every_occurrence_cut_not_keep_first(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        bench = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta")],
            "q long, text string",
        )
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in (1, 2)],
            "doc_id long, text string",
        )
        got = dedup.remove_contaminated_spans(docs, bench, "doc_id", n=8).collect()
        # both copies die — benchmark text survives NOWHERE
        assert all(r.cleaned_text == "" and r.n_tokens_kept == 0 for r in got)


class TestCCWordBoundaries:
    def test_substrings_do_not_trigger_cc_patterns(self, spark):
        # 'acc0unt' must not read as CC0; 'bcc by noon' not as CC-BY
        assert _tag_one(spark, "the acc0unt ledger")[0] is None
        assert _tag_one(spark, "sent via bcc by noon")[0] is None
        assert _tag_one(spark, "licensed cc0 dedication")[0] == "CC0-1.0"
        assert _tag_one(spark, "shared cc by 4.0")[0] == "CC-BY-4.0"


class TestPreferSurvivor:
    def test_best_quality_survives(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        docs = spark.createDataFrame(
            [(1, 10.0), (2, 99.0), (3, 99.0), (4, 5.0)],
            "doc_id long, quality double",
        )
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1)], "node long, cluster long"
        )
        got = {r.doc_id for r in dedup.dedup_by_clusters_prefer(
            docs, "doc_id", clusters, "quality"
        ).collect()}
        # 2 wins the cluster (highest quality, tie vs 3 -> smaller id);
        # 4 is unclustered and passes through
        assert got == {2, 4}
        low = {r.doc_id for r in dedup.dedup_by_clusters_prefer(
            docs, "doc_id", clusters, "quality", keep_highest=False
        ).collect()}
        assert low == {1, 4}


class TestCrossSourceDupMatrix:
    def test_matrix_counts_and_rate(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import dedup

        docs = spark.createDataFrame(
            [(1, "s1"), (2, "s1"), (3, "s2"), (4, "s2"), (5, "s3")],
            "doc_id long, source string",
        )
        pairs = spark.createDataFrame(
            [(1, 3), (2, 4), (1, 2)], "id_a long, id_b long"
        )
        got = {(r.source_a, r.source_b): r
               for r in dedup.cross_source_dup_matrix(docs, pairs).collect()}
        assert got[("s1", "s2")].n_pairs == 2
        assert got[("s1", "s2")].dup_rate == 1.0   # 2 pairs / min(2,2)
        assert got[("s1", "s1")].n_pairs == 1      # internal boilerplate
        assert ("s3", "s3") not in got


class TestCorpusCard:
    def test_card_numbers(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import pipeline

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma", "s1"),
                (2, "Alpha  beta GAMMA", "s1"),   # exact dup after norm
                (3, "mail me a@b.com now", "s2"),
                (4, "", "s2"),
                (5, None, "s2"),
            ],
            "doc_id long, text string, source string",
        )
        r = pipeline.corpus_card(docs).collect()[0]
        assert r.n_docs == 5 and r.n_sources == 2
        assert r.total_tokens == 3 + 3 + 4
        assert r.exact_dup_rate == round(2 / 5, 6)  # dup pair + ''/None collapse
        assert r.pii_doc_rate == 0.2
        assert r.empty_rate == 0.4
