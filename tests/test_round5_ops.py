"""Round-5 operator tests: Bloom prefilter, line boilerplate removal,
char-distribution signals, suffix stemming, JL random projection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ecu_sbl_aace_datalake_spark.operators import dedup, similarity, textstats


class TestBloom:
    def test_no_false_negatives_and_low_fp(self, spark):
        keys = spark.range(0, 2000).select(F.col("id").alias("k"))
        bloom = dedup.bloom_build(keys, "k", m_bits=1 << 16, k=5)
        # members: every one must survive
        surv = dedup.bloom_prefilter(keys, bloom, "k", m_bits=1 << 16, k=5)
        assert surv.count() == 2000
        # non-members: almost all must be pruned (fp ~ (1-e^{-kn/m})^k ~ 1e-3)
        probes = spark.range(1_000_000, 1_004_000).select(F.col("id").alias("k"))
        fp = dedup.bloom_prefilter(probes, bloom, "k", m_bits=1 << 16, k=5).count()
        assert fp < 40  # 1% of 4000, an order of magnitude over expectation

    def test_multiplicity_preserved(self, spark):
        keys = spark.range(0, 10).select(F.col("id").alias("k"))
        bloom = dedup.bloom_build(keys, "k", m_bits=1 << 12, k=3)
        dup = keys.union(keys)
        out = dedup.bloom_prefilter(dup, bloom, "k", m_bits=1 << 12, k=3)
        assert out.count() == 20

    def test_bloom_flags_equal_exact(self, spark, sf_dir):
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .limit(200)
        )
        bench = docs.where(F.col("doc_id") < 20)
        corpus = docs.where(F.col("doc_id") >= 20)
        exact = dedup.contamination_flags(corpus, bench, "doc_id", n=8)
        bloomed = dedup.bloom_contamination_flags(
            corpus, bench, "doc_id", n=8, m_bits=1 << 16, k=5
        )
        assert exact.exceptAll(bloomed).count() == 0
        assert bloomed.exceptAll(exact).count() == 0

    def test_mergeable(self, spark):
        a = spark.range(0, 100).select(F.col("id").alias("k"))
        b = spark.range(100, 200).select(F.col("id").alias("k"))
        merged = (
            dedup.bloom_build(a, "k", m_bits=1 << 12, k=3)
            .union(dedup.bloom_build(b, "k", m_bits=1 << 12, k=3))
            .groupBy("bucket")
            .agg(F.bit_or("word").alias("word"))
        )
        whole = dedup.bloom_build(a.union(b), "k", m_bits=1 << 12, k=3)
        assert merged.exceptAll(whole).count() == 0
        assert whole.exceptAll(merged).count() == 0

    def test_m_bits_validation(self, spark):
        keys = spark.range(3).select(F.col("id").alias("k"))
        with pytest.raises(ValueError):
            dedup.bloom_build(keys, "k", m_bits=100)


class TestBoilerplate:
    def test_common_lines_removed_everywhere(self, spark):
        rows = [
            (1, "unique one\ncommon banner\nbody a"),
            (2, "common banner\nbody b"),
            (3, "body c\ncommon banner"),
            (4, "only unique text"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = textstats.remove_boilerplate_lines(df, "doc_id", min_docs=3)
        got = {r["doc_id"]: r for r in out.collect()}
        assert got[1]["text"] == "unique one\nbody a"
        assert got[1]["n_removed"] == 1 and got[1]["n_lines"] == 3
        assert got[2]["text"] == "body b"
        assert got[3]["text"] == "body c"
        assert got[4]["text"] == "only unique text"
        assert got[4]["n_removed"] == 0

    def test_normalized_matching_and_order(self, spark):
        rows = [
            (1, "first\n  Common   Banner \nlast"),
            (2, "common banner\nx"),
            (3, "COMMON BANNER\ny"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = textstats.remove_boilerplate_lines(df, "doc_id", min_docs=3)
        got = {r["doc_id"]: r for r in out.collect()}
        # whitespace/case-normalized forms all count as the same line
        assert got[1]["text"] == "first\nlast"
        assert got[2]["text"] == "x" and got[3]["text"] == "y"

    def test_fully_boilerplate_doc_empty(self, spark):
        rows = [(i, "the banner") for i in range(1, 5)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = textstats.remove_boilerplate_lines(df, "doc_id", min_docs=3)
        assert all(r["text"] == "" for r in out.collect())


class TestCharSignals:
    def test_entropy_known_values(self, spark):
        df = spark.createDataFrame(
            [(1, "aaaa"), (2, "abab"), (3, "abcd")], ["doc_id", "text"]
        )
        got = {r["doc_id"]: r for r in textstats.char_entropy(df, "doc_id").collect()}
        assert got[1]["entropy"] == 0.0
        assert abs(got[2]["entropy"] - 1.0) < 1e-9
        assert abs(got[3]["entropy"] - 2.0) < 1e-9
        assert got[3]["n_chars"] == 4

    def test_script_mix_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "ab12 дж 日 α!"), (2, "")], ["doc_id", "text"]
        )
        got = {r["doc_id"]: r for r in textstats.script_mix(df, "doc_id").collect()}
        r = got[1]
        # 10 non-space chars: a b 1 2 д ж 日 α ! -> 9? count: a,b,1,2,д,ж,日,α,! = 9
        assert r["n_chars"] == 9
        assert abs(r["frac_latin"] - round(2 / 9, 6)) < 1e-9
        assert abs(r["frac_digit"] - round(2 / 9, 6)) < 1e-9
        assert abs(r["frac_cyrillic"] - round(2 / 9, 6)) < 1e-9
        assert abs(r["frac_cjk"] - round(1 / 9, 6)) < 1e-9
        assert abs(r["frac_greek"] - round(1 / 9, 6)) < 1e-9
        assert abs(r["frac_other"] - round(1 / 9, 6)) < 1e-9
        assert got[2]["n_chars"] == 0 and got[2]["frac_other"] == 0.0


class TestStem:
    CASES = [
        ("classes", "class"),      # -sses -> -ss
        ("queries", "queri"),      # -ies -> -i
        ("tables", "table"),       # plain plural
        ("miss", "miss"),          # -ss kept
        ("bus", "bus"),            # -us kept
        ("sorting", "sort"),       # -ing, len > 5
        ("king", "king"),          # -ing, too short
        ("sorted", "sort"),        # -ed, len > 4
        ("red", "red"),            # -ed, too short
        ("window", "window"),      # no rule
    ]

    def test_golden_rules(self, spark):
        df = spark.createDataFrame([(w,) for w, _ in self.CASES], ["w"])
        out = df.select("w", textstats.stem(F.col("w")).alias("s")).collect()
        got = {r["w"]: r["s"] for r in out}
        for w, expect in self.CASES:
            assert got[w] == expect, (w, got[w], expect)

    def test_counts_fold_families(self, spark):
        df = spark.createDataFrame(
            [("sort sorted sorting sorts",), ("query queries",)], ["text"]
        )
        got = {
            r["stem_tok"]: r["n"]
            for r in textstats.stemmed_token_counts(df).collect()
        }
        assert got["sort"] == 4
        # 'query' stays, 'queries' -> 'queri' (single-pass rules, no y-restore)
        assert got["query"] == 1 and got["queri"] == 1


class TestRandomProjection:
    def test_matrix_deterministic_and_signed(self):
        m1 = similarity.projection_matrix(8, 4, seed=7)
        m2 = similarity.projection_matrix(8, 4, seed=7)
        assert m1 == m2
        assert len(m1) == 4 and len(m1[0]) == 8
        scale = 1.0 / math.sqrt(4)
        assert all(abs(x) == scale for row in m1 for x in row)
        assert m1 != similarity.projection_matrix(8, 4, seed=8)

    def test_projection_matches_numpy(self, spark):
        import numpy as np

        vec = [float(i) for i in range(8)]
        mat = similarity.projection_matrix(8, 4, seed=3)
        df = spark.createDataFrame([(1, vec)], ["vec_id", "embedding"])
        out = similarity.project_embeddings(df, mat).collect()[0]["proj"]
        expect = np.array(mat) @ np.array(vec)
        assert np.allclose(out, expect)

    def test_rp_topk_recall_on_clustered(self, spark):
        """JL's contract is distance preservation where distances carry
        signal: on a deterministic 8-cluster Gaussian corpus (same design
        case as the IVF recall gate) 64→16 projection must keep recall@10
        high. The unstructured fixture corpus (top-10 margins at noise
        level) is covered by the beats-random test below."""
        import numpy as np

        rng = np.random.RandomState(7)
        centers = rng.randn(8, 64) * 5.0
        vecs = [
            (i, (centers[i % 8] + rng.randn(64)).tolist()) for i in range(500)
        ]
        emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        queries = emb.where(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        rp = similarity.rp_topk(emb, queries, k=10, out_dim=16, seed=7)
        rows = rp.collect()
        # JL at 16 dims keeps COARSE structure: what it must preserve is
        # that neighbors come from the query's own cluster (within-cluster
        # fine ranks sit below the ~1/sqrt(out_dim) inner-product noise,
        # so exact-top-10 recall is the wrong invariant here)
        same_cluster = sum(
            1 for r in rows if r["vec_id"] % 8 == r["query_id"] % 8
        )
        assert same_cluster / len(rows) >= 0.9, same_cluster / len(rows)

    def test_rp_topk_beats_random_on_fixture(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = similarity.cosine_topk(emb, queries, k=10)
        rp = similarity.rp_topk(emb, queries, k=10, out_dim=16, seed=7)
        e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
        p = {(r["query_id"], r["vec_id"]) for r in rp.collect()}
        recall = len(e & p) / len(e)
        n_corpus = emb.count()
        assert recall > 2.5 * (10 / n_corpus), (recall, n_corpus)


class TestBloomPlan:
    def test_prefilter_is_map_side(self, spark):
        """The probe side must never shuffle: k broadcast-hash joins, zero
        sort-merge joins anywhere in the prefilter plan."""
        keys = spark.range(0, 100).select(F.col("id").alias("k"))
        bloom = dedup.bloom_build(keys, "k", m_bits=1 << 12, k=4)
        out = dedup.bloom_prefilter(
            spark.range(0, 1000).select(F.col("id").alias("k")),
            bloom,
            "k",
            m_bits=1 << 12,
            k=4,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") == 4, plan
        assert "SortMergeJoin" not in plan, plan


class TestKCore:
    def test_peels_pendants(self, spark):
        # triangle a-b-c (2-core) + pendant chain c-d, d-e
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
            ["src", "dst"],
        )
        from ecu_sbl_aace_datalake_spark.operators import graph

        core = graph.k_core(edges, k=2, rounds=4).collect()
        got = {r["node"]: r["degree"] for r in core}
        assert got == {"a": 2, "b": 2, "c": 2}

    def test_fixed_point_stable(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], ["src", "dst"]
        )
        from ecu_sbl_aace_datalake_spark.operators import graph

        r3 = sorted(map(tuple, graph.k_core(edges, k=2, rounds=3).collect()))
        r6 = sorted(map(tuple, graph.k_core(edges, k=2, rounds=6).collect()))
        assert r3 == r6

    def test_k_validation(self, spark):
        edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
        from ecu_sbl_aace_datalake_spark.operators import graph

        with pytest.raises(ValueError):
            graph.k_core(edges, k=0)


class TestFingerprint:
    def test_order_independent(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["id", "v"])
        b = spark.createDataFrame([(3, "z"), (1, "x"), (2, "y")], ["id", "v"])
        fa = transform.table_fingerprint(a).collect()[0]
        fb = transform.table_fingerprint(b).collect()[0]
        assert fa["checksum"] == fb["checksum"] and fa["n_rows"] == 3

    def test_sensitive_to_any_change(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        a = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
        b = spark.createDataFrame([(1, "x"), (2, "Y")], ["id", "v"])
        assert (
            transform.table_fingerprint(a).collect()[0]["checksum"]
            != transform.table_fingerprint(b).collect()[0]["checksum"]
        )

    def test_null_vs_empty_distinct(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        a = spark.createDataFrame([(1, None)], "id int, v string")
        b = spark.createDataFrame([(1, "")], "id int, v string")
        assert (
            transform.table_fingerprint(a).collect()[0]["checksum"]
            != transform.table_fingerprint(b).collect()[0]["checksum"]
        )

    def test_shards_add(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        a = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
        b = spark.createDataFrame([(3, "z")], ["id", "v"])
        fa = transform.table_fingerprint(a).collect()[0]
        fb = transform.table_fingerprint(b).collect()[0]
        fu = transform.table_fingerprint(a.union(b)).collect()[0]
        assert fu["checksum"] == fa["checksum"] + fb["checksum"]
        assert fu["n_rows"] == fa["n_rows"] + fb["n_rows"]

    def test_grouped_matches_filtered(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        df = spark.createDataFrame(
            [("g1", 1, "x"), ("g1", 2, "y"), ("g2", 3, "z")], ["g", "id", "v"]
        )
        grouped = {
            r["g"]: r
            for r in transform.grouped_fingerprint(df, "g").collect()
        }
        for g in ("g1", "g2"):
            direct = transform.table_fingerprint(
                df.where(F.col("g") == g).drop("g")
            ).collect()[0]
            assert grouped[g]["checksum"] == direct["checksum"]
            assert grouped[g]["n_rows"] == direct["n_rows"]


class TestEventPaths:
    def test_trigram_counts(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import timeseries

        rows = [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"),
            (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        got = {
            r["path"]: r["n_paths"]
            for r in timeseries.event_path_ngrams(
                df, "user_id", "ts", "event_type", n=3, top=None
            ).collect()
        }
        assert got == {"a > b > c": 2, "b > c > b": 1}

    def test_bigrams_and_short_keys_skipped(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import timeseries

        rows = [(1, 1, "a"), (1, 2, "b"), (2, 1, "x")]  # user 2: 1 event only
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        got = {
            r["path"]: r["n_paths"]
            for r in timeseries.event_path_ngrams(
                df, "user_id", "ts", "event_type", n=2, top=None
            ).collect()
        }
        assert got == {"a > b": 1}


class TestMutualTopk:
    def test_mutual_pairs_only(self, spark):
        # a1<->b1 mutual besties; b_hub is a2's best but prefers a1 (not mutual)
        rows_a = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.2])]
        rows_b = [(10, [0.9, 0.1, 0.0]), (11, [0.1, 0.0, 1.0])]
        a = spark.createDataFrame(rows_a, "vec_id long, embedding array<double>")
        b = spark.createDataFrame(rows_b, "vec_id long, embedding array<double>")
        out = similarity.mutual_topk(a, b, k=1).collect()
        pairs = {(r["a_id"], r["b_id"]) for r in out}
        assert (1, 10) in pairs
        # with k=1: a2's best is b10 (cos(a2,b10)=0.1.. check) — mutuality
        # requires b10's best to be a2, but b10 prefers a1, so no (2, 10)
        assert (2, 10) not in pairs


class TestStripMarkup:
    def test_golden(self, spark):
        cases = [
            ("<p>Hello <b>world</b></p>", "Hello world"),
            ("a<script>var x = '<b>';</script>b", "a b"),
            ("x<style>p { color: red }</style>y", "x y"),
            ("<!-- note -->keep", "keep"),
            ("Tom &amp; Jerry &lt;3", "Tom & Jerry <3"),
            ("&amp;lt; stays &amp;lt;", "&lt; stays &lt;"),  # no double-decode
            ("  lots   of\n\nspace  ", "lots of space"),
            ("", ""),
        ]
        df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(cases)], ["i", "text"])
        out = textstats.with_stripped_markup(df).collect()
        got = {r["i"]: r["clean_text"] for r in out}
        for i, (_, expect) in enumerate(cases):
            assert got[i] == expect, (i, got[i], expect)

    def test_markup_frac(self, spark):
        df = spark.createDataFrame([(1, "<b>hi</b>")], ["i", "text"])
        r = textstats.with_stripped_markup(df).collect()[0]
        assert r["clean_text"] == "hi"
        assert r["markup_frac"] == round(1 - 2 / 9, 4)


class TestTargetEncoding:
    def test_out_of_fold_no_leakage(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        rows = [(i, "a" if i < 8 else "b", float(i % 2)) for i in range(12)]
        df = spark.createDataFrame(rows, ["id", "cat", "label"])
        out = transform.target_encode_oof(
            df, "cat", "label", n_folds=3, fold_key="id", prior_weight=2.0
        ).collect()
        # recompute expectation per (cat, fold) from the raw rows
        import collections

        folds = {r["id"]: r["fold"] for r in out}
        stat = collections.defaultdict(lambda: [0.0, 0])
        for i, c, l in rows:
            stat[(c, folds[i])][0] += l
            stat[(c, folds[i])][1] += 1
        cat_tot = collections.defaultdict(lambda: [0.0, 0])
        for (c, f), (s, n) in stat.items():
            cat_tot[c][0] += s
            cat_tot[c][1] += n
        gmean = sum(l for _, _, l in rows) / len(rows)
        for r in out:
            c, f = r["cat"], r["fold"]
            s, n = stat[(c, f)]
            expect = (cat_tot[c][0] - s + 2.0 * gmean) / (cat_tot[c][1] - n + 2.0)
            assert abs(r["te_cat"] - expect) < 1e-12

    def test_md5_and_xxhash_folds_both_work(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import transform

        df = spark.createDataFrame(
            [(i, "c", 1.0) for i in range(10)], ["id", "cat", "label"]
        )
        for algo in ("md5", "xxhash64"):
            out = transform.target_encode_oof(
                df, "cat", "label", n_folds=4, fold_key="id", hash_algo=algo
            )
            assert out.count() == 10
        with pytest.raises(ValueError):
            transform.target_encode_oof(df, "cat", "label", hash_algo="nope")


class TestCooccurrenceSimilarity:
    def test_cosine_values(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import skew

        # items x,y co-occur in 2 of x's 3 / y's 2 baskets
        rows = [
            (1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (4, "z"),
        ]
        df = spark.createDataFrame(rows, ["basket", "item"])
        out = skew.cooccurrence_similarity(
            df, "basket", "item", min_support=2
        ).collect()
        got = {(r["item_a"], r["item_b"]): r for r in out}
        assert got[("x", "y")]["pair_count"] == 2
        import math

        assert abs(got[("x", "y")]["cosine"] - round(2 / math.sqrt(3 * 2), 6)) < 1e-9
        assert ("x", "z") not in got  # z below support

    def test_top_per_item(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import skew

        rows = []
        for b in range(4):
            rows += [(b, "a"), (b, "b")]
        for b in range(4, 6):
            rows += [(b, "a"), (b, "c")]
        df = spark.createDataFrame(rows, ["basket", "item"])
        out = skew.cooccurrence_similarity(
            df, "basket", "item", min_support=2, top_per_item=1
        ).collect()
        a_rows = [r for r in out if r["item_a"] == "a"]
        assert len(a_rows) == 1 and a_rows[0]["item_b"] == "b"  # higher cosine


class TestBitmapDistinct:
    def test_matches_exact_and_cross_bucket(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import aggstate

        # ids straddle the 32768 bitmap bucket boundary
        rows = [("g1", i) for i in [1, 2, 32767, 32768, 70000, 70000]] + [
            ("g2", 5)
        ]
        df = spark.createDataFrame(rows, ["g", "uid"])
        state = aggstate.bitmap_distinct_state(df, ["g"], "uid")
        got = {
            r["g"]: r["n_distinct"]
            for r in aggstate.bitmap_distinct_counts(state, ["g"]).collect()
        }
        assert got == {"g1": 5, "g2": 1}

    def test_merge_idempotent(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import aggstate

        df = spark.createDataFrame([("g", i) for i in range(100)], ["g", "uid"])
        s1 = aggstate.bitmap_distinct_state(df, ["g"], "uid")
        # replaying the same batch must not change counts (bit-or idempotent)
        merged = aggstate.merge_bitmap_states(s1, s1, ["g"])
        got = aggstate.bitmap_distinct_counts(merged, ["g"]).collect()[0]
        assert got["n_distinct"] == 100

    def test_rolling_matches_exact(self, spark):
        import datetime

        from ecu_sbl_aace_datalake_spark.operators import aggstate

        base = datetime.date(2024, 1, 1)
        rows = []
        for d in range(10):
            for u in range(d % 4 + 1):
                rows.append((base + datetime.timedelta(days=d), u * 1000 + d % 3))
        df = spark.createDataFrame(rows, "day date, user_id long")
        state = aggstate.bitmap_distinct_state(df, ["day"], "user_id")
        got = {
            r["day"]: r["n_distinct"]
            for r in aggstate.rolling_distinct_from_bitmaps(state, "day", 3).collect()
        }
        # exact reference
        exact = {}
        for d in range(10):
            day = base + datetime.timedelta(days=d)
            users = {
                u for (dd, u) in rows
                if dd <= day and dd > day - datetime.timedelta(days=3)
            }
            exact[day] = len(users)
        assert got == exact
