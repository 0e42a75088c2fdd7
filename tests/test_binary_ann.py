"""Unit tests for 1-bit binary-quantization ANN (similarity.binary_quantize /
hamming_bits / binary_topk): packing goldens, exactness at full rerank
factor, recall at the default factor."""

from __future__ import annotations

import pyspark.sql.functions as F

from ecu_sbl_aace_datalake_spark.operators import similarity


class TestBinaryQuantize:
    def test_packing_golden(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0] * 3 + [0.0] * 29 + [-1.0, 2.0]),  # 34 dims, 2 words
             (2, [0.0] * 34)],
            "vec_id long, embedding array<double>",
        )
        got = {r.vec_id: r.bvec for r in similarity.binary_quantize(df).collect()}
        # word 0: first 3 dims positive at the MSB end of a 32-bit word
        assert got[1][0] == 0b111 << 29
        # word 1 (2 leftover dims): [-1 -> 0, 2 -> 1] = 0b01
        assert got[1][1] == 1
        # zero vector packs to all-zero words (zero-sign convention)
        assert got[2] == [0, 0]

    def test_hamming_bits(self, spark):
        df = spark.createDataFrame(
            [(1, [0b1010, 0b1], [0b0110, 0b1], 2),
             (2, [0, 0], [0, 0], 0)],
            "i long, a array<long>, b array<long>, want int",
        )
        rows = df.select(
            similarity.hamming_bits(F.col("a"), F.col("b")).alias("h"), "want"
        ).collect()
        for r in rows:
            assert r.h == r.want


class TestBinaryTopk:
    def test_full_factor_equals_exact(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = {
            (r.query_id, r.vec_id, r.score)
            for r in similarity.cosine_topk(emb, q, k=10).collect()
        }
        full = {
            (r.query_id, r.vec_id, r.score)
            for r in similarity.binary_topk(
                emb, q, k=10, rerank_factor=500
            ).collect()
        }
        assert full == exact

    def test_default_factor_recall(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = {
            (r.query_id, r.vec_id)
            for r in similarity.cosine_topk(emb, q, k=10).collect()
        }
        got = {
            (r.query_id, r.vec_id)
            for r in similarity.binary_topk(emb, q, k=10).collect()
        }
        assert len(got & exact) / len(exact) >= 0.6

    def test_rerank_scores_are_exact_cosines(self, spark):
        # planted: candidate with identical signs but different magnitude
        # must be reranked by the EXACT cosine, not the hamming order
        rows = [
            (0, [1.0, 1.0, 1.0, 1.0]),
            (1, [1.0, 1.0, 1.0, 1.0]),       # cosine 1.0, hamming 0
            (2, [3.0, 0.1, 0.1, 0.1]),       # same signs, lower cosine
            (3, [-1.0, -1.0, -1.0, -1.0]),   # opposite
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = df.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = similarity.binary_topk(df, q, k=2, rerank_factor=2).collect()
        assert [r.vec_id for r in sorted(got, key=lambda r: r.rank)] == [1, 2]
        assert got[0].score == 1.0


class TestIvfAppend:
    def test_append_equals_rebuild_and_stays_pruned(self, spark, sf_dir):
        import glob
        import tempfile

        from ecu_sbl_aace_datalake_spark.sources.catalog import Lakehouse
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        centroids = similarity.kmeans_fit(emb, k=4, max_iter=3)
        first = emb.where(F.col("vec_id") % 2 == 0)
        second = emb.where(F.col("vec_id") % 2 == 1)

        lh = Lakehouse("ivf_app", tempfile.mkdtemp())
        similarity.persist_ivf_index(first, lh, "emb_ivf", centroids)
        similarity.append_ivf_index(second, lh, "emb_ivf", centroids)

        queries = emb.limit(3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        from_index = similarity.ivf_topk_from_index(
            spark, lh, "emb_ivf", queries, centroids, k=5, n_probe=2
        )
        inline = similarity.ivf_topk(emb, queries, centroids, k=5, n_probe=2)
        assert sorted(map(tuple, from_index.collect())) == sorted(
            map(tuple, inline.collect())
        )
        # probes stay partition-pruned after the append
        plan = from_index._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "ivf_cluster" in plan
        # appended files joined the existing cluster dirs (no new layout)
        dirs = glob.glob(f"{lh.tables_path}/emb_ivf/ivf_cluster=*")
        assert len(dirs) == 4
        # every touched cluster dir has at most 2 data files (one per write)
        for d in dirs:
            files = [
                f for f in glob.glob(f"{d}/part-*") if not f.endswith(".crc")
            ]
            assert 1 <= len(files) <= 2, files


class TestEmbeddingDrift:
    def test_planted_flip_and_missing_group(self, spark):
        a = spark.createDataFrame(
            [("g1", [1.0, 0.0]), ("g1", [1.0, 0.2]),
             ("g2", [0.0, 1.0]), ("g3", [1.0, 1.0])],
            "g string, embedding array<double>",
        )
        b = spark.createDataFrame(
            [("g1", [1.0, 0.1]), ("g2", [0.0, -1.0])],
            "g string, embedding array<double>",
        )
        got = {r.g: r for r in similarity.embedding_drift(a, b, "g").collect()}
        assert got["g1"].centroid_cos == 1.0 and got["g1"].spread_a == 0.01
        assert got["g2"].centroid_cos == -1.0
        assert got["g3"].n_b is None and got["g3"].centroid_cos is None
