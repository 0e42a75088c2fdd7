"""CacheScope: scoped persist lifetime for repeated-call operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecu_sbl_aace_datalake_spark.caching import CacheScope, persist_in
from ecu_sbl_aace_datalake_spark.operators import dedup, textstats


class TestCacheScope:
    def test_persist_and_release(self, spark):
        scope = CacheScope()
        df = persist_in(scope, spark.range(100).withColumn("x", F.col("id") * 2))
        df.count()
        assert df.storageLevel.useMemory
        assert len(scope) == 1
        scope.unpersist()
        assert not df.storageLevel.useMemory
        assert len(scope) == 0
        scope.unpersist()  # idempotent

    def test_none_scope_is_plain_persist(self, spark):
        df = persist_in(None, spark.range(10))
        try:
            assert df.storageLevel.useMemory
        finally:
            df.unpersist()

    def test_neardup_probe_releases_signature_caches(self, spark):
        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma delta epsilon zeta token{i}") for i in range(20)],
            "doc_id long, text string",
        )
        new, corpus = docs.where("doc_id < 5"), docs.where("doc_id >= 5")
        scope = CacheScope()
        out = dedup.neardup_pairs_against_corpus(
            new, corpus, "doc_id", threshold=0.5, scope=scope
        )
        out.count()
        assert len(scope) == 2  # new-side + corpus-side signature tables
        before = [
            r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        ]
        assert before, "signature tables should be cached while in scope"
        scope.unpersist(blocking=True)
        after = [r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()]
        assert len(after) < len(before)

    def test_bm25_scope_release(self, spark):
        docs = spark.createDataFrame(
            [(i, f"red green blue word{i} word{i + 1}") for i in range(30)],
            "doc_id long, text string",
        )
        scope = CacheScope()
        res = textstats.bm25_topk_text(docs, ["red green"], k=3, scope=scope)
        res.count()
        assert len(scope) == 1
        scope.unpersist(blocking=True)
        assert len(scope) == 0
