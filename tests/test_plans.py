"""Physical-plan audits: the properties that make queries survive 100 TB.

These tests fail if a change silently de-optimizes a plan: a filter that
stops reaching the scan, a dimension join that stops broadcasting, a scan
that starts reading all columns, a Python-eval node sneaking into a
reference-parity hot path.
"""

from __future__ import annotations

import pytest

from ecu_sbl_aace_datalake_spark.plans.driver_queries import QUERIES
from ecu_sbl_aace_datalake_spark.plans.inspect import PlanAudit


@pytest.fixture(scope="module")
def audits(spark, sf_dir):
    def audit(name: str) -> PlanAudit:
        return PlanAudit.of(QUERIES[name](spark, sf_dir))

    return audit


class TestFlagship:
    def test_filter_pushed_to_scan(self, audits):
        a = audits("flagship_pricing_summary")
        assert a.has_pushed_filter("l_shipdate")

    def test_column_pruning(self, audits):
        a = audits("flagship_pricing_summary")
        needed = {
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        }
        assert a.read_schema_only(needed), a.scan_columns()

    def test_partial_aggregation(self, audits):
        assert audits("flagship_pricing_summary").has_partial_aggregation

    def test_no_python_in_hot_path(self, audits):
        assert audits("flagship_pricing_summary").python_udf_nodes == 0

    def test_wholestage_codegen(self, spark, sf_dir):
        df = QUERIES["flagship_pricing_summary"](spark, sf_dir)
        assert PlanAudit.codegen_subtrees(df) >= 1


class TestJoins:
    def test_simple_map_broadcasts_dimension(self, audits):
        a = audits("simple_map")
        assert a.broadcast_joins >= 1
        assert a.sort_merge_joins == 0  # fact side must NOT shuffle for the dim map
        assert a.cartesian_products == 0

    def test_null_safe_join_is_hash_join(self, audits):
        a = audits("null_safe_join")
        # eqNullSafe must remain an equi-join (hash-joinable), not a
        # nested-loop disaster
        assert a.cartesian_products == 0
        assert a.broadcast_joins + a.sort_merge_joins >= 1

    def test_multi_join_no_cartesian(self, audits):
        assert audits("sql_over_views").cartesian_products == 0

    def test_scan_filter_project_prunes(self, audits):
        a = audits("scan_filter_project")
        assert a.has_pushed_filter("o_totalprice")
        assert a.read_schema_only({"o_orderkey", "o_custkey", "o_totalprice"})


class TestExtensions:
    def test_exact_dedup_single_shuffle(self, audits):
        a = audits("exact_dedup")
        assert a.exchanges <= 2  # key shuffle (+ AQE artifacts at most)

    def test_embedding_topk_broadcasts_queries(self, audits):
        a = audits("embedding_topk")
        # the corpus must stream map-side against broadcast queries: no
        # sort-merge join, no corpus shuffle before scoring
        assert a.cartesian_products + a.broadcast_joins >= 1
        assert a.sort_merge_joins == 0

    def test_tfidf_retrieval_broadcasts_query_postings(self, audits):
        a = audits("tfidf_retrieval")
        # query postings + query norms are tiny — both must broadcast; the
        # whole pipeline stays JVM-side (pure built-in expressions)
        assert a.broadcast_joins >= 2
        assert a.python_udf_nodes == 0

    def test_incremental_neardup_is_equi_join_only(self, audits):
        a = audits("incremental_neardup")
        # band join new×corpus must stay an equi-join — any cartesian here
        # would be the O(|new|·|corpus|) disaster LSH exists to avoid
        assert a.cartesian_products == 0
        assert a.python_udf_nodes == 0

    def test_cleaning_udf_is_arrow_not_pickle(self, spark, sf_dir):
        df = QUERIES["fixup_names"](spark, sf_dir)
        plan = PlanAudit.of(df)
        assert "ArrowEvalPython" in plan.plan  # vectorized, not BatchEvalPython
        assert "BatchEvalPython" not in plan.plan


class TestBucketing:
    def test_bucketed_join_no_shuffle(self, spark, sf_dir):
        """Two tables bucketed on the join key with equal bucket counts:
        the join must have ZERO exchanges — the 100 TB co-location story."""
        from ecu_sbl_aace_datalake_spark.sources.io import load_table, write_bucketed_table

        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer")
        write_bucketed_table(spark, "b_orders", orders, "o_custkey", 8, sort_cols="o_custkey")
        write_bucketed_table(
            spark, "b_customer",
            cust.withColumnRenamed("c_custkey", "o_custkey"),
            "o_custkey", 8, sort_cols="o_custkey",
        )
        try:
            joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
            a = PlanAudit.of(joined)
            assert a.exchanges == 0, a.plan
            assert joined.count() == orders.count()
        finally:
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_customer")

    def test_bucketed_agg_no_shuffle(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table, write_bucketed_table
        import pyspark.sql.functions as F

        orders = load_table(spark, sf_dir, "orders")
        write_bucketed_table(spark, "b_orders2", orders, "o_custkey", 8)
        try:
            agg = spark.table("b_orders2").groupBy("o_custkey").agg(F.count("*").alias("n"))
            a = PlanAudit.of(agg)
            assert a.exchanges == 0, a.plan
        finally:
            spark.sql("DROP TABLE IF EXISTS b_orders2")


class TestDynamicPartitionPruning:
    def test_selective_dim_filter_prunes_fact_partitions(self, spark, sf_dir):
        """Catalyst's dynamic partition pruning: a fact table partitioned on
        the join key, joined to a dim with a selective filter, must show a
        dynamicpruning subquery in the fact scan — at 100 TB this is the
        difference between scanning one partition and scanning the table."""
        import tempfile

        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        orders = load_table(spark, sf_dir, "orders")
        fact_path = tempfile.mkdtemp() + "/orders_part"
        orders.write.partitionBy("o_orderpriority").parquet(fact_path)
        fact = spark.read.parquet(fact_path)
        dim = (
            orders.select("o_orderpriority").distinct()
            .withColumnRenamed("o_orderpriority", "prio")
            .where("prio LIKE '1-%'")
        )
        joined = fact.join(dim, fact.o_orderpriority == dim.prio).groupBy(
            "prio"
        ).count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        assert joined.count() == 1


class TestTpchJoinTopologies:
    """The round-1 additions (Q7/Q8/Q10 shapes): dims broadcast, predicates
    at the scans, no accidental cartesian explosion."""

    def test_volume_shipping_broadcasts_nations(self, audits):
        a = audits("volume_shipping")
        assert a.broadcast_joins >= 2  # both nation sides
        assert a.cartesian_products == 0

    def test_market_share_part_filter_pushed(self, audits):
        a = audits("market_share")
        assert a.has_pushed_filter("p_type")
        assert a.cartesian_products == 0

    def test_returned_items_filters_pushed(self, audits):
        a = audits("returned_items")
        assert a.has_pushed_filter("l_returnflag")
        assert a.has_pushed_filter("o_orderdate")
        assert a.broadcast_joins >= 1  # nation
        assert a.cartesian_products == 0

    def test_forecast_revenue_all_predicates_pushed(self, audits):
        a = audits("forecast_revenue")
        for c in ("l_shipdate", "l_discount", "l_quantity"):
            assert a.has_pushed_filter(c), c
        assert a.read_schema_only(
            {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}
        ), a.scan_columns()

    def test_tf_idf_no_python_nodes(self, audits):
        a = audits("tf_idf")
        assert a.python_udf_nodes == 0

    def test_stratified_sample_is_narrow(self, audits):
        a = audits("stratified_sample")
        # pure filter: no exchange at all
        assert "Exchange" not in a.plan
        assert a.python_udf_nodes == 0


class TestGlobalPlanInvariants:
    """Sweep EVERY registered query: no accidental cartesian product and no
    Python-eval node may appear outside the explicit whitelists. Catches a
    de-optimization in any query the targeted tests don't cover."""

    # deliberate broadcast-nested-loop / scalar cross joins (documented in
    # PLANS.md reading guide) and bounded pairwise ops
    CARTESIAN_OK = {
        "tf_idf",              # 1-row corpus-size scalar broadcast
        "top_terms_per_doc",   # same scalar broadcast inside tf_idf()
        "tfidf_retrieval",     # same scalar broadcast inside tf_idf()
        "bm25_retrieval",      # 1-row (n_docs, avgdl) scalar broadcast
        "hybrid_retrieval",    # fuses the two queries above
        "bm25_text_search",    # same scalar broadcast as bm25_retrieval
        "bm25f_retrieval",     # per-field avgdl + n_docs scalar broadcasts
        "psi_drift",           # 1-row (min, max) bin-edge scalar broadcast
        "bigram_lm_scores",    # 1-row vocabulary-size scalar broadcast
        "trigram_lm_scores",   # 1-row (V, N) scalar broadcast
        "levenshtein_pairs",   # bounded slice pairwise
        "embedding_topk",      # tiny query set broadcast vs corpus scan
        "embedding_rp_topk",   # same shape over JL-projected vectors
        "embedding_topk_quantized",  # same deliberate shape: broadcast query set, int8 scan
        "embedding_topk_pq_fixed",   # broadcast query set vs m-byte PQ code scan
        "text_embedding_topk",
        "multimodal_retrieval",
        "histogram_quantiles",  # literal q-list × 1-row total, <= bins-row non-equi probe
        "grouped_quantiles",    # broadcast literal q-list over per-key cum rows
        "state_quantiles",      # same broadcast q-list, fed from histogram state
        "cms_join_size",        # 1-row est × 1-row true_size scalar cross join
        "mutual_topk",          # two bounded query-slice broadcasts (cosine_topk x2)
        "target_encoding",      # 1-row global-mean scalar broadcast
        "bitmap_rolling_distinct",  # day-spine non-equi probe: |days| x state rows, both bounded
        "hierarchical_shares",  # 1-row grand-total parent broadcast at level 1
        "bitmap_intersections",  # k x k per-key-count pair build (k = event types)
        "quantile_normalize",   # 1-row global-size scalar broadcast (lazy n_glob)
        "neardup_eval",         # three 1-row count aggregates cross-joined into the report row
        "bootstrap_ci",         # 1-row stats x 1-row CI-bounds scalar cross join
        "gate_agreement_kappa", # 1-row total x 1-row chance-agreement scalar cross join
        "bootstrap_ab_diff",    # same shape: 1-row stats x 1-row CI bounds
        "vocabulary_drift",     # groups x corpus-vocab frame: both sides vocabulary-bounded, t_tot broadcast
        "mahalanobis_outliers",  # 1-row (means + closed-form inverse) stats broadcast
        "domain_stats",         # 1-row corpus-total scalar broadcast for the share
        "ccnet_buckets",        # 1-row scored-doc count broadcast (bucket math) + the LM's V scalar
        "quality_mixture",      # composes ccnet_buckets (same bounded scalars)
        "embedding_topk_binary",  # tiny packed-query-set broadcast vs bit-word scan (BQ candidate stage)
        "hard_negatives",       # tiny anchor-set broadcast vs banded corpus scan
        "margin_pairs",         # broadcast smaller side of the mined pair-scan (exact at fixture scale; ANN pools at 100 TB)
        "rfm_segments",         # 1-row max-date ref scalar broadcast
        "kmv_intersection",     # 1-row sketch-estimate x 1-row exact-count scalar cross join
        "retrieval_eval",       # tiny query-vector broadcast vs corpus scan (cosine_topk inside)
        "neyman_allocation",    # 1-row totals + 1-row remainder scalar broadcasts
        "drift_report",         # per-column 1-row (min,max) bin-edge scalars (psi_drift x3)
        "conformal_intervals",  # 1-row (n,k) + 1-row q-hat scalar broadcasts
        "bh_fdr",               # 1-row max-passing-rank scalar broadcast
        "cuped_adjustment",     # 1-row pooled-theta scalar broadcast
        "gate_threshold_sweep",  # 1-row (total, positives) scalar broadcast
        "dim_truncation_recall",  # pinned query-set broadcasts (cosine_topk per dim) + 1-row hit-count scalars
        "kruskal_wallis",       # two 1-row scalar broadcasts (global n/ties + rank-sum term)
        "quality_cut_f1",       # composes gate_threshold_sweep's 1-row (total, positives) scalar broadcast
        "dunns_posthoc",        # k-row per-group self-join on g_a < g_b (group-cardinality-bounded) + 1-row glob/kmax scalar broadcasts
        "curriculum_schedule",  # 1-row corpus-count scalar broadcast (phase thresholds)
        "waterfill_tokens",     # 1-row (k, supply) + 1-row water-level scalar broadcasts
    }
    # deliberately-Python operators (Arrow-vectorized, asserted elsewhere)
    PYTHON_OK = {
        "fixup_names",         # Arrow pandas_udf cleaning
        "text_embedding_topk", # mapInPandas numpy featurizer
        "multimodal_meta",     # fake-decoder binary metadata (mapInPandas)
        "multimodal_retrieval",
        "image_header_meta",   # real header parsing — binary work is Python by design
        "pixel_stats",         # real numpy pixel decode (mapInPandas)
        "audio_stats",         # real numpy PCM decode (mapInPandas)
        "video_container_meta",  # real MP4 box walk (mapInPandas)
        "video_frame_stats",   # real MJPEG-AVI frame decode (mapInPandas)
        "video_mov_frame_stats",  # real MJPEG-in-MOV sample-table decode
        "image_resize_stats",  # real pixel resize (mapInPandas)
        "audio_features",      # real rfft signal analysis (mapInPandas)
        "semantic_dedup",      # BLAS Gram matmul per cluster (applyInPandas)
        "bpe_token_counts",    # vocabulary-bounded BPE encode (pandas_udf)
        "embedding_topk_pq_fixed",  # PQ encode is BLAS-vectorized numpy (declared)
        "bpe_packing",         # same encode feeding chunk_pack
        "bpe_fertility",       # same vocabulary-bounded encode, per-source agg
        "tokenizer_fertility", # same encode, per-LANGUAGE agg + bytes/token
        "bpe_encode_sample",   # same vocabulary-bounded encode, full tokens
        "bpe_encode_ids",      # same encode + literal-map id lookup (JVM map, Python encode)
        "unicode_normalize",   # unicodedata NFC — no Spark builtin exists (declared)
        "jaro_winkler_matches",  # JW per-char matching windows (Arrow pandas_udf over blocked candidates)
        "sessionize_capped",   # max-duration cut is sequential per key (Arrow applyInPandas, bounded per-user history)
        "image_dhash",         # real PPM pixel decode (mapInPandas, declared)
        "image_neardup",       # same decode feeding the banded Hamming join
        "audio_fingerprint",   # real WAV sample decode (mapInPandas, declared)
        "audio_neardup",       # same decode feeding the banded Hamming join
        "video_keyframe_plan",  # real stss sample-table box walk (mapInPandas)
    }

    def test_no_unexpected_cartesian_or_python(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.plans.driver_queries import QUERIES

        bad_cart, bad_py = [], []
        for name, fn in QUERIES.items():
            a = PlanAudit.of(fn(spark, sf_dir))
            if a.cartesian_products and name not in self.CARTESIAN_OK:
                bad_cart.append(name)
            if a.python_udf_nodes and name not in self.PYTHON_OK:
                bad_py.append(name)
        assert not bad_cart, f"unexpected cartesian products: {bad_cart}"
        assert not bad_py, f"unexpected Python-eval nodes: {bad_py}"


class TestSubqueryTopologies:
    """Q2/Q9/Q11/Q16/Q20 shapes: Catalyst must decorrelate every subquery
    into joins/aggregates — no nested-loop re-execution per outer row — and
    the dims must broadcast with predicates at the scans."""

    def test_min_cost_supplier_decorrelated(self, audits):
        a = audits("min_cost_supplier")
        # correlated MIN subquery → aggregate + join, dims broadcast
        assert a.cartesian_products == 0
        assert a.broadcast_joins >= 2
        assert a.has_pushed_filter("p_type")
        assert a.has_pushed_filter("r_name")

    def test_product_profit_part_filter_before_join(self, audits):
        a = audits("product_profit")
        assert a.has_pushed_filter("p_name")  # LIKE '%red%' → StringContains
        assert a.cartesian_products == 0
        assert a.python_udf_nodes == 0

    def test_important_part_value_scalar_subquery(self, audits):
        a = audits("important_part_value")
        # threshold is a scalar subquery, not a per-row re-aggregation
        assert a.cartesian_products == 0
        assert a.broadcast_joins >= 1  # 100-row supplier dim
        assert a.has_pushed_filter("n_name")

    def test_supplier_part_counts_anti_join(self, audits):
        a = audits("supplier_part_counts")
        # NOT IN → null-aware anti join against the tiny supplier subquery
        assert a.cartesian_products == 0
        for c in ("p_brand", "p_type", "p_size"):
            assert a.has_pushed_filter(c), c

    def test_promotion_suppliers_having_decorrelated(self, audits):
        a = audits("promotion_suppliers")
        # correlated SUM inside HAVING → per-part aggregate joined back
        assert a.cartesian_products == 0
        assert a.has_pushed_filter("l_shipdate")
        assert a.python_udf_nodes == 0
