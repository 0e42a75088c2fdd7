"""URL canonicalization / dedup / domain audit (operators/urls.py) —
the CCNet crawl-curation stage."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from ecu_sbl_aace_datalake_spark.operators import urls


class TestCanonicalUrl:
    CASES = [
        # tracking params dropped, survivors sorted, www + default port +
        # trailing slash + fragment stripped, host lowercased
        ("https://WWW.Example.COM:443/path/?utm_source=x&b=2&a=1#frag",
         "https://example.com/path?a=1&b=2"),
        ("http://example.com:80/path", "http://example.com/path"),
        # non-default port kept
        ("http://example.com:8080/path/", "http://example.com:8080/path"),
        # userinfo dropped; internal duplicate slashes and path case kept
        ("https://user:pw@sub.Site.co.uk/a//b/?ref=tw&z=1&y=2",
         "https://sub.site.co.uk/a//b?y=2&z=1"),
        # scheme gate
        ("ftp://example.com/x", None),
        ("not a url", None),
        # bare host; root slash == no path; empty query drops the '?'
        ("https://example.com", "https://example.com"),
        ("https://example.com/?", "https://example.com"),
        # duplicate param keys survive, sorted bytewise
        ("HTTPS://EXAMPLE.com/Path?a=1&a=0",
         "https://example.com/Path?a=0&a=1"),
    ]

    def test_cases(self, spark):
        df = spark.createDataFrame(
            [(i, u) for i, (u, _) in enumerate(self.CASES)],
            "id long, url string",
        )
        got = {r.id: r.c for r in
               df.select("id", urls.canonical_url("url").alias("c")).collect()}
        for i, (u, want) in enumerate(self.CASES):
            assert got[i] == want, (u, got[i], want)

    def test_registrable_domain(self, spark):
        cases = [("sub.a.example.com", "example.com"),
                 ("example.com", "example.com"),
                 ("deep.sub.site.co.uk", "site.co.uk"),
                 ("co.uk", "co.uk"),            # <= 2 labels pass through
                 ("localhost", "localhost")]
        df = spark.createDataFrame(
            [(i, h) for i, (h, _) in enumerate(cases)], "id long, h string"
        )
        got = {r.id: r.d for r in
               df.select("id", urls.registrable_domain("h").alias("d")).collect()}
        for i, (h, want) in enumerate(cases):
            assert got[i] == want, (h, got[i], want)


class TestUrlDedupDomainStats:
    def test_dedup_keeps_min_tiebreak_and_null_rows(self, spark):
        df = spark.createDataFrame(
            [(1, "https://a.com/x/"),
             (2, "https://a.com/x?utm_source=s"),   # same canonical as 1
             (3, "https://a.com/y"),
             (4, "nope")],                           # uncanonicalizable: kept
            "doc_id long, url string",
        )
        got = sorted((r.doc_id, r.canonical_url)
                     for r in urls.url_dedup(df, "url", tiebreak="doc_id").collect())
        assert got == [(1, "https://a.com/x"), (3, "https://a.com/y"),
                       (4, None)]

    def test_dedup_requires_tiebreak(self, spark):
        df = spark.createDataFrame([(1, "https://a.com")], "doc_id long, url string")
        with pytest.raises(ValueError, match="tiebreak"):
            urls.url_dedup(df, "url")

    def test_domain_stats(self, spark):
        df = spark.createDataFrame(
            [(1, "https://a.com/x"), (2, "https://www.a.com/x"),
             (3, "https://b.co.uk/z"), (4, "garbage")],
            "doc_id long, url string",
        )
        got = sorted(tuple(r) for r in urls.domain_stats(df, "url").collect())
        # 2 a.com rows collapse to 1 canonical; garbage row excluded
        assert got == [("a.com", 2, 1, 0.666667), ("b.co.uk", 1, 1, 0.333333)]


class TestCrawlSnapshotDiff:
    def test_statuses(self, spark):
        old = spark.createDataFrame(
            [(1, "https://a.com/x", "same"),
             (2, "https://a.com/y", "old text"),
             (3, "https://a.com/z", "gone"),
             (4, "bad url", "ignored")],
            "doc_id long, url string, text string",
        )
        new = spark.createDataFrame(
            [(11, "https://a.com/x/", "same"),        # slash variant: unchanged
             (12, "https://a.com/y?utm_source=s", "new text"),  # changed
             (13, "https://a.com/w", "fresh")],        # added
            "doc_id long, url string, text string",
        )
        got = {r.canonical_url: r.status
               for r in urls.crawl_snapshot_diff(old, new).collect()}
        assert got == {
            "https://a.com/x": "unchanged",
            "https://a.com/y": "changed",
            "https://a.com/z": "removed",
            "https://a.com/w": "added",
        }


class TestPersistedUrlIndex:
    def test_probe_append_and_bucket_local_plan(self, spark, tmp_path):
        from ecu_sbl_aace_datalake_spark.plans.inspect import PlanAudit

        corpus = spark.createDataFrame(
            [(1, "https://a.com/x"), (2, "https://a.com/y")],
            "doc_id long, url string",
        )
        idx = urls.persist_url_index(corpus, "url", index_table="t_url_idx", n_buckets=8)
        try:
            batch = spark.createDataFrame(
                [(10, "https://WWW.a.com/x/"),   # known (variant) -> dropped
                 (11, "https://a.com/z"),        # new -> kept
                 (12, "bad url")],               # NULL canonical -> kept
                "doc_id long, url string",
            )
            got = urls.urls_against_index(batch, idx, "url")
            assert {r.doc_id for r in got.collect()} == {11, 12}
            # the index side must read bucket-locally: no Exchange feeds
            # the index scan (batch side may shuffle to align buckets)
            plan = PlanAudit.of(
                batch.withColumn("canonical_url", urls.canonical_url("url"))
                .where("canonical_url is not null")
                .join(spark.table("t_url_idx"), "canonical_url", "left_anti")
            ).plan
            import re

            scan_part = plan[plan.index("t_url_idx"):]
            assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan or "bucket" in scan_part.lower()
            # append: new canonical becomes known for the next probe
            urls.append_url_index(
                got.where(F.col("canonical_url").isNotNull()), idx
            )
            again = urls.urls_against_index(
                spark.createDataFrame([(20, "https://a.com/z?utm_source=x")],
                                      "doc_id long, url string"), idx, "url")
            assert again.count() == 0
        finally:
            spark.sql("DROP TABLE IF EXISTS t_url_idx")


class TestDomainQualityGate:
    def _df(self, spark):
        rows = [
            (1, "https://good.com/a", 0.9),
            (2, "https://good.com/b", 0.8),
            (3, "https://farm.net/x", 0.1),
            (4, "https://farm.net/y", 0.2),
            (5, "not a url", 0.05),          # no domain -> not gated
        ]
        return spark.createDataFrame(
            rows, "doc_id long, url string, clf_score double"
        )

    def test_report(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import urls

        got = {
            r.domain: r
            for r in urls.domain_quality_report(self._df(spark)).collect()
        }
        assert set(got) == {"good.com", "farm.net"}
        assert got["good.com"].keep_domain and got["good.com"].avg_score == 0.85
        assert not got["farm.net"].keep_domain

    def test_drop_keeps_unurled_rows(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import urls

        kept = {
            r.doc_id
            for r in urls.drop_low_quality_domains(self._df(spark)).collect()
        }
        assert kept == {1, 2, 5}

    def test_decimal_mean_boundary(self, spark):
        from ecu_sbl_aace_datalake_spark.operators import urls

        # four 6dp scores whose mean lands exactly on a 7th-decimal 5 —
        # the decimal-sum/end-division contract keeps this deterministic
        rows = [(i, "https://b.org/p", s) for i, s in enumerate(
            [0.1, 0.2, 0.3, 0.4293462]
        )]
        df = spark.createDataFrame(
            rows, "doc_id long, url string, clf_score double"
        )
        r = urls.domain_quality_report(df).collect()[0]
        assert r.n_docs == 4 and abs(r.avg_score - 0.257337) < 1e-9
