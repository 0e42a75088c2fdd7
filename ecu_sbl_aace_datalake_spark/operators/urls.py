"""URL canonicalization + URL/domain-level dedup — the CCNet-style crawl
curation stage that runs BEFORE content dedup: collapse tracking-param /
casing / default-port / trailing-slash variants of the same page, then
dedup at URL granularity and audit per-domain concentration.

Reference parity note: the reference engine (common.py) has no crawl
tooling — this module is part of the mandated training-data-pipeline
extension surface (CCNet, Wenzek et al. 2020; RefinedWeb §3.1 URL
filtering/dedup).

Everything is pure Column expressions (regexp over the URL grammar's
coarse structure — scheme://authority/path?query#fragment) so the whole
stage stays inside whole-stage codegen (repeated sub-expressions are
cheap single regexps over short strings — codegen's common-subexpression
elimination covers the reuse) and a SQL oracle can replicate it verbatim.
At 100 TB: canonicalization is map-side; URL dedup is one hash-shuffle on
the canonical string; domain stats one aggregate.

Canonical form (documented contract, applied in this order):
1. trim; strip ``#fragment``.
2. scheme must be http/https (case-insensitive) — anything else → NULL.
3. authority: drop ``userinfo@``; lowercase host; strip a leading
   ``www.``; drop the port when it is the scheme default (80/443),
   keep any other port.
4. path: strip trailing ``/``-runs (``/a/`` == ``/a``; root ``/`` == '').
   Case and internal duplicate slashes are preserved.
5. query: split on ``&``, drop empty params and tracking params
   (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``, ``ref``,
   ``ref_src``), sort the survivors bytewise, rejoin; empty → no ``?``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonical_url",
    "registrable_domain",
    "url_host",
    "url_dedup",
    "domain_stats",
    "crawl_snapshot_diff",
    "persist_url_index",
    "urls_against_index",
    "append_url_index",
    "TRACKING_PARAM_RE",
    "TWO_LEVEL_TLDS",
]

# params that never change page identity (CCNet/common-crawl practice)
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref|ref_src)(=.*)?$"

# frozen approximation of the public-suffix list's 2-level entries that
# this module recognizes (the real PSL is a data file; the approximation
# is documented, deterministic, and oracle-replicable)
TWO_LEVEL_TLDS = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.kr", "co.in", "co.nz", "co.za",
    "com.br", "com.cn", "com.mx", "com.tr", "com.sg", "com.ar",
)


def _nofrag(col) -> F.Column:
    u = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(u), "#.*", "")


def url_host(col) -> F.Column:
    """Lowercased host of a URL column (userinfo and port dropped,
    leading ``www.`` stripped); empty string when there is no
    ``scheme://`` part."""
    nf = _nofrag(col)
    after = F.regexp_extract(nf, r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    authority = F.regexp_extract(after, r"^([^/?]*)", 1)
    host_port = F.lower(F.regexp_replace(authority, "^[^@]*@", ""))
    return F.regexp_replace(
        F.regexp_extract(host_port, r"^([^:]*)", 1), r"^www\.", ""
    )


def canonical_url(col) -> F.Column:
    """Canonical form of a URL column per the module contract; NULL for
    rows without an http/https scheme or with an empty host."""
    nf = _nofrag(col)
    scheme = F.lower(F.regexp_extract(nf, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    after = F.regexp_extract(nf, r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    authority = F.regexp_extract(after, r"^([^/?]*)", 1)
    # everything after the authority: '', or starts with '/' or '?'
    pathq = F.regexp_extract(after, r"^[^/?]*(.*)$", 1)
    host_port = F.lower(F.regexp_replace(authority, "^[^@]*@", ""))
    host = F.regexp_replace(
        F.regexp_extract(host_port, r"^([^:]*)", 1), r"^www\.", ""
    )
    port = F.regexp_extract(host_port, r":([0-9]+)$", 1)
    port_part = (
        F.when(port == "", F.lit(""))
        .when((scheme == "http") & (port == "80"), F.lit(""))
        .when((scheme == "https") & (port == "443"), F.lit(""))
        .otherwise(F.concat(F.lit(":"), port))
    )
    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1), "/+$", "")
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    q2 = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        port_part,
        path,
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
    )
    return F.when(scheme.isin("http", "https") & (host != ""), canon)


def registrable_domain(host_col) -> F.Column:
    """Approximate eTLD+1 for a HOST string column: the last 3 labels
    when the host ends in a recognized 2-level TLD
    (:data:`TWO_LEVEL_TLDS`), else the last 2 labels; hosts with ≤ 2
    labels pass through unchanged."""
    h = F.col(host_col) if isinstance(host_col, str) else host_col
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, F.greatest(n - 1, F.lit(1)), 2), ".")
    last3 = F.array_join(F.slice(parts, F.greatest(n - 2, F.lit(1)), 3), ".")
    return F.when(n <= 2, h).when(last2.isin(*TWO_LEVEL_TLDS), last3).otherwise(last2)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    tiebreak: str | None = None,
    out_col: str = "canonical_url",
) -> DataFrame:
    """URL-level dedup: keep ONE row per canonical URL — the smallest
    ``tiebreak`` value wins deterministically (required; URL dedup at
    crawl scale must be replayable). Rows whose URL does not
    canonicalize (no http/https scheme, empty host) are KEPT — they
    carry a NULL ``out_col`` and never group together.

    One shuffle on the canonical string (min_by aggregate — map-side
    partial combine, no window); returns the surviving rows with
    ``out_col`` appended.
    """
    if tiebreak is None:
        raise ValueError("url_dedup requires an explicit tiebreak column")
    tagged = df.withColumn(out_col, canonical_url(url_col))
    bad = tagged.where(F.col(out_col).isNull())
    good = tagged.where(F.col(out_col).isNotNull())
    packed = F.struct(F.col(tiebreak), *[F.col(c) for c in tagged.columns if c != tiebreak])
    kept = (
        good.groupBy(out_col)
        .agg(F.min(packed).alias("__row"))
        .select(*[F.col(f"__row.{c}").alias(c) for c in [tiebreak] + [x for x in tagged.columns if x != tiebreak]])
        .select(*tagged.columns)
    )
    return kept.unionByName(bad)


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    round_to: int = 6,
) -> DataFrame:
    """Per-registrable-domain crawl concentration: URL count, distinct
    canonical-URL count, and the domain's share of all canonicalizable
    rows. The standard pre-training audit (a domain with a huge
    dup-ratio or share is a boilerplate farm). One aggregate; the share
    divides by a broadcast scalar derived from the same pass.

    Returns ``(domain, n_urls, n_canonical, share)``.
    """
    tagged = (
        df.select(canonical_url(url_col).alias("__c"))
        .where(F.col("__c").isNotNull())
        .select(
            registrable_domain(
                F.regexp_extract(F.col("__c"), r"^https?://([^:/?]*)", 1)
            ).alias("domain"),
            F.col("__c"),
        )
    )
    per = tagged.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("__c").cast("long").alias("n_canonical"),
    )
    total = per.select(F.sum("n_urls").alias("__t"))
    return per.crossJoin(F.broadcast(total)).select(
        "domain",
        "n_urls",
        "n_canonical",
        F.round(F.col("n_urls").cast("double") / F.col("__t"), round_to).alias(
            "share"
        ),
    )


def crawl_snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Crawl-snapshot diff at canonical-URL granularity — the re-crawl
    audit: which pages are ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` between two snapshots. Each side is first deduped to
    one row per canonical URL (content compared via trimmed md5, the
    corpus exact-door convention); uncanonicalizable rows are excluded
    (they have no stable page identity to diff on).

    One full outer join on the canonical string — the 100 TB shape is a
    single hash shuffle per side. Returns
    ``(canonical_url, status, old_hash, new_hash)``.
    """
    def side(df: DataFrame, tag: str) -> DataFrame:
        c = df.select(
            canonical_url(url_col).alias("canonical_url"),
            F.md5(F.trim(F.col(text_col))).alias(f"{tag}_hash"),
        ).where(F.col("canonical_url").isNotNull())
        # one content hash per canonical URL: smallest hash wins so the
        # diff is deterministic when a snapshot carries dup URLs
        return c.groupBy("canonical_url").agg(
            F.min(f"{tag}_hash").alias(f"{tag}_hash")
        )

    o = side(old, "old")
    n = side(new, "new")
    j = o.join(n, "canonical_url", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("canonical_url", status.alias("status"), "old_hash", "new_hash")


def persist_url_index(
    corpus_df: DataFrame,
    url_col: str = "url",
    index_table: str = "url_index",
    n_buckets: int = 32,
    reuse_if_exists: bool = False,
) -> dict:
    """Materialize the corpus's canonical-URL set as a BUCKETED catalog
    table, so the streaming URL door stops re-reading the whole corpus
    per batch (the production form of the inline anti-join — same
    pattern as the persisted near-dup/BM25/IVF indexes): per-batch cost
    becomes |batch| canonicalization + a bucket-local anti-join; the
    corpus contributes only the matched buckets' rows. Appends are
    bucket-stable (:func:`append_url_index`), so the index never
    rebuilds as the corpus grows.

    Pass a raw ``url_col`` (canonicalized here) or a frame already
    carrying ``canonical_url``. Returns the index params dict the probe
    and append functions take.
    """
    spark = corpus_df.sparkSession
    from ..sources.io import write_bucketed_table

    params = {"index_table": index_table, "n_buckets": n_buckets}
    if reuse_if_exists and spark.catalog.tableExists(index_table):
        return params
    if "canonical_url" in corpus_df.columns:
        canon = corpus_df.select("canonical_url")
    else:
        canon = corpus_df.select(canonical_url(url_col).alias("canonical_url"))
    canon = canon.where(F.col("canonical_url").isNotNull()).distinct()
    write_bucketed_table(
        spark, index_table, canon, "canonical_url", n_buckets,
        sort_cols="canonical_url",
    )
    return params


def urls_against_index(
    new_df: DataFrame,
    index: dict,
    url_col: str = "url",
    out_col: str = "canonical_url",
) -> DataFrame:
    """Filter a batch against a :func:`persist_url_index`: returns the
    rows whose canonical URL is NOT already indexed (plus rows that do
    not canonicalize — no stable identity, they fall through to content
    dedup), with ``out_col`` appended. The anti-join clusters on the
    index's bucket layout — no corpus-side exchange."""
    spark = new_df.sparkSession
    tagged = new_df.withColumn(out_col, canonical_url(url_col))
    known = spark.table(index["index_table"])
    good = tagged.where(F.col(out_col).isNotNull()).join(
        known, tagged[out_col] == known["canonical_url"], "left_anti"
    )
    return good.unionByName(tagged.where(F.col(out_col).isNull()))


def append_url_index(accepted_df: DataFrame, index: dict) -> None:
    """Append an ACCEPTED batch's canonical URLs to the index,
    bucket-stably (one file per touched bucket). ``accepted_df`` must
    carry ``canonical_url`` (as :func:`urls_against_index` leaves it);
    NULLs are skipped."""
    nb = index["n_buckets"]
    (
        accepted_df.select("canonical_url")
        .where(F.col("canonical_url").isNotNull())
        .distinct()
        .repartition(nb, F.col("canonical_url"))
        .write.format("parquet").mode("append")
        .bucketBy(nb, "canonical_url").sortBy("canonical_url")
        .saveAsTable(index["index_table"])
    )


def domain_quality_report(
    df: DataFrame,
    url_col: str = "url",
    score_col: str = "clf_score",
    min_avg: float = 0.5,
) -> DataFrame:
    """Per-registrable-domain quality rollup — the RefinedWeb/DCLM
    curation move of judging QUALITY AT DOMAIN granularity (a domain
    whose average classifier score is low is a content farm; its
    individually-lucky pages go too). Input must already carry a
    per-doc ``score_col`` (e.g. ``classifier.classifier_scores``).

    ONE aggregate on the eTLD+1 key; scores are summed as exact
    DECIMAL(18,6) so the mean is a single deterministic end-division
    (no engine-dependent intermediate rounding). Rows whose URL does
    not canonicalize are excluded — they have no domain to gate.
    ``avg_score`` is the mean over SCORED documents (NULL scores count
    toward ``n_docs`` but not the denominator — dividing the
    NULL-skipping sum by the full row count would deflate domains with
    unscored docs); a domain with zero scored docs gets a NULL
    ``avg_score``/``keep_domain`` and is never dropped on no evidence.

    Returns ``(domain, n_docs, avg_score, keep_domain)``.
    """
    canon = canonical_url(url_col)
    host = F.regexp_extract(canon, r"^https?://([^:/?]*)", 1)
    base = df.where(canon.isNotNull()).select(
        registrable_domain(host).alias("domain"),
        F.col(score_col).cast("decimal(18,6)").alias("__s"),
    )
    agg = base.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("__s").alias("__nsc"),
        F.sum("__s").alias("__sum"),
    )
    avg = F.col("__sum").cast("double") / F.col("__nsc")
    return agg.select(
        "domain",
        "n_docs",
        F.round(avg, 6).alias("avg_score"),
        (avg >= F.lit(min_avg)).alias("keep_domain"),
    )


def drop_low_quality_domains(
    df: DataFrame,
    url_col: str = "url",
    score_col: str = "clf_score",
    min_avg: float = 0.5,
) -> DataFrame:
    """Doc-level application of :func:`domain_quality_report`: drop every
    row whose registrable domain averages below ``min_avg``; rows with
    no canonicalizable URL are KEPT (no domain evidence against them).
    The bad-domain list is a broadcast anti-join — domain cardinality is
    tiny next to the corpus, so the gate is map-side at 100 TB."""
    bad = (
        domain_quality_report(df, url_col, score_col, min_avg)
        .where(~F.col("keep_domain"))
        .select("domain")
    )
    canon = canonical_url(url_col)
    host = F.regexp_extract(canon, r"^https?://([^:/?]*)", 1)
    tagged = df.withColumn(
        "__dom",
        F.when(canon.isNotNull(), registrable_domain(host)),
    )
    return (
        tagged.join(
            F.broadcast(bad),
            tagged["__dom"] == bad["domain"],
            "left_anti",
        )
        .drop("__dom")
    )
