"""Text analysis operators for document corpora.

North-star extension (SURVEY.md §2.13): token counting, quality scoring,
language identification, document fingerprinting — the stats a training-data
pipeline computes over billions of documents.

Scale design: everything here is per-row built-in expressions (split /
regexp / aggregate over arrays) — embarrassingly parallel, no shuffle, stays
in whole-stage codegen. Only language-ID uses a tiny broadcast of per-language
marker tokens.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import CacheScope, persist_in


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text (empty array for empty text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-ish sub-word segmentation via regex: runs of letters, runs of
    digits, or single non-space symbols — the standard pre-tokenizer shape
    (GPT-2 style) without a learned merges table."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars_calc, n_words, n_distinct_words, avg_word_len."""
    t = tokens(text_col)
    return (
        df.withColumn("n_chars_calc", F.length(text_col).cast("long"))
        .withColumn("__toks", t)
        .withColumn("n_words", F.size("__toks").cast("long"))
        .withColumn("n_distinct_words", F.size(F.array_distinct("__toks")).cast("long"))
        .withColumn(
            "avg_word_len",
            F.round(
                F.aggregate(
                    F.transform("__toks", lambda x: F.length(x).cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.greatest(F.size("__toks"), F.lit(1)),
                4,
            ),
        )
        .drop("__toks")
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: penalizes very short/very long docs,
    high punctuation ratio, and low lexical diversity. Deterministic,
    pure-expression — the standard cheap pre-filter before expensive
    model-based scoring."""
    t = tokens(text_col)
    n_words = F.size(t)
    n_chars = F.length(text_col)
    punct = F.length(F.regexp_replace(text_col, r"[A-Za-z0-9\s]", ""))
    diversity = F.size(F.array_distinct(t)) / F.greatest(n_words, F.lit(1))
    len_score = F.when(n_words < 5, 0.2).when(n_words > 10000, 0.5).otherwise(1.0)
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    punct_score = F.when(punct_ratio > 0.2, 0.5).otherwise(1.0)
    score = F.round(len_score * punct_score * (0.5 + 0.5 * diversity), 4)
    return df.withColumn("quality_score", score)


# tiny per-language marker-token sets for the n-gram/stopword heuristic;
# at scale these broadcast as literal arrays (bytes, not a model file)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "dans"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "人", "这", "不"],
}


def with_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Marker-token language ID: score each language by the fraction of its
    marker tokens present; 'zh' additionally by CJK character presence.
    Ties/no-hits → 'und'. Pure expressions; good enough as the cheap first
    pass (a real pipeline would escalate uncertain docs to a model)."""
    toks = F.array_distinct(tokens(F.lower(F.col(text_col))))
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        if lang == "zh":
            hit = F.when(
                F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", "")) > 0,
                F.lit(10),
            ).otherwise(F.size(F.array_intersect(toks, marker_arr)))
        else:
            hit = F.size(F.array_intersect(toks, marker_arr))
        scores.append(F.struct(hit.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


def with_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "fingerprint",
    algo: str = "xxhash64",
) -> DataFrame:
    """Document fingerprint: rolling hash over normalized tokens
    (order-sensitive, whitespace/punct-insensitive) — stable content id for
    exact-content dedup that survives formatting noise.

    ``algo="xxhash64"`` (default): 64-bit fold via xxhash64, fastest.
    ``algo="md5"``: md5-chain fold yielding a 32-hex string — same
    semantics, replicable by a SQL oracle via ``list_reduce`` (both are
    one codegen'd aggregate; md5 is ~2x slower but collision-stronger).
    """
    norm = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "), r"\s+"),
        lambda t: t != "",
    )
    if algo == "md5":
        fp = F.aggregate(
            norm,
            F.lit("seed"),
            lambda acc, tok: F.md5(F.concat_ws("|", acc, tok)),
        )
    elif algo == "xxhash64":
        fp = F.aggregate(
            norm,
            F.lit(1469598103934665603).cast("long"),  # FNV-1a offset basis
            lambda acc, tok: F.xxhash64(acc.cast("string"), tok),
        )
    else:
        raise ValueError(f"unknown algo {algo!r}")
    return df.withColumn(out_col, fp)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 100,
    stride: int = 80,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the standard
    pre-training/RAG chunking op. Chunk k covers tokens
    [1+k·stride, 1+k·stride+window); every token lands in ≥1 chunk when
    stride <= window.

    One explode per document (no shuffle); chunk text re-materialized from
    the token slice so downstream ops (hashing, embedding) see clean
    whitespace. Output: (id, chunk_id, chunk_text, n_chunk_words).
    """
    toks = tokens(text_col)
    out = df.withColumn("__toks", toks).select(
        id_col,
        F.col("__toks"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("__toks"), F.lit(1)), F.lit(stride))
        ).alias("__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start"), window)
    return out.select(
        id_col,
        (((F.col("__start") - 1) / stride).cast("long")).alias("chunk_id"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_chunk_words"),
    )


def token_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level token frequency table: explode tokens → groupBy count.
    One shuffle on token; at 100 TB add a salt-and-resum for hot tokens
    (partial aggregation already absorbs most skew map-side)."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )


def tf_idf(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-(doc, token) TF-IDF over the whole corpus.

    tf = occurrences of token in doc; df_t = number of docs containing the
    token; idf = ln(N / df_t); tfidf = tf * idf (both rounded to 6dp).

    Scale design: two shuffles — (doc, token) for tf, then token for df_t.
    The tf→df_t join keys on token only; AQE broadcasts the document-frequency
    side when the vocabulary is small and falls back to a shuffle hash join
    when it isn't (100 TB corpora have ~10^8-token vocabularies — never
    driver-collected here). N is a scalar broadcast (1-row cross join).
    Downstream per-doc filters push through the join into the tf branch only,
    leaving df_t computed over the full corpus as TF-IDF requires.
    """
    exploded = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    tf = exploded.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df_t"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    idf = F.log(F.col("n_docs").cast("double") / F.col("df_t"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "token",
            "tf",
            "df_t",
            F.round(idf, 6).alias("idf"),
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )


def tfidf_cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_ratio: float = 1.0,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Sparse cosine retrieval over TF-IDF vectors via an inverted-index
    join — the term-at-a-time plan search engines use, and the scale-correct
    alternative to dense brute force for lexical similarity.

    Plan: tf_idf() builds (doc, token, weight) postings; the query side is a
    tiny slice of those postings (broadcast), joined to the full postings
    list on token — partial dot products accumulate per (query, doc) with
    map-side combine, then one row_number window takes top-k per query.
    No driver collect, no O(n²) pairs: cost is Σ_t |postings(t)|² only over
    tokens the queries contain.

    Skew/scale: stopword-grade tokens create hot postings lists;
    ``max_df_ratio`` drops tokens appearing in more than that fraction of
    docs (standard retrieval pruning — they carry ~zero idf weight anyway).

    Ties: scores are rounded to 6dp and ranked (score desc, id asc), so
    ranking is deterministic and engine-independent.
    """
    w = tf_idf(df, text_col, id_col).select(
        id_col, "token", "df_t", F.col("tfidf").alias("w")
    )
    if max_df_ratio < 1.0:
        n_docs = df.count()
        w = w.where(F.col("df_t") <= int(max_df_ratio * n_docs))
    # the postings table feeds three consumers (norms, query slice, the
    # inverted-index join) — persist it or the whole tokenize+tf+idf chain
    # recomputes per branch (measured 3x the shuffle volume without this)
    w = persist_in(scope, w.drop("df_t"))
    norms = w.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    q = w.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), "token", F.col("w").alias("qw")
    )
    dots = (
        F.broadcast(q)
        .join(w, "token")
        .where(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("qw") * F.col("w")).alias("dot"))
    )
    qnorms = norms.select(
        F.col(id_col).alias("query_id"), F.col("norm").alias("qnorm")
    )
    scored = (
        dots.join(F.broadcast(qnorms), "query_id")
        .join(norms, id_col)
        .where((F.col("qnorm") > 0) & (F.col("norm") > 0))
        .select(
            "query_id",
            F.col(id_col).alias("match_id"),
            F.round(F.col("dot") / (F.col("qnorm") * F.col("norm")), 6).alias(
                "score"
            ),
        )
    )
    from pyspark.sql.window import Window

    wdw = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wdw).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )


def _bm25_postings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k1: float,
    b: float,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Persisted (id, token, w) BM25 postings: w already folds idf,
    tf saturation, and length normalization, so scoring any query is a
    token join + SUM(w). Persisted; pass ``scope`` from repeated callers
    so the cache can be released after materialization."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df_t"))
    scalars = df.agg(
        F.count("*").alias("n_docs")
    ).crossJoin(dl.agg(F.avg("dl").alias("avgdl")))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
    )
    return persist_in(
        scope,
        tf.join(dfreq, "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scalars))
        .select(
            id_col,
            "token",
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("w"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Okapi BM25 retrieval over the same inverted-index plan as
    :func:`tfidf_cosine_topk` — the standard lexical ranking function
    (idf · tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)) summed over shared terms).

    idf uses the non-negative form ln(1 + (N-df+0.5)/(df+0.5)). The length
    normalization needs per-doc token counts (dl) and the corpus mean
    (avgdl, a 1-row broadcast scalar). Query side = the query docs' term
    rows (tiny, broadcast); candidates come from the postings join on
    token — cost tracks postings-list sizes, never O(n²).

    Scores rounded to 6dp, ranked (score desc, id asc) — deterministic and
    engine-independent.
    """
    postings = _bm25_postings(df, text_col, id_col, k1, b, scope=scope)
    q_terms = postings.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), "token"
    )
    scored = (
        F.broadcast(q_terms)
        .join(postings, "token")
        .where(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    from pyspark.sql.window import Window

    wdw = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(wdw).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("match_id"), "score", "rank")
    )


def rrf_fuse(*ranked: DataFrame, rrf_k: int = 60, k: int = 5) -> DataFrame:
    """Reciprocal-rank fusion of retrieval result lists — the standard
    hybrid-retrieval combiner (lexical BM25 + dense embeddings, etc.):
    ``score(d) = Σ_lists 1/(rrf_k + rank_list(d))``, missing entries
    contribute nothing. Rank-based, so no per-list score calibration is
    needed.

    Inputs are DataFrames shaped like the retrieval operators' output
    (``query_id, match_id, rank``). Union + one aggregation + one top-k
    window — the fused lists are tiny (|queries|·k per list), so this is
    driver-negligible at any corpus scale.
    """
    from functools import reduce

    contribs = [
        df.select(
            "query_id",
            "match_id",
            (F.lit(1.0) / (F.lit(rrf_k) + F.col("rank"))).alias("c"),
        )
        for df in ranked
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), contribs)
    scored = unioned.groupBy("query_id", "match_id").agg(
        F.round(F.sum("c"), 6).alias("score")
    )
    from pyspark.sql.window import Window

    wdw = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wdw).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )


def bm25_topk_text(
    df: DataFrame,
    queries: list[str],
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Free-text BM25 search: score ad-hoc query STRINGS against the corpus
    (``query_id`` = position in ``queries``). Same persisted postings as
    :func:`bm25_topk`; the query side is the distinct tokens of each query
    string — the standard short-query form (query-side tf ignored).

    This is the ad-hoc search entry point; ``bm25_topk`` is query-by-doc.
    """
    postings = _bm25_postings(df, text_col, id_col, k1, b, scope=scope)
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        list(enumerate(queries)), "query_id long, qtext string"
    )
    q_terms = qdf.select(
        "query_id", F.explode(F.array_distinct(tokens("qtext"))).alias("token")
    )
    scored = (
        F.broadcast(q_terms)
        .join(postings, "token")
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    from pyspark.sql.window import Window

    wdw = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(wdw).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("match_id"), "score", "rank")
    )


def persist_bm25_index(
    df: DataFrame,
    table_name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
):
    """Materialize the BM25 postings ON DISK: (id, token, w) with idf,
    tf-saturation, and length normalization already folded into ``w``
    (see :func:`_bm25_postings`), written bucketed by token.

    The production form of the inline retrieval ops: tokenization and the
    corpus statistics passes are paid once at ingest; every query
    afterwards is a bucket-local join against the query terms' postings —
    no corpus re-scan, no re-hash. Returns write info. Rebuild on corpus
    change (idf/avgdl are corpus-global).
    """
    from ..caching import CacheScope
    from ..sources.io import write_bucketed_table

    scope = CacheScope()
    postings = _bm25_postings(df, text_col, id_col, k1, b, scope=scope)
    spark = df.sparkSession
    try:
        return write_bucketed_table(
            spark, table_name, postings, "token", 16, sort_cols="token"
        )
    finally:
        # the write materialized the postings; release the cache so
        # repeated index builds in one session don't accumulate storage
        scope.unpersist()


def bm25_topk_text_from_index(
    spark,
    table_name: str,
    queries: list[str],
    k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Free-text BM25 against a :func:`persist_bm25_index` table: the
    postings come off disk (bucketed by token — the join needs no postings
    shuffle), so query cost is independent of corpus tokenization."""
    postings = spark.table(table_name)
    qdf = spark.createDataFrame(
        list(enumerate(queries)), "query_id long, qtext string"
    )
    q_terms = qdf.select(
        "query_id", F.explode(F.array_distinct(tokens("qtext"))).alias("token")
    )
    scored = (
        F.broadcast(q_terms)
        .join(postings, "token")
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    from pyspark.sql.window import Window

    wdw = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(wdw).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("match_id"), "score", "rank")
    )


def with_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    line_sep: str = r"\n",
) -> DataFrame:
    """Gopher/MassiveText-style repetition + symbol quality signals, as
    pure column expressions (no Python, no shuffle — per-row only):

    - ``dup_line_frac``   — fraction of non-empty lines that are repeats of
      an earlier line (0 when every line is unique).
    - ``top_2gram_frac``  — occurrences of the most frequent word 2-gram /
      total 2-grams (boilerplate/spam detector).
    - ``symbol_word_ratio`` — non-alphanumeric symbol characters (excluding
      whitespace) per word.
    - ``frac_words_alpha`` — fraction of words containing at least one
      letter (Gopher keeps docs with >= 0.8).

    The 2-gram mode is computed with array expressions (distinct → count
    each) — O(d·n) per document where d = distinct 2-grams; documents are
    bounded, so this stays cheap and entirely inside codegen'd projection.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), line_sep), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))) / n_lines,
    ).otherwise(F.lit(0.0))

    toks = tokens(text_col)
    n_toks = F.size(toks)
    grams = F.when(
        n_toks >= 2,
        F.transform(
            F.sequence(F.lit(1), n_toks - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top_2gram_frac = F.when(
        F.size(grams) > 0,
        F.array_max(
            F.transform(
                F.array_distinct(grams),
                lambda g: F.size(F.filter(grams, lambda y: y == g)),
            )
        )
        / F.size(grams),
    ).otherwise(F.lit(0.0))

    symbols = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    words = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    symbol_word_ratio = F.when(
        n_words > 0, symbols / n_words
    ).otherwise(F.lit(0.0))
    frac_words_alpha = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words,
    ).otherwise(F.lit(0.0))

    return (
        df.withColumn("dup_line_frac", F.round(dup_line_frac, 4))
        .withColumn("top_2gram_frac", F.round(top_2gram_frac, 4))
        .withColumn("symbol_word_ratio", F.round(symbol_word_ratio, 4))
        .withColumn("frac_words_alpha", F.round(frac_words_alpha, 4))
    )


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_top_2gram_frac: float = 0.20,
    max_symbol_word_ratio: float = 0.10,
    min_frac_words_alpha: float = 0.80,
) -> DataFrame:
    """Apply the Gopher repetition/symbol thresholds: keep rows passing all
    four :func:`with_repetition_stats` gates (thresholds per the published
    MassiveText rules; tune per-corpus)."""
    scored = with_repetition_stats(df, text_col)
    return scored.where(
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("top_2gram_frac") <= max_top_2gram_frac)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("frac_words_alpha") >= min_frac_words_alpha)
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 1.0,
    out_col: str = "lm_logprob",
) -> DataFrame:
    """Corpus-self-trained bigram language-model scoring — the CCNet-style
    perplexity quality signal WITHOUT an external model: train add-k
    smoothed bigram probabilities on the corpus itself, score each document
    by its mean bigram log-probability. Fluent/typical documents score
    high; gibberish, boilerplate, and wrong-language docs score low —
    rank-filter on the output (e.g. drop the bottom decile).

    ``P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V)`` over lowercase
    alphanumeric tokens; ``lm_logprob`` = mean ln P over the doc's bigram
    OCCURRENCES (not distinct), rounded to 4dp; docs with < 2 tokens get
    null. Also emits ``n_bigrams``.

    Scale: two count shuffles (bigram, unigram-context) + one join of the
    exploded corpus back to the counts — all keyed on token values, AQE
    handles the Zipf skew of hot contexts (skew-join split). Vocabulary
    never collects to the driver; V is a 1-row broadcast scalar.
    """
    return df.join(
        _bigram_lm_doc_scores(df, text_col, id_col, add_k, out_col),
        id_col,
        "left",
    )


def _bigram_lm_doc_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    add_k: float,
    out_col: str = "lm_logprob",
) -> DataFrame:
    """NARROW per-doc LM aggregate behind :func:`bigram_lm_scores`:
    ``(id_col, out_col, n_bigrams)``, one row per doc that HAS >= 1
    bigram (docs with < 2 tokens are absent — the caller's left join
    supplies their NULLs). Split out in round 12 so rank-based consumers
    (:func:`ccnet_buckets`) can rank on this narrow relation instead of
    range-shuffling the full document payload."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    base = df.select(F.col(id_col), toks.alias("__t"))
    n_t = F.size("__t")
    grams = base.select(
        id_col,
        F.explode(
            F.when(
                n_t >= 2,
                F.transform(
                    F.sequence(F.lit(1), n_t - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("__t"), i).alias("w1"),
                        F.element_at(F.col("__t"), i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("g"),
    ).select(id_col, "g.w1", "g.w2")
    c2 = grams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = grams.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = base.select(F.explode("__t").alias("w")).agg(
        F.count_distinct("w").alias("v")
    )
    k = F.lit(float(add_k))
    logp = F.log((F.col("c2") + k) / (F.col("c1") + k * F.col("v")))
    return (
        grams.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.round(F.avg(logp), 4).alias(out_col),
            F.count("*").alias("n_bigrams"),
        )
    )


def ccnet_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 3,
    labels: tuple = ("head", "middle", "tail"),
    add_k: float = 1.0,
) -> DataFrame:
    """CCNet-style perplexity buckets (Wenzek et al. 2020 §4.3): score
    every document with the corpus-self-trained bigram LM
    (:func:`bigram_lm_scores`), rank by fluency (higher mean log-prob
    first, id tiebreak), and split into ``n_buckets`` equal rank slices —
    ``head`` (most fluent) / ``middle`` / ``tail``, the standard quality
    partition that downstream mixtures sample from at different rates.

    Bucket boundaries are RANK-based (``floor(n_buckets·(rank−1)/n)``),
    not score-quantile-based, so the split is exact, deterministic, and
    oracle-replicable (scores are 4dp-rounded by the LM; the id tiebreak
    resolves equal scores identically in any engine). Docs the LM cannot
    score (< 2 tokens) get a NULL bucket.

    Scale: the LM is two count shuffles + one join; the global rank uses
    :func:`~.transform.add_index_col_distributed` (range partition +
    broadcast offsets) — never a single-partition sort. Round 12 (guide
    §2.3 — shuffle keys/metadata, not payloads): the rank/bucket pass runs
    over the NARROW ``(id, lm_logprob, n_bigrams)`` LM aggregate and the
    document payload is attached by ONE left join at the end — previously
    the full payload (text and all caller columns) was range-shuffled,
    checkpointed and unioned through the ranking. Requires unique ids —
    already the contract (the rank tiebreak assumes it).

    Returns ``df`` + ``lm_logprob``, ``n_bigrams``, ``bucket``.
    """
    if len(labels) != n_buckets:
        raise ValueError("labels must have n_buckets entries")
    from .transform import add_index_col_distributed

    scored = _bigram_lm_doc_scores(df, text_col, id_col, add_k)
    ranked = add_index_col_distributed(
        scored.withColumn("__neg", -F.col("lm_logprob")),
        col_name="__rk",
        order_by=["__neg", id_col],
    ).drop("__neg")
    n = ranked.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    lab = F.array(*[F.lit(s) for s in labels])
    bucket = F.element_at(
        lab,
        (
            F.floor(
                F.lit(int(n_buckets)) * (F.col("__rk") - 1) / F.col("__n")
            )
            + 1
        ).cast("int"),
    )
    out_ok = ranked.crossJoin(F.broadcast(n)).select(
        F.col(id_col), "lm_logprob", "n_bigrams", bucket.alias("bucket")
    )
    return df.join(out_ok, id_col, "left")


def trigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 1.0,
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
    out_col: str = "lm_logprob3",
) -> DataFrame:
    """Corpus-self-trained INTERPOLATED trigram LM scoring — the backoff
    extension of :func:`bigram_lm_scores` (VERDICT r2 item 6):

    ``P(w3|w1,w2) = λ3·P3 + λ2·P2 + λ1·P1`` with add-k smoothing at each
    order (Jelinek-Mercer interpolation):
    ``P3 = (c(w1w2w3)+k)/(c(w1w2·)+kV)`` over trigram occurrences,
    ``P2 = (c(w2w3)+k)/(c(w2·)+kV)`` over bigram occurrences,
    ``P1 = (c(w3)+k)/(N+kV)`` over tokens. ``lm_logprob3`` is the mean
    ln P over the doc's trigram OCCURRENCES (4dp); docs with < 3 tokens
    get null. Also emits ``n_trigrams``.

    Interpolation is what makes trigram usable on a self-trained corpus:
    raw add-k trigrams are dominated by the kV denominator (almost every
    trigram is rare), while the λ-mix lets the robust bigram/unigram
    levels carry unseen contexts — the standard backoff answer.

    Scale: same bounded-vocab two-shuffle-per-level shape as the bigram
    scorer — five keyed count aggregates + joins back on token keys (AQE
    splits the Zipf-hot contexts), vocabulary never collected, V and N
    are 1-row broadcast scalars.
    """
    l3, l2, l1 = (float(x) for x in lambdas)
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    base = df.select(F.col(id_col), toks.alias("__t"))
    n_t = F.size("__t")
    g3 = base.select(
        id_col,
        F.explode(
            F.when(
                n_t >= 3,
                F.transform(
                    F.sequence(F.lit(1), n_t - 2),
                    lambda i: F.struct(
                        F.element_at(F.col("__t"), i).alias("w1"),
                        F.element_at(F.col("__t"), i + 1).alias("w2"),
                        F.element_at(F.col("__t"), i + 2).alias("w3"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<w1:string,w2:string,w3:string>>")
            )
        ).alias("g"),
    ).select(id_col, "g.w1", "g.w2", "g.w3")
    g2 = base.select(
        F.explode(
            F.when(
                n_t >= 2,
                F.transform(
                    F.sequence(F.lit(1), n_t - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("__t"), i).alias("b1"),
                        F.element_at(F.col("__t"), i + 1).alias("b2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<b1:string,b2:string>>"))
        ).alias("g")
    ).select("g.b1", "g.b2")
    c3 = g3.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c3"))
    c12 = g3.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    cb2 = g2.groupBy("b1", "b2").agg(F.count("*").alias("cb2"))
    cb1 = g2.groupBy("b1").agg(F.count("*").alias("cb1"))
    toks_flat = base.select(F.explode("__t").alias("w"))
    cu = toks_flat.groupBy("w").agg(F.count("*").alias("cu"))
    scalars = toks_flat.agg(
        F.count_distinct("w").alias("v"), F.count("*").alias("nn")
    )
    k = F.lit(float(add_k))
    p3 = (F.col("c3") + k) / (F.col("c12") + k * F.col("v"))
    p2 = (F.col("cb2") + k) / (F.col("cb1") + k * F.col("v"))
    p1 = (F.col("cu") + k) / (F.col("nn") + k * F.col("v"))
    logp = F.log(F.lit(l3) * p3 + F.lit(l2) * p2 + F.lit(l1) * p1)
    scored = (
        g3.join(c3, ["w1", "w2", "w3"])
        .join(c12, ["w1", "w2"])
        .join(cb2, (F.col("w2") == F.col("b1")) & (F.col("w3") == F.col("b2")))
        .drop("b1", "b2")
        .join(cb1.withColumnRenamed("b1", "w2"), "w2")
        .join(cu.withColumnRenamed("w", "w3"), "w3")
        .crossJoin(F.broadcast(scalars))
        .groupBy(id_col)
        .agg(
            F.round(F.avg(logp), 4).alias(out_col),
            F.count("*").alias("n_trigrams"),
        )
    )
    return df.join(scored, id_col, "left")


def bm25f_topk_text(
    df: DataFrame,
    queries: list[str],
    field_weights: dict[str, float],
    k: int = 5,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    scope: CacheScope | None = None,
) -> DataFrame:
    """BM25F fielded retrieval (simple BM25F, Zaragoza et al. CIKM'04):
    each field's term frequency is length-normalized within its OWN field
    (``B_f = 1 - b + b·dl_f/avgdl_f``) and scaled by the field weight,
    the weighted tfs sum into one pseudo-frequency, and saturation +
    idf apply ONCE to the combined value — this is what distinguishes
    BM25F from naively summing per-field BM25 scores (which over-rewards
    documents matching the same term in many fields).

    ``field_weights`` maps text column → boost (e.g. title 2.0, body 1.0).
    idf uses the any-field document frequency. Scale shape is identical to
    :func:`bm25_topk_text`: per-field token stats are partial-agg shuffles
    on (id, token), the combined postings persist once, and each query is
    a broadcast token join + SUM.
    """
    per_field = []
    for f_col, wgt in field_weights.items():
        toks = df.select(F.col(id_col), F.explode(tokens(f_col)).alias("token"))
        tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
        dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
        avgdl = dl.agg(F.avg("dl").alias("avgdl"))
        bf = F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        per_field.append(
            tf.join(dl, id_col)
            .crossJoin(F.broadcast(avgdl))
            .select(
                id_col,
                "token",
                (F.lit(float(wgt)) * F.col("tf") / bf).alias("tfn"),
            )
        )
    combined = per_field[0]
    for other in per_field[1:]:
        combined = combined.unionByName(other)
    tft = combined.groupBy(id_col, "token").agg(F.sum("tfn").alias("tfn"))
    dfreq = tft.groupBy("token").agg(F.count("*").alias("df_t"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
    )
    postings = persist_in(
        scope,
        tft.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "token",
            (idf * F.col("tfn") / (F.lit(k1) + F.col("tfn"))).alias("w"),
        ),
    )
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        list(enumerate(queries)), "query_id long, qtext string"
    )
    q_terms = qdf.select(
        "query_id", F.explode(F.array_distinct(tokens("qtext"))).alias("token")
    )
    scored = (
        F.broadcast(q_terms)
        .join(postings, "token")
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    from pyspark.sql.window import Window

    wdw = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(wdw).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("match_id"), "score", "rank")
    )


def dsir_importance_weights(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    add_k: float = 1.0,
    out_col: str = "dsir_weight",
    round_to: int = 6,
) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS'23 — Data Selection
    via Importance Resampling): score every document by how much more
    likely its hashed-bigram bag is under the TARGET distribution than
    under the RAW distribution,
    ``w(x) = Σ_features c(x, f) · [ln p_target(f) − ln p_raw(f)]``,
    with bigrams hashed into ``n_buckets`` (the paper's hashed n-gram
    features) and add-k smoothing on both bucket distributions.

    ``is_target`` is a boolean Column splitting the corpus into the
    target slice (what you want more of) and the raw rest. High-weight
    documents are most target-like; select by rank (or Gumbel-resample
    externally) to build the mixture.

    Hashing uses md5 (not xxhash64) so the computation is reproducible in
    ANSI-SQL engines for oracle verification. Scale: one explode + two
    bucket-count shuffles over a FIXED n_buckets domain (the per-feature
    tables are tiny and broadcast back), then one join of the per-doc
    bucket counts — no vocabulary ever collects, and feature cardinality
    is capped by construction.
    """
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    base = df.select(F.col(id_col), is_target.alias("__tgt"), toks.alias("__t"))
    n_t = F.size("__t")
    grams = base.select(
        id_col,
        "__tgt",
        F.explode(
            F.when(
                n_t >= 2,
                F.transform(
                    F.sequence(F.lit(1), n_t - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("__t"), i),
                        F.element_at(F.col("__t"), i + 1),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10).cast("long")
        % F.lit(int(n_buckets))
    ).alias("bucket")
    bucketed = grams.select(id_col, "__tgt", bucket)
    # per-class bucket totals over the FIXED bucket domain
    totals = bucketed.groupBy("bucket").agg(
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("c_t"),
        F.sum(F.when(F.col("__tgt"), 0).otherwise(1)).alias("c_r"),
    )
    n_t_total = F.sum("c_t").over(Window.partitionBy())
    n_r_total = F.sum("c_r").over(Window.partitionBy())
    k = float(add_k)
    b = float(n_buckets)
    ratios = totals.select(
        "bucket",
        (
            F.log((F.col("c_t") + F.lit(k)) / (n_t_total + F.lit(k * b)))
            - F.log((F.col("c_r") + F.lit(k)) / (n_r_total + F.lit(k * b)))
        ).alias("log_ratio"),
    )
    doc_counts = bucketed.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    weights = (
        doc_counts.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            # + 0.0 collapses IEEE negative zero for engine-stable output
            (F.round(F.sum(F.col("c") * F.col("log_ratio")), round_to) + F.lit(0.0))
            .alias(out_col)
        )
    )
    return df.select(id_col).join(weights, id_col, "left").select(
        id_col, F.coalesce(F.col(out_col), F.lit(0.0)).alias(out_col)
    )


def gumbel_topk_resample(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    k: int = 100,
    temperature: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Gumbel-top-k resampling — draw ``k`` rows WITHOUT replacement with
    probability ∝ exp(weight/temperature), as one distributed top-k
    (Vieira 2014; the selection step of DSIR): adding independent
    Gumbel(0,1) noise to each log-weight and taking the arg-top-k is
    exactly weighted sampling without replacement.

    The Gumbel variate is DETERMINISTIC — ``u`` comes from
    ``md5(seed # id)`` mapped into (0,1), then ``g = −ln(−ln u)`` — so
    results are reproducible across engines, partitionings, and retries
    (no RNG), and the whole draw is a TakeOrderedAndProject, not a
    shuffle-the-world sort.
    """
    two53 = float(1 << 53)
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("#", F.lit(str(seed)), F.col(id_col))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % F.lit(1 << 53)
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(two53)
    gumbel = -F.log(-F.log(u))
    score = F.col(weight_col) / F.lit(float(temperature)) + gumbel
    return (
        df.withColumn("resample_score", F.round(score, 6))
        .orderBy(F.col("resample_score").desc(), F.col(id_col).asc())
        .limit(int(k))
    )


def ngram_diversity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
) -> DataFrame:
    """Per-document n-gram diversity — distinct n-grams over total n-gram
    occurrences (the n-gram type/token ratio): →1 for non-repetitive
    prose, →0 for looping/template text. The self-BLEU-flavoured
    repetition signal pre-training filters use alongside the Gopher
    gates, as pure array expressions (shingle transform → array_distinct),
    zero shuffles — it composes into any scan.

    Adds ``n_ngrams`` (long), ``distinct_ngrams`` (long),
    ``ngram_diversity`` (4dp, null for docs with < n tokens).
    """
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    base = df.withColumn("__t", toks)
    n_g = F.size("__t") - F.lit(n - 1)
    grams = F.when(
        n_g > 0,
        F.transform(
            F.sequence(F.lit(1), n_g),
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("__t"), i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = (
        base.withColumn("__g", grams)
        .withColumn("n_ngrams", F.size("__g").cast("long"))
        .withColumn(
            "distinct_ngrams", F.size(F.array_distinct("__g")).cast("long")
        )
        .withColumn(
            "ngram_diversity",
            F.when(
                F.col("n_ngrams") > 0,
                F.round(
                    F.col("distinct_ngrams") / F.col("n_ngrams") + F.lit(1e-9), 4
                ),
            ),
        )
    )
    return out.drop("__t", "__g")


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
    form: str = "NFC",
) -> DataFrame:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the dedup prerequisite
    nobody skips at web scale: composed ('é') and decomposed ('e'+U+0301)
    spellings of the same text must hash identically before exact/MinHash
    dedup. Spark has no built-in normalizer, so this is an Arrow-batched
    pandas UDF (pure unicodedata, no model); cost is one pass over the
    string bytes. Nulls pass through."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return df.withColumn(out_col, norm(F.col(text_col)))


def phrase_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrase: str,
    count_col: str = "n_matches",
) -> DataFrame:
    """Exact phrase occurrence count per document via positional postings
    — the inverted-index formulation a search engine uses, not a substring
    scan.

    Each posting of a token appearing in the phrase emits an *anchor*
    ``pos - i`` for every phrase slot ``i`` it could fill; a phrase
    occurrence exists at an anchor iff all ``k`` slots are witnessed
    (``count(DISTINCT slot) == k``). Repeated tokens in the phrase and
    overlapping occurrences are both handled exactly — "table table" in
    "table table table" counts 2.

    100 TB shape: the corpus-side postings stream is FILTERED to the
    phrase's tokens before any shuffle (a tiny in-predicate the scan can
    push down), so the aggregate sees only matching-token postings — cost
    tracks the phrase tokens' document frequency, never corpus size.
    Output: ``(id_col, count_col)`` for documents with >= 1 occurrence.
    """
    ph = [t for t in phrase.strip().lower().split() if t]
    if not ph:
        raise ValueError("phrase must contain at least one token")
    k = len(ph)
    # normalized tokens (lowercase, punctuation stripped) — matching the
    # dedup-family tokenizer, not the raw-whitespace `tokens()` helper
    norm = F.filter(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " ")),
            r"\s+",
        ),
        lambda t: t != "",
    )
    postings = df.select(
        id_col, F.posexplode(norm).alias("__pos", "__tok")
    ).where(F.col("__tok").isin(ph))
    slots = [(i, t) for i, t in enumerate(ph)]
    anchored = postings.select(
        id_col,
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("slot"),
                            F.when(F.col("__tok") == F.lit(t), F.col("__pos") - F.lit(i)).alias("anchor"),
                        )
                        for i, t in slots
                    ]
                ),
                lambda s: s["anchor"].isNotNull() & (s["anchor"] >= 0),
            )
        ).alias("__a"),
    ).select(id_col, F.col("__a.slot").alias("__slot"), F.col("__a.anchor").alias("__anchor"))
    occurrences = (
        anchored.groupBy(id_col, "__anchor")
        .agg(F.count_distinct("__slot").alias("__hit"))
        .where(F.col("__hit") == k)
    )
    return occurrences.groupBy(id_col).agg(F.count(F.lit(1)).alias(count_col))


def pmi_cooccurrence(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 5,
    min_count: int = 5,
) -> DataFrame:
    """Pointwise mutual information over token co-occurrences within a
    ±``window`` word distance — the classic collocation / word-association
    statistic (Church & Hanks 1990).

    The pair join is LINEAR in tokens × window, never per-doc quadratic:
    each posting is replicated ``window`` times with target positions
    ``pos+1 .. pos+window`` and equi-joined on (doc, position) — the
    standard skip-gram pair generation. Pairs are unordered
    (least/greatest), counts aggregate corpus-wide, and
    ``pmi = ln(p_ab / (p_a * p_b))`` with p_ab over pair observations and
    p_a over token observations, rounded to 4dp. Output:
    ``(tok_a, tok_b, pair_count, pmi)`` for pairs with
    ``pair_count >= min_count`` (the PMI normalizer uses ALL pairs).
    """
    norm = F.filter(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " ")),
            r"\s+",
        ),
        lambda t: t != "",
    )
    postings = df.select(
        F.col(id_col).alias("__doc"), F.posexplode(norm).alias("__pos", "__tok")
    )
    n_tok = postings.count()
    left = postings.select(
        "__doc",
        F.col("__tok").alias("__ta"),
        F.explode(
            F.sequence(F.col("__pos") + 1, F.col("__pos") + window)
        ).alias("__pos"),
    )
    pairs_all = (
        left.join(postings, ["__doc", "__pos"])
        .select(
            F.least(F.col("__ta"), F.col("__tok")).alias("tok_a"),
            F.greatest(F.col("__ta"), F.col("__tok")).alias("tok_b"),
        )
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .persist()
    )
    # normalizer over ALL pair observations (pre-filter) — true PMI, not
    # renormalized over the surviving head
    n_pairs = pairs_all.agg(F.sum("pair_count")).first()[0] or 1
    pairs = pairs_all.where(F.col("pair_count") >= min_count)
    uni = postings.groupBy(F.col("__tok").alias("__t")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    return (
        pairs.join(F.broadcast(uni.withColumnRenamed("__t", "tok_a")), "tok_a")
        .withColumnRenamed("__c", "__ca")
        .join(F.broadcast(uni.withColumnRenamed("__t", "tok_b")), "tok_b")
        .withColumnRenamed("__c", "__cb")
        .select(
            "tok_a",
            "tok_b",
            "pair_count",
            F.round(
                F.log(
                    (F.col("pair_count") / F.lit(float(n_pairs)))
                    / (
                        (F.col("__ca") / F.lit(float(n_tok)))
                        * (F.col("__cb") / F.lit(float(n_tok)))
                    )
                ),
                4,
            ).alias("pmi"),
        )
    )


# --------------------------------------------------------------------------
# Line-level boilerplate removal (RefinedWeb-style corpus line filtering)
# --------------------------------------------------------------------------

def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_docs: int = 3,
    out_col: str | None = None,
) -> DataFrame:
    """Drop LINES that recur across the corpus (navigation chrome, cookie
    banners, license footers — the RefinedWeb/CCNet line-filtering step):
    a line whose whitespace-normalized lowercase form appears in at least
    ``min_docs`` DISTINCT documents is removed from every document; each
    document is reassembled from its surviving lines in order.

    Differs from :func:`~..operators.dedup.paragraph_dedup` (keep-first)
    deliberately: boilerplate is noise in its first document too, so no
    occurrence survives.

    Scale: one posexplode (no shuffle), one groupBy on the normalized line
    key (bounded by distinct lines, with map-side partial aggregation),
    one join back on that key, one groupBy(id) reassembly. Line text rides
    the shuffle once — same unavoidable cost argument as paragraph_dedup.
    Output: input id + ``out_col`` (default: replaces ``text_col``) +
    ``n_lines``/``n_removed`` (counted over non-empty lines). Every input
    row yields an output row — documents with no non-empty lines come back
    with empty text and zero counts (same contract as paragraph_dedup).
    """
    out_col = out_col or text_col
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    ).where(F.trim("line") != "")
    norm = F.lower(F.trim(F.regexp_replace("line", r"\s+", " ")))
    lines = lines.withColumn("__k", F.md5(norm))
    common = (
        lines.groupBy("__k")
        .agg(F.count_distinct(F.col(id_col)).alias("__ndocs"))
        .where(F.col("__ndocs") >= min_docs)
        .select("__k", F.lit(True).alias("__boiler"))
    )
    kept = (
        lines.join(common, "__k", "left")
        .withColumn("__rm", F.coalesce("__boiler", F.lit(False)))
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("__rm"),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("__out"),
            F.count(F.lit(1)).cast("long").alias("__n_lines"),
            F.sum(F.col("__rm").cast("long")).cast("long").alias("__n_removed"),
        )
    )
    # left-join back onto the full id set: documents whose every line was
    # empty/whitespace have no exploded rows, but must still come out
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__out"), F.lit("")).alias(out_col),
            F.coalesce(F.col("__n_lines"), F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce(F.col("__n_removed"), F.lit(0))
            .cast("long")
            .alias("n_removed"),
        )
    )


# --------------------------------------------------------------------------
# Character-distribution quality signals: entropy + Unicode script mix
# --------------------------------------------------------------------------

def char_entropy(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy (bits/char) of the character
    distribution — the cheap compressibility proxy quality signal: near-0
    entropy is degenerate repetition (``aaaa...``), unusually high entropy
    is often binary junk or encoding damage; natural-language text sits in
    a stable band (~4 bits for English).

    Plan: explode to characters, count per (doc, char), one groupBy(doc)
    for ``-sum(p*log2(p))``. Both aggregations get map-side partial
    combine; nothing leaves the JVM. Output ``(id, n_chars, entropy)``
    with entropy rounded 6dp.
    """
    chars = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("ch")
    ).where(F.col("ch") != "")
    counts = chars.groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("cnt"))
    # H = -sum(p log2 p) = log2(n) - sum(c*log2 c)/n: one aggregate, no
    # window over the group's own sum
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_chars"),
            F.round(
                F.log2(F.sum("cnt"))
                - F.sum(F.col("cnt") * F.log2("cnt")) / F.sum("cnt"),
                6,
            ).alias("entropy"),
        )
    )


_SCRIPT_RANGES: dict[str, list[tuple[int, int]]] = {
    # (lo, hi) inclusive codepoint ranges per script class — the coarse
    # blocks a language-mix audit needs, not a full Unicode property table.
    "latin": [(0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)],
    "digit": [(0x30, 0x39)],
    "cyrillic": [(0x400, 0x4FF)],
    "greek": [(0x370, 0x3FF)],
    "arabic": [(0x600, 0x6FF)],
    "cjk": [(0x3040, 0x30FF), (0x4E00, 0x9FFF), (0xAC00, 0xD7AF)],
}


def script_mix(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-document Unicode-script composition: the fraction of non-space
    characters falling in each coarse script class (latin / digit /
    cyrillic / greek / arabic / cjk / other) — the standard multilingual-
    corpus audit signal (mixed-script docs are frequently spam or mojibake,
    and per-language pipelines route on the dominant script).

    Pure column expressions: one char split + ``size(filter(...))`` per
    class over codepoints (``ascii`` returns the full codepoint of the
    first character, not just 7-bit ASCII) — no explode, no shuffle beyond
    the projection itself, stays in whole-stage codegen.
    """
    chars = F.filter(
        F.split(F.col(text_col), ""),
        lambda c: (c != "") & ~c.rlike(r"^\s$"),
    )
    n = F.size(chars)

    def frac(ranges: list[tuple[int, int]]) -> F.Column:
        def in_ranges(c):
            cp = F.ascii(c)
            cond = F.lit(False)
            for lo, hi in ranges:
                cond = cond | ((cp >= lo) & (cp <= hi))
            return cond

        return F.when(n > 0, F.round(F.size(F.filter(chars, in_ranges)) / n, 6)).otherwise(0.0)

    cols = [F.col(id_col), n.cast("long").alias("n_chars")]
    for name, ranges in _SCRIPT_RANGES.items():
        cols.append(frac(ranges).alias(f"frac_{name}"))
    # "other" is classified directly (chars in NO class), not 1 - sum of
    # rounded fractions — the subtraction form cancels to ±0.0 artifacts
    all_ranges = [r for rs in _SCRIPT_RANGES.values() for r in rs]

    def none_of(c):
        cp = F.ascii(c)
        cond = F.lit(False)
        for lo, hi in all_ranges:
            cond = cond | ((cp >= lo) & (cp <= hi))
        return ~cond

    cols.append(
        F.when(n > 0, F.round(F.size(F.filter(chars, none_of)) / n, 6))
        .otherwise(0.0)
        .alias("frac_other")
    )
    return df.select(*cols)


# --------------------------------------------------------------------------
# Suffix-stripping stemmer (Porter step-1 style, engine-portable rules)
# --------------------------------------------------------------------------

def stem(col: Column) -> Column:
    """Light suffix-stripping stemmer (the high-yield Porter step-1
    subset) as a pure CASE expression — deliberately regex-free so the
    rules mean exactly the same thing in any engine an oracle runs on:

    1. ``-sses`` → ``-ss``;  2. ``-ies`` → ``-i``;
    3. ``-s`` dropped unless the word ends ``-ss``/``-us``;
    4. ``-ing`` dropped when len > 5;  5. ``-ed`` dropped when len > 4.

    Rules apply once, in order, first match wins (no iteration) — enough
    to fold plural/gerund/past families for token statistics; not a
    linguistics claim.
    """
    ln = F.length(col)

    def drop_last(k: int) -> Column:
        return col.substr(F.lit(1), ln - k)

    return (
        F.when(col.endswith("sses"), drop_last(2))
        .when(col.endswith("ies"), drop_last(2))
        .when(
            col.endswith("s") & ~col.endswith("ss") & ~col.endswith("us"),
            drop_last(1),
        )
        .when(col.endswith("ing") & (ln > 5), drop_last(3))
        .when(col.endswith("ed") & (ln > 4), drop_last(2))
        .otherwise(col)
    )


def stemmed_token_counts(
    df: DataFrame, text_col: str = "text", top_n: int | None = None
) -> DataFrame:
    """Corpus token frequencies AFTER suffix stripping: tokenize, apply
    :func:`stem` inside an array ``transform`` (still codegen — the CASE
    expression inlines), explode, count. Folds inflected families
    (``query/queries``, ``sort/sorted/sorting``) into one row, which is
    what vocabulary-coverage and topic-drift audits actually want to see.
    One groupBy with map-side partial aggregation; optionally top-``n`` by
    (count desc, stem) as a single TakeOrderedAndProject.
    """
    toks = tokens(F.col(text_col))
    stemmed = F.transform(toks, lambda t: stem(t))
    out = (
        df.select(F.explode(stemmed).alias("stem_tok"))
        .groupBy("stem_tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    if top_n is not None:
        out = out.orderBy(F.col("n").desc(), F.col("stem_tok")).limit(top_n)
    return out


# --------------------------------------------------------------------------
# Markup stripping: the web-corpus text-extraction cleanup stage
# --------------------------------------------------------------------------

_HTML_ENTITIES: list[tuple[str, str]] = [
    # order matters: &amp; LAST or it would double-decode &amp;lt;
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


def strip_markup(col: Column) -> Column:
    """Strip HTML/XML markup from a text column — the standard
    web-corpus extraction cleanup: drop <script>/<style> blocks WITH
    their contents, remove remaining tags, decode the six ubiquitous
    entities, collapse whitespace runs, trim. Pure regexp_replace/replace
    chain (RE2-safe patterns: no backrefs, no lookaround), so it runs in
    whole-stage codegen and replicates verbatim in any regex-capable
    oracle engine."""
    out = F.regexp_replace(col, r"(?is)<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"<[^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def with_stripped_markup(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Column form of :func:`strip_markup` plus the audit counts a
    pipeline gate wants: stripped length and the markup fraction
    (1 - clean/raw length), 4dp."""
    clean = strip_markup(F.col(text_col))
    raw_len = F.length(text_col)
    return df.withColumn(out_col, clean).withColumn(
        "markup_frac",
        F.when(
            raw_len > 0,
            F.round(1.0 - F.length(out_col) / raw_len, 4),
        ).otherwise(0.0),
    )


# Compact English stopword set for RAKE phrase boundaries (function words
# only — RAKE's quality hinges on boundaries, not coverage).
RAKE_STOPWORDS_EN = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for", "with",
    "is", "are", "was", "were", "be", "been", "at", "by", "from", "as",
    "it", "this", "that", "these", "those", "not", "but", "if", "then",
)


def rake_keyphrases(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = RAKE_STOPWORDS_EN,
    top: int | None = 20,
    max_phrase_len: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs; each word scores degree/frequency
    over the phrase co-occurrence graph; a phrase scores the sum of its
    member word scores. Returns corpus-level ``(phrase, n_occurrences,
    score)``, optionally top-N by (score desc, phrase) as one
    TakeOrderedAndProject.

    Shape: tokens explode once with positions; ``phrase_id`` is a
    cumulative stopword count per doc (one window sort per doc); word
    stats are a bounded-vocab aggregate whose result broadcasts back onto
    member rows. Per-word scores round to 8dp and sum as exact decimals —
    phrase scores are engine-order-independent. Phrases longer than
    ``max_phrase_len`` are dropped (RAKE convention: long runs are junk).
    """
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    toks = tokens(F.lower(F.col(text_col)))
    base = (
        df.select(F.col(id_col).alias("__id"), F.posexplode(toks))
        .withColumnRenamed("pos", "__pos")
        .withColumnRenamed("col", "__w")
        .withColumn("__is_stop", F.array_contains(stop_arr, F.col("__w")))
    )
    w_cum = (
        Window.partitionBy("__id")
        .orderBy("__pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    members = (
        base.withColumn("__pid", F.sum(F.col("__is_stop").cast("int")).over(w_cum))
        .where(~F.col("__is_stop"))
        .select("__id", "__pid", "__pos", "__w")
    )
    phrases = (
        members.groupBy("__id", "__pid")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos"), F.col("__w")))
                    ),
                    lambda s: s["__w"],
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).alias("__plen"),
        )
        .where(F.col("__plen") <= max_phrase_len)
    )
    scored_members = members.join(phrases, ["__id", "__pid"]).select(
        "__id", "__pid", "__w", "__plen"
    )
    word_stats = scored_members.groupBy("__w").agg(
        F.count(F.lit(1)).alias("__freq"),
        F.sum("__plen").alias("__deg"),
    )
    word_score = F.round(
        F.col("__deg").cast("double") / F.col("__freq").cast("double"), 8
    ).cast("decimal(28,8)")
    phrase_scores = (
        scored_members.join(F.broadcast(word_stats.withColumn("__ws", word_score)), "__w")
        .groupBy("__id", "__pid")
        .agg(F.sum("__ws").alias("__score"))
    )
    out = (
        phrases.join(phrase_scores, ["__id", "__pid"])
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.round(F.max("__score").cast("double"), round_to).alias("score"),
        )
    )
    if top is not None:
        out = out.orderBy(F.col("score").desc(), F.col("phrase").asc()).limit(top)
    return out


def vocabulary_drift(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    round_to: int = 6,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Per-group vocabulary drift: Jensen-Shannon divergence (log2, so
    JSD ∈ [0,1]) between each group's unigram distribution and the WHOLE
    corpus's — the standard corpus-mix monitor (a source whose token
    distribution drifts from the blend shows up as a rising JSD; the
    symmetric, always-finite alternative to KL when a token is absent on
    one side).

    Exact + engine-stable arithmetic: token counts are exact integers;
    each token's JSD contribution is computed in ONE fixed double
    expression, rounded to 12dp and DECIMAL-summed per group (summation
    order cannot change the result). Tokens absent from a group
    contribute the corpus-side half-term (p=0). Shape: one token explode
    + one (group, token) count shuffle; everything after is
    vocabulary-bounded (corpus token totals broadcast into the
    group × vocab frame).

    Returns ``(group_col, n_tokens, vocab, jsd)``.
    """
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    tok = df.select(F.col(group_col).alias("__g"), F.explode(toks).alias("__t"))
    # ONE corpus pass: the (group, token) counts are persisted (vocabulary-
    # bounded — groups × distinct tokens rows), and every later relation
    # (group totals, corpus totals, the scalar N) derives from the cache.
    # Lifetime is caller-scoped: pass a CacheScope to unpersist after the
    # output is materialized (long-lived sessions would otherwise leak one
    # vocabulary-sized cache per call).
    gt = persist_in(scope, tok.groupBy("__g", "__t").agg(F.count(F.lit(1)).alias("__c")))
    g_tot = gt.groupBy("__g").agg(
        F.sum("__c").alias("__gn"), F.count(F.lit(1)).alias("__vocab_g")
    )
    t_tot = gt.groupBy("__t").agg(F.sum("__c").alias("__tc"))
    corpus_n = gt.agg(F.sum("__c")).collect()[0][0]
    # group × corpus-vocab frame: every group scores every corpus token
    frame = (
        g_tot.crossJoin(F.broadcast(t_tot))
        .join(gt, ["__g", "__t"], "left")
        .na.fill({"__c": 0})
    )
    p = F.col("__c").cast("double") / F.col("__gn").cast("double")
    q = F.col("__tc").cast("double") / F.lit(float(corpus_n))
    m = (p + q) / F.lit(2.0)
    ln2 = 0.6931471805599453
    term_p = F.when(
        F.col("__c") > 0, p * (F.log(p / m) / F.lit(ln2))
    ).otherwise(F.lit(0.0))
    term_q = q * (F.log(q / m) / F.lit(ln2))
    contrib = F.round((term_p + term_q) / F.lit(2.0), 12).cast("decimal(28,12)")
    out = (
        frame.withColumn("__j", contrib)
        .groupBy("__g")
        .agg(
            F.max("__gn").cast("long").alias("n_tokens"),
            F.max("__vocab_g").cast("long").alias("vocab"),
            F.round(F.sum("__j").cast("double"), round_to).alias("jsd"),
        )
        .withColumnRenamed("__g", group_col)
    )
    return out


def ngram_novelty(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    round_to: int = 4,
) -> DataFrame:
    """Per-document n-gram NOVELTY against everything that came before it
    in ``id_col`` order: the fraction of the doc's distinct word
    ``n``-grams whose FIRST corpus occurrence is this document — the
    memorization/staleness signal (novelty → 0 as a crawl re-collects
    the same content; duplicate-heavy shards sink first).

    Shape: one (gram → min id) aggregate + one per-doc ratio — the
    "first occurrence" is a plain MIN over the exploded gram relation,
    never a sequential scan, so doc order costs nothing extra. Docs with
    fewer than ``n`` tokens emit no grams and drop out.

    Returns ``(id_col, n_grams, n_novel, novelty)``.
    """
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    grams = (
        df.select(
            F.col(id_col).alias("__id"),
            toks.alias("__tk"),
        )
        # Guard BEFORE generating positions: sequence(0, size-n) with a
        # negative upper bound is DESCENDING in Spark ([0, -1]), so clamping
        # the bound (the old greatest(size-n, -1)) still emitted one
        # truncated gram for short/empty docs. Docs with < n tokens must
        # emit no grams at all (matches the DuckDB oracle's end-exclusive
        # range).
        .where(F.size("__tk") >= n)
        .select(
            "__id",
            F.explode(
                F.sequence(F.lit(0), F.size("__tk") - n)
            ).alias("__i"),
            F.col("__tk"),
        )
        .select(
            "__id",
            F.array_join(
                F.slice("__tk", F.lit(1) + F.col("__i"), n), " "
            ).alias("__g"),
        )
        .distinct()
    )
    first = grams.groupBy("__g").agg(F.min("__id").alias("__first"))
    per_doc = (
        grams.join(first, "__g")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("__first") == F.col("__id"), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
    )
    return per_doc.select(
        F.col("__id").alias(id_col),
        "n_grams",
        "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_grams").cast("double"),
            round_to,
        ).alias("novelty"),
    )


def vocab_growth(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bucket_size: int = 100,
    round_to: int = 4,
) -> DataFrame:
    """Heaps'-law vocabulary growth curve: bucket documents by
    ``floor(id / bucket_size)`` in id order and report, per bucket, the
    number of NEW token types (first corpus occurrence falls in the
    bucket), the running cumulative vocabulary, and total token volume —
    the diminishing-returns diagnostic for corpus growth (a crawl whose
    new-type curve flattens early is re-collecting itself).

    Shape: token explode → (type → min id) aggregate → one tiny
    per-bucket roll-up + a cumulative window over the handful of bucket
    rows. Returns ``(bucket, n_tokens, new_types, cum_vocab)``.
    """
    from pyspark.sql import Window

    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    bucket = F.floor(F.col("__id") / F.lit(int(bucket_size))).cast("long")
    tok = df.select(
        F.col(id_col).alias("__id"), F.explode(toks).alias("__t")
    )
    vol = tok.withColumn("__b", bucket).groupBy("__b").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    first = tok.groupBy("__t").agg(F.min("__id").alias("__id"))
    news = first.withColumn("__b", bucket).groupBy("__b").agg(
        F.count(F.lit(1)).cast("long").alias("new_types")
    )
    w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    return (
        vol.join(news, "__b", "left")
        .na.fill({"new_types": 0})
        .withColumn("cum_vocab", F.sum("new_types").over(w).cast("long"))
        .select(
            F.col("__b").alias("bucket"), "n_tokens", "new_types", "cum_vocab"
        )
    )


def keyword_hits(
    df: DataFrame,
    terms: Sequence[str],
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Multi-term keyword screening — the policy/blocklist stage of a
    content pipeline: per document, the total number of word-boundary
    matches across ``terms`` and a flagged bit. Pure JVM regexp counting
    (one ``regexp_count`` per term, summed as a column expression — no
    UDF, no explode); term lists beyond a few hundred should move to the
    n-gram hash door (:func:`~.dedup.contamination_flags`) instead.

    Returns ``(id_col, n_hits, flagged)`` for every input row.
    """
    lowered = F.lower(F.col(text_col))
    total = F.lit(0)
    for t in terms:
        total = total + F.regexp_count(lowered, F.lit(rf"\b{t}\b"))
    return df.select(
        F.col(id_col),
        total.cast("long").alias("n_hits"),
        (total > 0).alias("flagged"),
    )


def template_col(text_col) -> Column:
    """Slot-normalized template of a text column — the shape that
    survives when the variable parts of machine-generated spam are
    masked out: URLs → ``<url>``, emails → ``<email>``, long hex runs →
    ``<hex>``, digit runs → ``0``, whitespace runs collapsed. Two pages
    with different prize codes but the same boilerplate normalize to the
    SAME template string.

    Pure regexp expressions (whole-stage codegen, map-side). Character
    classes are written explicitly (``[ \\t\\n\\r]`` instead of ``\\s``)
    because Java's ``\\s`` includes vertical tab while RE2's does not —
    the explicit class keeps the SQL oracle byte-identical.

    Normalization order matters and is part of the contract: URLs before
    emails (a URL can embed ``@``), both before hex/digit masking (so
    hosts aren't mangled first), whitespace collapse last.
    """
    t = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    t = F.regexp_replace(t, r"https?://[^ \t\n\r]+", "<url>")
    t = F.regexp_replace(t, r"[a-z0-9._%+-]+@[a-z0-9.-]+", "<email>")
    t = F.regexp_replace(t, r"\b[0-9a-f]{8,}\b", "<hex>")
    t = F.regexp_replace(t, r"[0-9]+", "0")
    t = F.regexp_replace(t, r"[ \t\n\r]+", " ")
    return F.trim(t)


def template_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document template fingerprint: ``template_hash`` (md5 of the
    slot-normalized template) + ``raw_hash`` (md5 of the raw text) +
    the template length. Map-side only — zero shuffles; feed it to
    :func:`template_clusters` for the corpus-level rollup."""
    tpl = template_col(text_col)
    return df.select(
        F.col(id_col),
        F.md5(tpl).alias("template_hash"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("raw_hash"),
        F.length(tpl).alias("template_len"),
    )


def template_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 5,
    min_template_len: int = 20,
) -> DataFrame:
    """Templated-spam clusters — documents that are DIFFERENT byte-wise
    but identical after slot masking (SEO farms, listing pages, receipt
    spam; the C4/RefinedWeb failure mode exact dedup can't see). One
    hash-shuffle on ``template_hash``; at 100 TB this is the same plan
    as exact dedup, on a 32-hex key.

    A cluster is flagged ``is_spam`` when it has ≥ ``min_docs`` members,
    MORE than one distinct raw text (pure exact-dup clusters belong to
    exact dedup, not here), and a template of at least
    ``min_template_len`` chars (trivial templates like ``0`` would glue
    unrelated short docs together).

    Returns one row per template: ``(template_hash, n_docs,
    n_distinct_raw, slot_variability, template_len, min_id, is_spam)``
    with ``slot_variability = n_distinct_raw / n_docs`` rounded to 6dp.
    """
    fp = template_fingerprint(df, id_col=id_col, text_col=text_col)
    agg = fp.groupBy("template_hash").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("raw_hash").alias("n_distinct_raw"),
        F.first("template_len").alias("template_len"),
        F.min(id_col).alias("min_id"),
    )
    return agg.select(
        "template_hash",
        "n_docs",
        "n_distinct_raw",
        F.round(F.col("n_distinct_raw") / F.col("n_docs"), 6).alias(
            "slot_variability"
        ),
        "template_len",
        "min_id",
        (
            (F.col("n_docs") >= min_docs)
            & (F.col("n_distinct_raw") > 1)
            & (F.col("template_len") >= min_template_len)
        ).alias("is_spam"),
    )


def readability_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per document — the
    classic readability gate (a corpus whose mean FK grade is 2 is
    probably listicles; 19 is probably OCR noise). Syllables are
    approximated as vowel-group runs (``[aeiouy]+``, minimum 1 per
    word) — the standard dictionary-free heuristic.

    Pure expressions: one ``regexp_extract_all`` tokenization, a
    higher-order aggregate for syllables, no shuffle at all (map-side,
    whole-stage codegen). Scores are NULL for wordless docs (the ANSI
    divide-by-zero guard doubles as the semantic: no prose, no grade).

    Returns ``(id, n_words, n_sentences, n_syllables, flesch,
    fk_grade)`` with scores rounded to 4dp.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
    n_words = F.size(toks)
    n_sent = F.coalesce(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), 0)),
        F.lit(0),
    )
    n_syll = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, w: acc
        + F.greatest(
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)), F.lit(1)
        ),
    )
    out = df.select(
        F.col(id_col),
        F.coalesce(n_words, F.lit(0)).alias("n_words"),
        n_sent.alias("n_sentences"),
        F.coalesce(n_syll, F.lit(0)).alias("n_syllables"),
    )
    wps = F.col("n_words") / F.greatest(F.col("n_sentences"), F.lit(1))
    spw = F.col("n_syllables") / F.col("n_words")
    guard = F.col("n_words") > 0
    return out.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(
            guard, F.round(206.835 - 1.015 * wps - 84.6 * spw, 4)
        ).alias("flesch"),
        F.when(guard, F.round(0.39 * wps + 11.8 * spw - 15.59, 4)).alias(
            "fk_grade"
        ),
    )


def c4_line_filters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_lines_kept: int = 3,
    out_col: str = "text_clean",
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits
    of Transfer Learning…" §2.2) as one pure-expression pass (round
    10) — the canonical web-corpus line-level scrub that precedes every
    quality/dedup stage:

    - keep only lines ending in a terminal punctuation mark
      (``. ! ? "``, optionally followed by a closing quote),
    - keep only lines with ≥ ``min_words_per_line`` words,
    - drop lines containing the word "javascript" (case-insensitive),
    - drop the whole PAGE when it contains ``{`` or the phrase
      "lorem ipsum" (case-insensitive),
    - drop the page when fewer than ``min_lines_kept`` lines survive
      (the paper's ≥-3-sentences floor; after the terminal-punctuation
      filter, kept lines are the sentence proxy — documented
      divergence: C4 counts sentences, we count surviving lines).

    Everything is split / filter / regexp Column expressions in
    whole-stage codegen — zero shuffles, linear at 100 TB; compose
    BEFORE :func:`~.pipeline.prepare_corpus`'s gates (an opted-out or
    junk page should not even be line-scanned is the one exception —
    compliance doors still run first in the pipeline).

    Returns surviving pages:
    ``(id_col, out_col, n_lines_in, n_lines_kept)``.
    """
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n")
    word_count = lambda ln: F.size(  # noqa: E731
        F.filter(F.split(F.trim(ln), r"\s+"), lambda t: t != "")
    )
    keep = lambda ln: (  # noqa: E731
        ln.rlike(r'[.!?"][\)"\']*\s*$')
        & (word_count(ln) >= F.lit(int(min_words_per_line)))
        & ~F.lower(ln).contains("javascript")
    )
    kept = F.filter(lines, keep)
    base = df.select(
        F.col(id_col),
        F.col(text_col),
        F.size(lines).alias("n_lines_in"),
        F.size(kept).alias("n_lines_kept"),
        F.array_join(kept, "\n").alias(out_col),
    )
    page_ok = (
        ~F.col(text_col).contains("{")
        & ~F.lower(F.col(text_col)).contains("lorem ipsum")
        & (F.col("n_lines_kept") >= F.lit(int(min_lines_kept)))
    )
    return base.where(page_ok).select(
        id_col, out_col, "n_lines_in", "n_lines_kept"
    )


def code_structure_stats(
    df: DataFrame,
    text_col: str = "text",
    score_threshold: float = 0.3,
    round_to: int = 6,
) -> DataFrame:
    """Code/structure detection for source routing (round 11 — the
    StarCoder/pretraining-mix question "is this document code?",
    answered by STRUCTURE, not a model): per document —

    - ``n_lines``, ``fence_blocks`` (paired \\`\\`\\` markers),
    - ``indent_ratio`` (lines starting with 4+ spaces or a tab),
    - ``semicolon_ratio`` (lines ending in ``;``, ``{`` or ``}``),
    - ``symbol_density`` (``{}[]();=<>`` chars per char),
    - ``camel_tokens`` (lowerCamelCase identifiers),
    - ``n_urls``,

    combined into ``code_score = 0.4·min(1, fences) + 0.25·indent_ratio
    + 0.2·semicolon_ratio + 0.15·min(1, 10·symbol_density)`` and an
    ``is_code`` flag at ``score_threshold``. Pure JVM expressions (one
    line split + regexp counts — whole-stage codegen, no UDF, no
    shuffle); the weights are a frozen heuristic, not a trained model —
    route ``is_code`` docs to a code-aware pipeline rather than
    trusting the score as a probability.

    Returns ``df`` + the seven feature columns + ``code_score`` +
    ``is_code``.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    nz = F.greatest(n_lines, F.lit(1)).cast("double")
    fence_blocks = (F.regexp_count(t, F.lit("```")) / 2).cast("int")
    indented = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"^(    |\t)"))
    )
    semi_eol = F.size(
        # explicit [ \t\r] class: Spark's \s includes \x0B, RE2's does
        # not (the house byte-parity rule)
        F.filter(lines, lambda ln: ln.rlike(r"[;{}][ \t\r]*$") & (F.trim(ln) != ""))
    )
    symbols = F.length(t) - F.length(
        F.regexp_replace(t, r"[{}\[\]();=<>]", "")
    )
    camel = F.regexp_count(t, F.lit(r"\b[a-z]+[A-Z][A-Za-z0-9]*"))
    urls = F.regexp_count(t, F.lit(r"https?://"))
    dens = symbols.cast("double") / F.greatest(F.length(t), F.lit(1)).cast(
        "double"
    )
    score = (
        0.4 * F.least(F.lit(1.0), fence_blocks.cast("double"))
        + 0.25 * (indented.cast("double") / nz)
        + 0.2 * (semi_eol.cast("double") / nz)
        + 0.15 * F.least(F.lit(1.0), 10.0 * dens)
    )
    return (
        df.withColumn("n_lines", n_lines)
        .withColumn("fence_blocks", fence_blocks)
        .withColumn("indent_ratio", F.round(indented / nz, round_to))
        .withColumn("semicolon_ratio", F.round(semi_eol / nz, round_to))
        .withColumn("symbol_density", F.round(dens, round_to))
        .withColumn("camel_tokens", camel.cast("long"))
        .withColumn("n_urls", urls.cast("long"))
        .withColumn("code_score", F.round(score, round_to))
        .withColumn("is_code", score >= F.lit(float(score_threshold)))
    )
