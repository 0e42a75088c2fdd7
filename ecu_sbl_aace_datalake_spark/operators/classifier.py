"""Trained quality-classifier scoring (CCNet/DCLM-style distillation).

LLM-data-pipeline extension (SURVEY.md §2.13; the reference engine has no
model-based scoring). The production pattern: a cheap heuristic (or a
trusted reference corpus) supplies SEED LABELS, a linear model over hashed
bag-of-words + a few dense features is trained to distill them, and the
trained weights then score the full corpus — the scoring pass is pure
column expressions, so it runs JVM-side at corpus scale.

Scale design (100 TB posture):

- **Features are sparse and bounded**: hashed BOW (``dim`` buckets via the
  portable md5 hash used across this repo) + 2 dense features
  (log-length, lexical diversity) + bias. The feature relation is
  (doc, idx, value) — one explode + one aggregate; no Python.
- **Training is full-batch gradient descent with aggregate-only steps**:
  each epoch computes per-doc logits (one groupBy doc), joins labels,
  and reduces the gradient per feature index (one groupBy idx) — the
  only driver materialization is the (dim+3)-row gradient itself, the
  same bounded-collect contract as kmeans_fit's centroids. Deterministic:
  zero init, fixed epochs, fixed learning rate, no sampling.
- **Scoring with FIXED weights is oracle-checkable**: contributions are
  rounded to 9dp and summed as DECIMAL (order-insensitive exact sum), the
  logit is rounded before the sigmoid, and the final score uses the
  repo's +1e-9-nudge-before-ROUND pattern — bit-stable across engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_DIM_DEFAULT = 256

#: FIXED scoring weights: ``train_logreg(sf0.01 documents, label =
#: quality_score >= 0.75, dim=256, epochs=16, lr=1.0)`` — the
#: heuristic-distillation seed (CCNet-style). Training is deterministic,
#: so tests/test_classifier.py re-derives this exactly. AUC vs the seed
#: labels on the training corpus: 0.999.
WEIGHTS_QUALITY_V1: list[float] = [
    0.0, 0.0, 0.0, 0.0, 0.030019, 0.0, 0.0, 0.031631,
    0.0, 0.028687, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.044444, 0.0, 0.0, 0.0, 0.0, 0.0, 0.025408,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.040195, 0.0, 0.026491, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.022904, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.047773, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.013257, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.013956, 0.009048, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.037659, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.020907, 0.015976, 0.0, 0.0, 0.012634, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.041462, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.021867,
    0.016853, 0.0, 0.0, 0.0, 0.0, 0.0, 0.008064, 0.0,
    0.0, 0.00829, 0.014113, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.02123, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.020256, 0.0, 0.0, 0.0, 0.0, 0.020523,
    0.040754, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.015357, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.026876, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.028445, 0.045271, 0.0, 0.035136, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    -0.371698, 1.408177, 0.785486,
]


def _bucket(col, dim: int):
    """Portable non-negative hash bucket: 60-bit md5 prefix mod dim —
    identical in Spark and DuckDB (see driver_queries hash-parity note)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
        % F.lit(int(dim))
    )


def _bucket_xx(col, dim: int):
    """xxhash64 bucket — ~3x cheaper than the md5 path (no hex
    round-trip, native 64-bit mix; the LANG_NB_V2 lever, VERDICT r9
    item #2). For a power-of-two ``dim`` the bucket is the hash's low
    bits (bitwise AND — identical on the signed long and the unsigned
    value, so the DuckDB replica takes ``h % dim`` on UHUGEINT); other
    dims use pmod. Oracle parity: Spark's xxhash64 is bit-exact
    reference XXH64 with seed 42 over the UTF-8 bytes (verified against
    a pure-Python reference in tests/test_classifier.py), and
    driver_queries._sql_xxh64 replays it in DuckDB SQL for short
    inputs."""
    d = int(dim)
    h = F.xxhash64(col)
    if d & (d - 1) == 0:
        return h.bitwiseAND(F.lit(d - 1))
    return F.pmod(h, F.lit(d))


def doc_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = HASH_DIM_DEFAULT,
) -> DataFrame:
    """Sparse feature relation (id, idx, value):

    - idx 0..dim-1: hashed-BOW term frequency (count / n_words)
    - idx dim:      ln(n_words + 1), rounded 6dp (+1e-9 nudge)
    - idx dim+1:    lexical diversity = n_distinct / n_words
    - idx dim+2:    bias (1.0)

    Docs with no words get only the bias feature (their dense features
    are undefined).
    """
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x.isNotNull() & (x != "")
    )
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).cast("double").alias("__nw"),
        F.size(F.array_distinct(toks)).cast("double").alias("__nd"),
    )
    bow = (
        base.select(id_col, "__nw", F.explode("__toks").alias("__w"))
        .groupBy(id_col, "__nw", _bucket(F.col("__w"), dim).alias("idx"))
        .agg(F.count(F.lit(1)).cast("double").alias("__cnt"))
        .select(
            id_col,
            F.col("idx").cast("int").alias("idx"),
            (F.col("__cnt") / F.col("__nw")).alias("value"),
        )
    )
    dense = base.select(
        F.col(id_col),
        F.when(
            F.col("__nw") > 0,
            F.array(
                F.round(F.log(F.col("__nw") + 1.0) + F.lit(1e-9), 6),
                F.col("__nd") / F.col("__nw"),
                F.lit(1.0),
            ),
        )
        .otherwise(F.array(F.lit(None), F.lit(None), F.lit(1.0)))
        .alias("__dense"),
    ).select(
        id_col,
        F.posexplode("__dense").alias("__pos", "value"),
    ).where(F.col("value").isNotNull()).select(
        id_col,
        (F.col("__pos") + F.lit(int(dim))).cast("int").alias("idx"),
        F.col("value").cast("double").alias("value"),
    )
    return bow.unionByName(dense)


def _logits(feats: DataFrame, weights: Sequence[float], id_col: str):
    """Per-doc logit from a weight literal: contributions rounded 9dp,
    DECIMAL-summed (order-insensitive exact), cast back to double."""
    w_lit = F.array(*[F.lit(float(w)) for w in weights])
    contrib = F.round(
        F.col("value") * F.element_at(w_lit, F.col("idx") + 1), 9
    ).cast("decimal(28,9)")
    return feats.groupBy(id_col).agg(
        F.sum(contrib).cast("double").alias("__z")
    )


def train_logreg(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = HASH_DIM_DEFAULT,
    epochs: int = 16,
    lr: float = 1.0,
    l2: float = 0.0,
) -> list[float]:
    """Full-batch logistic regression on :func:`doc_features`.

    ``label_col`` must be 0/1. Each epoch is two aggregates (per-doc
    logit, per-idx gradient); the only collect is the (dim+3)-row
    gradient. Deterministic for fixed inputs and hyperparameters.
    """
    feats = doc_features(df, id_col, text_col, dim).persist()
    labels = df.select(
        F.col(id_col), F.col(label_col).cast("double").alias("__y")
    )
    n = labels.count()
    weights = [0.0] * (dim + 3)
    for _ in range(int(epochs)):
        z = _logits(feats, weights, id_col)
        resid = (
            z.join(labels, id_col)
            .select(
                F.col(id_col),
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__z")))
                    - F.col("__y")
                ).alias("__r"),
            )
        )
        # decimal-summed gradient (rounded per-term): order-insensitive,
        # so training is bit-deterministic across sessions/partitionings
        grad_rows = (
            feats.join(resid, id_col)
            .groupBy("idx")
            .agg(
                (
                    F.sum(
                        F.round(F.col("value") * F.col("__r"), 12).cast(
                            "decimal(28,12)"
                        )
                    ).cast("double")
                    / F.lit(float(n))
                ).alias("g")
            )
            .collect()
        )
        grad = {r["idx"]: r["g"] for r in grad_rows}
        weights = [
            w - lr * (grad.get(i, 0.0) + l2 * w)
            for i, w in enumerate(weights)
        ]
    feats.unpersist()
    return [round(w, 6) for w in weights]


def classifier_scores(
    df: DataFrame,
    weights: Sequence[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = HASH_DIM_DEFAULT,
    out_col: str = "clf_score",
) -> DataFrame:
    """Score every document with FIXED weights: sigmoid(w·x), 6dp.

    Pure column expressions end to end (hash, explode, aggregate, literal
    array lookup) — whole-stage codegen, no Python; this is the pass that
    runs over 100 TB. Docs with no words score sigmoid(bias weight).
    """
    feats = doc_features(df, id_col, text_col, dim)
    z = _logits(feats, weights, id_col)
    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.round(F.col("__z"), 6)))
        + F.lit(1e-9),
        6,
    )
    return (
        df.select(id_col)
        .join(z, id_col, "left")
        .select(F.col(id_col), score.alias(out_col))
    )


# ---------------------------------------------------------------------------
# Trained language ID: hashed char-n-gram multinomial Naive Bayes
# (round 6, VERDICT r05 item #4 — replaces the marker-token heuristic as
# the trained path; textstats.with_lang_id stays the zero-dependency
# fallback)
# ---------------------------------------------------------------------------

LANG_NGRAM_N = 3
LANG_HASH_DIM = 128


def _char_ngram_buckets(text_col: str, n: int, dim: int, algo: str = "md5"):
    """Array of hashed char-n-gram buckets for one row — JVM expressions
    only (substr windows + the portable md5 bucket, or the ~3x-cheaper
    xxhash64 bucket with ``algo="xx"``). Spark's sequence()
    DESCENDS when stop < start, so short texts are guarded to an empty
    array (the oracle's range() is empty there by construction)."""
    t = F.col(text_col)
    grams = F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - n + 1),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bucket = _bucket_xx if algo == "xx" else _bucket
    return F.transform(grams, lambda g: bucket(g, dim).cast("int"))


def train_lang_nb(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    dim: int = LANG_HASH_DIM,
    n: int = LANG_NGRAM_N,
    algo: str = "md5",
) -> dict:
    """Train a multinomial Naive Bayes language identifier over hashed
    char-n-gram counts — the classic fastText-free langid baseline.

    Training is ONE aggregate: counts per (lang, bucket) plus per-lang
    doc counts; the collected table is langs × dim — bounded, same
    driver-safe contract as kmeans_fit's centroids. Log-probabilities are
    computed driver-side and ROUNDED to 6dp, so the frozen model is a
    pure literal table and scoring needs no transcendental calls at query
    time (the scoring sum is exact decimal — oracle-replicable).

    Laplace smoothing alpha=1. Returns ``{"langs": [...], "n": n,
    "dim": dim, "ell": 20, "prior": [...], "w": [[...]]}`` with langs
    sorted ascending (ties at scoring break to the FIRST lang in this
    order). ``ell`` is the EFFECTIVE LENGTH for length-normalized
    scoring (see :func:`lang_id_nb`): raw NB evidence grows linearly in
    document length, so on label-independent text the accumulated
    n-gram noise of a 300-gram document swamps the class prior and NB
    underperforms majority-class; normalizing the likelihood to a fixed
    ``ell`` grams keeps per-document evidence comparable and lets the
    prior win exactly when the evidence IS noise — the standard langid
    calibration. Real cross-language trigram ratios are ~1-3 nats/gram,
    so 20 effective grams still dominate any prior gap.
    """
    grams = df.select(
        F.col(lang_col).alias("__lang"),
        F.explode(_char_ngram_buckets(text_col, n, dim, algo)).alias("__b"),
    )
    counts = (
        grams.groupBy("__lang", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    doc_counts = {
        r["__lang"]: r["__n"]
        for r in df.groupBy(F.col(lang_col).alias("__lang"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }
    import math

    langs = sorted(doc_counts)
    total_docs = sum(doc_counts.values())
    by_lang: dict[str, dict[int, int]] = {lang: {} for lang in langs}
    for r in counts:
        by_lang[r["__lang"]][r["__b"]] = r["__c"]
    w = []
    for lang in langs:
        tot = sum(by_lang[lang].values())
        w.append(
            [
                round(math.log((by_lang[lang].get(b, 0) + 1) / (tot + dim)), 6)
                for b in range(dim)
            ]
        )
    prior = [round(math.log(doc_counts[lang] / total_docs), 6) for lang in langs]
    return {
        "langs": langs,
        "n": n,
        "dim": dim,
        "ell": 20,
        "algo": algo,
        "prior": prior,
        "w": w,
    }


def lang_id_nb(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "lang_pred",
) -> DataFrame:
    """Score every document with a FIXED NB model, length-normalized:
    the per-lang decision value is ``prior_l + (ell / T) * S_l`` where
    ``S_l = sum(count_b * logprob[lang][b])`` and ``T`` is the document's
    total gram count — equivalently (multiplying through by the positive
    ``T``, which keeps the argmax and stays DIVISION-FREE for exact
    decimal arithmetic) ``T * prior_l + ell * S_l``. Argmax ties break to
    the first lang in the model's sorted order; empty texts fall back to
    the max-prior lang.

    Pure column expressions at corpus scale: one n-gram explode, then
    ONE per-doc aggregate summing each language's literal-array weight
    lookup directly over the gram stream as exact LONG micro-units —
    the 6dp weight literals convert exactly to integers x 1e-6, so
    every sum is exact integer arithmetic (round 10: replaces the
    two-aggregate decimal(32,6) plan — one shuffle instead of two, and
    long sums instead of decimal, which together were the scoring
    bottleneck once V2 cut the hashing cost). The argmax never depends
    on float summation order; a SQL oracle replays it bit-for-bit in
    BIGINT (the oracle may keep the per-bucket pre-count — ``sum_grams
    w[b]`` == ``sum_buckets cnt·w[b]`` exactly). Overflow bound: the
    decision value is ``T·prior_micro + ell·S_micro`` with
    ``|S_micro| <= T·max|w|·1e6`` — safe in int64 for documents up to
    ~10^9 grams (a 1 GB single document), far past any real corpus row.
    """
    langs, dim, n = model["langs"], int(model["dim"]), int(model["n"])
    ell = int(model.get("ell", 20))
    algo = model.get("algo", "md5")
    grams = df.select(
        F.col(id_col),
        F.explode(_char_ngram_buckets(text_col, n, dim, algo)).alias("__b"),
    )
    score_aggs = [F.count(F.lit(1)).alias("__t")]
    for li, lang in enumerate(langs):
        w_lit = F.array(
            *[
                F.lit(int(round(v * 1_000_000))).cast("long")
                for v in model["w"][li]
            ]
        )
        score_aggs.append(
            F.sum(F.element_at(w_lit, F.col("__b") + 1)).alias(f"__s_{li}")
        )
    scored = grams.groupBy(id_col).agg(*score_aggs)
    decisions = []
    for li, lang in enumerate(langs):
        prior_micro = int(round(model["prior"][li] * 1_000_000))
        val = (
            F.col("__t") * F.lit(prior_micro).cast("long")
            + F.lit(ell).cast("long") * F.col(f"__s_{li}")
        )
        decisions.append(
            F.struct((-val).alias("ns"), F.lit(lang).alias("lang"))
        )
    choice = F.element_at(F.array_sort(F.array(*decisions)), 1)["lang"]
    scored = scored.select(id_col, choice.alias(out_col))
    prior_best = max(
        range(len(langs)), key=lambda i: (model["prior"][i], -i)
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col(out_col), F.lit(langs[prior_best])).alias(out_col),
        )
    )


#: FIXED language-ID model: ``train_lang_nb(sf0.01 documents where
#: md5-bucket(doc_id) % 4 != 0)`` — the deterministic 75% training split;
#: the held-out quarter is the eval set (tests/test_classifier.py
#: re-derives the model and checks trained accuracy >= the marker-token
#: heuristic there). Note the fixtures' text is label-independent by
#: construction, so fixture accuracy is bounded by the class prior —
#: the synthetic-signal test proves the classifier separates REAL
#: languages at 1.0.
LANG_NB_V1: dict = {
    "langs": ['de', 'en', 'es', 'fr', 'zh'],
    "n": 3,
    "dim": 128,
    "ell": 20,
    "algo": "md5",
    "prior": [-1.951287, -0.815633, -2.029758, -2.092937, -1.827234],
    "w": [
        [-7.091326, -4.961112, -6.868183, -5.726085, -4.293029, -7.966795, 
         -4.884885, -4.458239, -4.366747, -3.869122, -5.299567, -7.966795, 
         -3.582271, -5.133581, -4.303233, -6.318136, -7.011283, -4.981113, 
         -5.644407, -4.253223, -5.087596, -4.641759, -5.272168, -5.181784, 
         -4.103962, -4.329209, -4.627473, -4.663578, -7.784473, -4.272928, 
         -4.866703, -4.17807, -4.903404, -5.043633, -6.142246, -6.743019, 
         -4.313543, -6.743019, -6.937175, -4.267965, -4.277915, -3.312834, 
         -7.496791, -5.032938, -6.631794, -4.400083, -5.169513, -4.961112, 
         -3.923744, -7.784473, -4.724202, -3.966761, -3.87245, -5.169513, 
         -5.098896, -7.630323, -4.971063, -6.110497, -5.054444, -7.496791, 
         -4.95126, -4.599499, -3.604971, -4.298118, -7.784473, -5.401845, 
         -7.966795, -7.178337, -4.411447, -4.991265, -5.098896, -7.630323, 
         -4.191738, -4.383276, -7.273648, -5.181784, -6.685861, -6.110497, 
         -6.48519, -6.743019, -4.875752, -5.054444, -4.971063, -3.599882, 
         -4.732046, -5.206785, -4.282928, -4.831301, -4.991265, -4.494828, 
         -4.71642, -7.178337, -4.857734, -4.732046, -6.398179, -6.937175, 
         -4.372226, -4.394449, -4.961112, -4.488636, -5.299567, -5.001522, 
         -5.965315, -6.440738, -4.446334, -6.5805, -4.805548, -5.726085, 
         -6.318136, -3.885873, -5.862661, -6.208937, -4.138153, -9.576233, 
         -4.519987, -7.379008, -6.631794, -5.043633, -4.961112, -7.273648, 
         -3.732688, -4.458239, -6.280396, -4.196335, -4.884885, -4.099769, 
         -4.831301, -6.398179,],
        [-7.236657, -4.951876, -7.001817, -6.018085, -4.338148, -7.818578, 
         -4.994696, -4.38629, -4.290671, -3.783872, -5.089694, -8.054967, 
         -3.640151, -5.128228, -4.298429, -6.209141, -7.467181, -4.931135, 
         -5.872668, -4.192134, -4.951876, -4.499619, -5.023225, -5.107026, 
         -3.938644, -4.372777, -4.849514, -4.699232, -7.671975, -4.197752, 
         -4.860384, -4.239455, -4.937017, -5.03617, -5.942736, -6.91287, 
         -4.331686, -6.91287, -6.58863, -4.346285, -4.40691, -3.321697, 
         -7.929804, -4.954875, -6.702574, -4.413878, -4.997826, -4.809774, 
         -3.953978, -7.718495, -4.764081, -3.946282, -3.938644, -5.107026, 
         -5.023225, -7.074138, -4.982274, -5.880216, -5.093137, -7.32903, 
         -4.970004, -4.696909, -3.640151, -4.408647, -7.430813, -5.609726, 
         -7.504921, -6.755684, -4.435081, -4.720385, -5.103535, -7.395722, 
         -4.254248, -4.462232, -7.671975, -5.160899, -6.558325, -5.967227, 
         -6.252158, -6.891816, -5.05259, -5.114043, -4.8909, -3.635324, 
         -4.703894, -5.124663, -4.306248, -4.718012, -5.000966, -4.384591, 
         -4.841439, -7.025348, -4.74686, -4.825481, -6.380991, -6.652144, 
         -4.326867, -4.367756, -5.007275, -4.595501, -5.706772, -4.957882, 
         -5.895483, -6.811774, -4.326867, -6.737666, -4.865864, -5.865178, 
         -6.241229, -3.997978, -5.73258, -6.702574, -4.152321, -10.763017, 
         -4.585073, -7.236657, -6.528911, -5.076042, -4.830772, -7.504921, 
         -3.712028, -4.33977, -6.432284, -4.200573, -4.913693, -3.995674, 
         -4.991576, -6.54351,],
        [-7.391347, -5.088762, -6.592839, -6.154584, -4.336298, -7.50913, 
         -4.953842, -4.406788, -4.320713, -3.832829, -5.134224, -7.642661, 
         -3.736369, -5.034694, -4.331076, -5.950985, -7.50913, -4.870072, 
         -5.804382, -4.315572, -4.973451, -4.577936, -5.024223, -5.194122, 
         -4.008841, -4.373636, -4.861183, -4.80108, -8.489959, -4.172471, 
         -4.817887, -4.059142, -4.852373, -4.843639, -5.75993, -6.6982, 
         -4.280304, -7.023622, -6.410517, -4.331076, -4.341547, -3.325173, 
         -7.796812, -5.14592, -7.023622, -4.368215, -4.993451, -4.870072, 
         -4.047308, -8.202277, -4.713374, -3.9718, -4.012622, -5.169731, 
         -4.94418, -6.6982, -4.843639, -6.033223, -5.066783, -7.979133, 
         -4.963598, -4.752289, -3.699693, -4.331076, -7.50913, -5.528128, 
         -7.391347, -7.190676, -4.373636, -4.80108, -5.111234, -7.796812, 
         -4.285266, -4.390074, -7.979133, -5.122663, -6.292734, -6.122835, 
         -6.221275, -7.190676, -5.099935, -5.284506, -4.934611, -3.699693, 
         -4.66859, -5.206545, -4.429516, -4.76829, -4.915742, -4.401186, 
         -4.721037, -6.815983, -4.888091, -4.897223, -6.033223, -7.023622, 
         -4.231985, -4.231985, -4.879041, -4.545146, -5.414184, -4.752289, 
         -6.005052, -6.410517, -4.341547, -6.755358, -4.698222, -5.950985, 
         -6.497529, -3.9791, -5.874999, -6.949514, -4.09551, -9.588571, 
         -4.538715, -7.285986, -6.497529, -4.983401, -4.792781, -7.796812, 
         -3.696927, -4.423785, -6.497529, -4.159226, -4.705769, -4.047308, 
         -5.066783, -6.221275,],
        [-8.191463, -5.343651, -6.869707, -5.793568, -4.294554, -7.785998, 
         -4.972587, -4.294554, -4.264551, -3.834754, -4.933367, -7.179862, 
         -3.661555, -5.100421, -4.573811, -6.533235, -7.380533, -4.962637, 
         -6.112022, -4.274453, -5.146941, -4.607944, -5.135106, -5.135106, 
         -4.188686, -4.249881, -4.85037, -4.765573, -7.785998, -4.161657, 
         -4.841559, -4.109697, -4.904929, -4.99279, -5.771095, -7.179862, 
         -4.17508, -6.9387, -6.533235, -4.294554, -4.412971, -3.223387, 
         -7.631847, -5.195731, -7.275172, -4.484007, -4.807073, -4.687408, 
         -3.901004, -7.498316, -4.749444, -3.975639, -3.864025, -5.111849, 
         -4.99279, -7.275172, -4.962637, -5.888878, -5.100421, -7.275172, 
         -4.923797, -4.710223, -3.686113, -4.407273, -6.869707, -5.171038, 
         -7.631847, -6.9387, -4.484007, -4.832825, -5.034463, -7.631847, 
         -4.207119, -4.325484, -7.631847, -5.195731, -6.358882, -5.72761, 
         -6.442263, -6.582025, -4.88641, -5.034463, -4.923797, -3.697224, 
         -4.717945, -5.146941, -4.547319, -4.607944, -4.982638, -4.395974, 
         -4.687408, -7.179862, -4.914318, -4.99279, -6.358882, -6.687386, 
         -4.395974, -4.254747, -4.933367, -4.773736, -5.607465, -4.773736, 
         -6.022409, -6.319661, -4.424466, -6.486715, -4.841559, -6.281921, 
         -6.319661, -3.998028, -5.626514, -6.245553, -4.126719, -9.577757, 
         -4.560478, -7.012808, -6.442263, -4.85037, -4.943028, -7.96832, 
         -3.748812, -4.26949, -6.486715, -4.221171, -5.077948, -4.097118, 
         -4.824167, -6.687386,],
        [-7.25532, -5.18554, -7.335362, -5.849977, -4.431197, -8.210831, 
         -4.893015, -4.302816, -4.310881, -3.76818, -5.032777, -7.623044, 
         -3.597693, -4.952735, -4.364948, -6.082599, -7.25532, -5.075337, 
         -6.209351, -4.369231, -5.075337, -4.573245, -5.049584, -5.195296, 
         -4.080476, -4.352209, -4.661214, -4.684471, -7.874359, -4.294816, 
         -4.885795, -4.178362, -4.952735, -5.008085, -5.693135, -6.775747, 
         -4.331331, -6.824537, -6.775747, -4.236773, -4.335472, -3.28648, 
         -7.623044, -5.18554, -6.775747, -4.30684, -4.857424, -4.69037, 
         -3.991323, -7.740827, -4.922429, -4.006138, -3.893343, -5.024478, 
         -5.128921, -7.335362, -5.016248, -5.869025, -5.18554, -7.517684, 
         -4.893015, -4.720403, -3.689042, -4.360683, -6.987056, -5.438242, 
         -7.422374, -7.335362, -4.373532, -4.92992, -5.075337, -7.181212, 
         -4.24432, -4.327208, -7.740827, -5.049584, -6.264921, -5.928449, 
         -6.209351, -6.323761, -4.983987, -5.245558, -5.075337, -3.656954, 
         -4.655483, -5.195296, -4.404169, -4.644119, -4.836662, -4.48755, 
         -4.757674, -6.987056, -4.92992, -4.843535, -6.013606, -7.04768, 
         -4.310881, -4.364948, -4.952735, -4.562774, -5.586162, -4.983987, 
         -5.777218, -6.775747, -4.422106, -6.488064, -4.816323, -5.645882, 
         -6.209351, -3.849007, -5.888443, -6.323761, -4.189057, -9.820269, 
         -4.655483, -6.87583, -6.729227, -4.960457, -4.976082, -7.517684, 
         -3.73577, -4.390923, -6.354533, -4.178362, -4.871509, -4.027255, 
         -4.960457, -6.488064,],
    ],
}

#: FIXED language-ID model V2 (VERDICT r9 item #2): identical training
#: recipe to LANG_NB_V1 — ``train_lang_nb(sf0.01 documents where
#: md5-bucket(doc_id) % 4 != 0, algo="xx")`` — but the trigram bucket is
#: xxhash64 & 127 instead of the md5 hex round-trip, cutting the
#: per-gram hashing cost ~3x (one native 64-bit mix vs a full MD5 +
#: hex-substring + base conversion). Priors and split are unchanged;
#: the weight table differs because the bucket permutation differs.
#: Provenance re-derived in tests/test_classifier.py; the DuckDB oracle
#: replays the bucket via a bit-exact XXH64(seed=42) SQL replica over
#: the gram's UTF-8 bytes (driver_queries._sql_xxh64_bucket).
LANG_NB_V2: dict = {
    "langs": ['de', 'en', 'es', 'fr', 'zh'],
    "n": 3,
    "dim": 128,
    "ell": 20,
    "algo": "xx",
    "prior": [-1.951287, -0.815633, -2.029758, -2.092937, -1.827234],
    "w": [
        [-4.258113, -4.693431, -7.273648, -4.724202, -5.032938, -3.875789,
         -6.53171, -6.280396, -7.379008, -4.95126, -4.981113, -7.273648,
         -6.743019, -4.042843, -5.401845, -4.440434, -5.965315, -4.552352,
         -4.17807, -4.293029, -7.379008, -6.685861, -7.966795, -6.244028,
         -9.576233, -4.388847, -4.470287, -4.912794, -5.032938, -8.189938,
         -9.576233, -4.884885, -4.303233, -4.981113, -5.011885, -3.76809,
         -5.169513, -4.377736, -5.121885, -6.440738, -5.245499, -3.923744,
         -3.879139, -9.576233, -4.133815, -4.788741, -4.875752, -4.248357,
         -4.912794, -5.076423, -5.219524, -4.233898, -4.822643, -5.076423,
         -4.981113, -6.743019, -4.894101, -5.356725, -4.981113, -6.685861,
         -6.53171, -7.379008, -4.971063, -4.701035, -9.576233, -6.48519,
         -3.906352, -6.743019, -6.244028, -4.95126, -5.313553, -4.866703,
         -4.912794, -4.446334, -3.191038, -6.53171, -6.110497, -4.848845,
         -4.822643, -6.868183, -4.05878, -4.440434, -4.875752, -6.398179,
         -4.263027, -7.178337, -4.912794, -5.133581, -7.784473, -9.576233,
         -4.788741, -4.53928, -4.031055, -5.76957, -4.606419, -5.076423,
         -9.576233, -4.912794, -4.931842, -4.400083, -4.200954, -4.350486,
         -4.494828, -7.379008, -4.243514, -4.277915, -4.648979, -5.887353,
         -7.273648, -5.838563, -3.66273, -5.076423, -3.934326, -5.076423,
         -4.572286, -5.145416, -4.71642, -5.032938, -4.71642, -4.323959,
         -4.196335, -5.133581, -6.937175, -4.519987, -5.194206, -6.244028,
         -3.996503, -5.912671,],
        [-4.323667, -4.699232, -7.1521, -4.854935, -5.128228, -3.722481,
         -6.619883, -5.910987, -8.054967, -4.948887, -5.062574, -7.467181,
         -7.207669, -3.962847, -5.435141, -4.440452, -5.88782, -4.734739,
         -4.182378, -4.415628, -7.430813, -6.978828, -7.584964, -6.472558,
         -10.763017, -4.38629, -4.420896, -4.931135, -5.114043, -7.818578,
         -10.763017, -5.042706, -4.245346, -4.931135, -4.846815, -3.797937,
         -5.096591, -4.389698, -5.042706, -6.619883, -5.059235, -3.929986,
         -4.001445, -10.763017, -4.183766, -4.791756, -4.905084, -4.290671,
         -4.849514, -5.023225, -5.128228, -4.201987, -4.882484, -5.000966,
         -5.023225, -6.871197, -4.817597, -5.086264, -5.082845, -6.792726,
         -6.209141, -7.395722, -4.97612, -4.830772, -10.763017, -6.668673,
         -3.883662, -6.934376, -6.274381, -5.004116, -5.114043, -4.876913,
         -4.907946, -4.322071, -3.233611, -6.514522, -6.30867, -4.899386,
         -4.817597, -6.573363, -3.994524, -4.417381, -4.820218, -6.792726,
         -4.317298, -6.737666, -4.910815, -5.065924, -7.430813, -10.763017,
         -4.931135, -4.344653, -3.945187, -5.857743, -4.817597, -5.100057,
         -10.763017, -4.796871, -4.957882, -4.412132, -4.290671, -4.382895,
         -4.475159, -7.26651, -4.299988, -4.096061, -4.694592, -6.053487,
         -6.978828, -5.739137, -3.694845, -5.03617, -3.995674, -5.157215,
         -4.454919, -4.991576, -4.713284, -4.919473, -4.874139, -4.333298,
         -4.178226, -5.17203, -6.514522, -4.729931, -5.055907, -6.320366,
         -3.975172, -5.80719,],
        [-4.146154, -4.654097, -7.103665, -4.861183, -4.983401, -3.716454,
         -6.453077, -6.005052, -7.285986, -4.888091, -4.915742, -7.023622,
         -7.023622, -3.9791, -5.54552, -4.429516, -6.154584, -4.705769,
         -4.231985, -4.357463, -7.642661, -7.023622, -8.202277, -6.292734,
         -9.588571, -4.464607, -4.482626, -4.925132, -5.099935, -7.642661,
         -9.588571, -5.045277, -4.231985, -4.934611, -4.861183, -3.722103,
         -5.122663, -4.412422, -5.111234, -6.592839, -5.111234, -3.925611,
         -4.020227, -9.588571, -4.280304, -4.721037, -4.713374, -4.305368,
         -4.934611, -5.077712, -4.983401, -4.128986, -4.713374, -5.055972,
         -5.088762, -7.285986, -4.870072, -5.088762, -5.034694, -7.023622,
         -6.221275, -7.642661, -5.122663, -4.861183, -9.588571, -6.497529,
         -3.990149, -6.815983, -6.369695, -4.870072, -5.169731, -5.034694,
         -5.003604, -4.295266, -3.285952, -6.453077, -6.369695, -4.888091,
         -4.94418, -6.497529, -3.96817, -4.255853, -4.792781, -6.330475,
         -4.246237, -6.815983, -4.776387, -5.088762, -7.391347, -9.588571,
         -4.973451, -4.470577, -3.96817, -5.75993, -4.870072, -4.870072,
         -9.588571, -4.760258, -4.879041, -4.564691, -4.280304, -4.251033,
         -4.500975, -7.023622, -4.217933, -4.112108, -4.646929, -6.187374,
         -7.023622, -5.75993, -3.716454, -5.099935, -3.894839, -5.01386,
         -4.632744, -5.066783, -4.776387, -5.122663, -4.752289, -4.341547,
         -4.241464, -5.122663, -6.880521, -4.736541, -5.231862, -6.410517,
         -4.016417, -6.221275,],
        [-4.284453, -4.781967, -7.498316, -4.628998, -5.077948, -3.809436,
         -6.358882, -5.966839, -7.498316, -5.045158, -5.055969, -7.092851,
         -6.687386, -3.825185, -5.329262, -4.502584, -6.14377, -4.567122,
         -4.202479, -4.412971, -7.179862, -7.179862, -7.96832, -6.112022,
         -9.577757, -4.436094, -4.508853, -4.868227, -5.077948, -7.631847,
         -9.577757, -5.089121, -4.315067, -5.12341, -5.003046, -3.700022,
         -5.233952, -4.357402, -5.045158, -7.380533, -4.914318, -3.847658,
         -3.950136, -9.577757, -4.225899, -4.904929, -4.710223, -4.259637,
         -5.013409, -5.066898, -5.111849, -4.101294, -4.859259, -5.013409,
         -5.135106, -7.275172, -4.807073, -5.260269, -5.023881, -6.442263,
         -6.051397, -7.380533, -5.343651, -4.665103, -9.577757, -6.486715,
         -3.964629, -6.486715, -6.358882, -4.982638, -4.952785, -4.868227,
         -4.962637, -4.245039, -3.278808, -6.399704, -6.14377, -4.85037,
         -5.100421, -6.805169, -4.040423, -4.368271, -4.841559, -6.486715,
         -4.245039, -6.633318, -4.85037, -4.824167, -7.275172, -9.577757,
         -5.003046, -4.424466, -4.03258, -5.864185, -4.679918, -5.183308,
         -9.577757, -4.895626, -4.694955, -4.37926, -4.202479, -4.240219,
         -4.540805, -7.275172, -4.23065, -4.166111, -4.741476, -6.112022,
         -6.633318, -5.483413, -3.666961, -5.034463, -3.983046, -5.315078,
         -4.62193, -5.013409, -4.694955, -5.158917, -4.614913, -4.508853,
         -4.161657, -5.343651, -6.805169, -4.798634, -5.077948, -6.210462,
         -4.09296, -6.358882,],
        [-4.319011, -4.796388, -7.04768, -4.738865, -5.058095, -3.772897,
         -6.729227, -5.888443, -7.517684, -4.968239, -5.008085, -6.987056,
         -7.04768, -3.880098, -5.18554, -4.364948, -6.23675, -4.644119,
         -4.21815, -4.352209, -7.181212, -6.987056, -7.874359, -6.323761,
         -9.820269, -4.48755, -4.526964, -4.952735, -4.952735, -7.740827,
         -9.820269, -4.952735, -4.255749, -5.016248, -4.945072, -3.749531,
         -5.110739, -4.426641, -4.991955, -6.87583, -4.999987, -3.79199,
         -3.985458, -9.820269, -4.153842, -4.616262, -4.900288, -4.377851,
         -4.991955, -4.968239, -5.138138, -4.160787, -4.850456, -4.92992,
         -4.999987, -7.04768, -4.878627, -5.128921, -4.945072, -7.112219,
         -6.082599, -7.740827, -5.18554, -4.829836, -9.820269, -6.642215,
         -3.970944, -6.775747, -6.419072, -4.952735, -5.049584, -5.041145,
         -5.049584, -4.229282, -3.263491, -6.775747, -6.156707, -4.823057,
         -4.952735, -6.601393, -4.027255, -4.373532, -4.708281, -6.684775,
         -4.199868, -6.987056, -4.900288, -4.900288, -6.987056, -9.820269,
         -4.893015, -4.48755, -4.006138, -5.693135, -4.836662, -5.024478,
         -9.820269, -4.829836, -4.816323, -4.542154, -4.302816, -4.294816,
         -4.512001, -7.25532, -4.286879, -4.048828, -4.732673, -6.13139,
         -6.642215, -5.928449, -3.713246, -5.119789, -3.953801, -5.041145,
         -4.440372, -5.18554, -4.720403, -5.15683, -4.745095, -4.390923,
         -4.29084, -5.15683, -7.04768, -4.672774, -5.255921, -6.323761,
         -4.021176, -5.970121,],
    ],
}


def lang_id_nb_margin(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    und_below: float | None = None,
    round_to: int = 6,
) -> DataFrame:
    """:func:`lang_id_nb` with a DECISION MARGIN and a reject option
    (round 11): besides the argmax language, emit how decisively it won
    — ``margin_per_gram = (best − second_best) / (T · 10⁶)`` over the
    same exact LONG micro-unit decision values (the margin is an exact
    integer difference; only the final length normalization divides).
    A low margin means the gram evidence barely separates two languages
    — exactly the docs a production gate routes to ``'und'`` (the
    fastText-style confidence-reject) instead of trusting a coin-flip
    argmax; ``und_below=`` applies that rule in-plan.

    Same one-explode/one-aggregate shape as :func:`lang_id_nb` (the
    sorted decision array is read twice — positions 1 and 2 — in the
    same projection). Empty texts fall back to the max-prior language
    with a NULL margin (no evidence ≠ confident evidence).

    Returns ``(id_col, lang_pred, margin_per_gram)``.
    """
    langs, dim, n = model["langs"], int(model["dim"]), int(model["n"])
    ell = int(model.get("ell", 20))
    algo = model.get("algo", "md5")
    grams = df.select(
        F.col(id_col),
        F.explode(_char_ngram_buckets(text_col, n, dim, algo)).alias("__b"),
    )
    score_aggs = [F.count(F.lit(1)).alias("__t")]
    for li in range(len(langs)):
        w_lit = F.array(
            *[
                F.lit(int(round(v * 1_000_000))).cast("long")
                for v in model["w"][li]
            ]
        )
        score_aggs.append(
            F.sum(F.element_at(w_lit, F.col("__b") + 1)).alias(f"__s_{li}")
        )
    scored = grams.groupBy(id_col).agg(*score_aggs)
    decisions = []
    for li, lang in enumerate(langs):
        prior_micro = int(round(model["prior"][li] * 1_000_000))
        val = (
            F.col("__t") * F.lit(prior_micro).cast("long")
            + F.lit(ell).cast("long") * F.col(f"__s_{li}")
        )
        decisions.append(
            F.struct((-val).alias("ns"), F.lit(lang).alias("lang"))
        )
    srt = F.array_sort(F.array(*decisions))
    margin = (
        (F.element_at(srt, 2)["ns"] - F.element_at(srt, 1)["ns"])
        .cast("double")
        / (F.col("__t").cast("double") * 1_000_000.0)
    )
    scored = scored.select(
        id_col,
        F.element_at(srt, 1)["lang"].alias("__pred"),
        F.round(margin, round_to).alias("margin_per_gram"),
    )
    prior_best = max(
        range(len(langs)), key=lambda i: (model["prior"][i], -i)
    )
    out = (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__pred"), F.lit(langs[prior_best])).alias(
                "lang_pred"
            ),
            "margin_per_gram",
        )
    )
    if und_below is not None:
        out = out.withColumn(
            "lang_pred",
            F.when(
                F.col("margin_per_gram") < F.lit(float(und_below)),
                F.lit("und"),
            ).otherwise(F.col("lang_pred")),
        )
    return out
