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
