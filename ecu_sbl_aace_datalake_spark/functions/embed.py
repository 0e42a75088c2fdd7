"""Text vectorization via the hashing trick — embedding generation that
needs no model, no vocabulary, and no Python.

The signed feature-hashing vectorizer (Weinberger et al., ICML'09): token t
contributes sign(hash'(t)) to dimension hash(t) mod d. Unit-normalized, it
gives cosine-comparable sparse-ish vectors good enough for near-dup
blocking, clustering seeds, and as the deterministic stand-in where a model
embedding column hasn't been computed yet.

Scale: one pass of built-in array expressions per row (no shuffle, no UDF);
at 100 TB this runs at scan speed. Pairs with
``operators/similarity.cosine_topk`` / ``lsh_topk`` downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hashed_embedding_col(text_col: str | Column, dim: int = 64) -> Column:
    """Signed-hash bag-of-tokens vector (array<double>, L2-normalized;
    zero vector for empty text)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " ")), r"\s+"),
        lambda t: t != "",
    )
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # accumulate counts per dimension in one aggregate pass: bucket =
    # pmod(h, dim); sign from bit 62 (avoid sign bit correlation with pmod)
    init = F.array_repeat(F.lit(0.0), dim)
    summed = F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.when(
                    F.pmod(h, F.lit(dim)) == i,
                    F.when(F.shiftright(h, 62).bitwiseAND(F.lit(1)) == 1, 1.0).otherwise(-1.0),
                ).otherwise(0.0),
            ),
            lambda a, b: a + b,
        ),
    )
    norm = F.sqrt(
        F.aggregate(summed, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.when(
        norm > 0, F.transform(summed, lambda x: x / norm)
    ).otherwise(init)


def with_hashed_embedding(
    df: DataFrame, text_col: str = "text", out_col: str = "embedding", dim: int = 64
) -> DataFrame:
    return df.withColumn(out_col, hashed_embedding_col(text_col, dim))


def with_hashed_embedding_fast(
    df: DataFrame, text_col: str = "text", out_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """numpy/mapInPandas fast path of the hashing-trick vectorizer.

    Same algorithm family as :func:`hashed_embedding_col` but with md5-based
    token hashing vectorized in numpy — ~10x faster than the interpreted
    O(tokens·dim) expression form on long documents. Values differ from the
    expression form (different token hash), both are deterministic; pick one
    per pipeline and stick with it.
    """
    import hashlib
    import re as _re
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    passthrough = [c for c in df.columns]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<double>"
    token_re = _re.compile(r"[a-z0-9]+")

    hash_memo: dict[str, tuple[int, float]] = {}

    def tok_hash(t: str) -> tuple[int, float]:
        # token vocabularies are heavy-tailed: memoizing per-worker turns
        # the md5 into a dict hit for all but the first occurrence
        hit = hash_memo.get(t)
        if hit is None:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            hit = (h % dim, 1.0 if (h >> 62) & 1 else -1.0)
            hash_memo[t] = hit
        return hit

    def embed_one(text: str) -> list[float]:
        toks = token_re.findall((text or "").lower())
        if not toks:
            return [0.0] * dim
        vec = np.zeros(dim)
        for t in toks:
            bucket, sign = tok_hash(t)
            vec[bucket] += sign
        n = float(np.sqrt((vec * vec).sum()))
        return (vec / n).tolist() if n else vec.tolist()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[passthrough].copy()
            out[out_col] = pdf[text_col].map(embed_one)
            yield out

    return df.mapInPandas(batches, schema=out_schema)
