"""Z-order (Morton) interleaving: multi-dimensional clustering keys for
data skipping on more than one column.

A 1-D sort (``io.cluster_table``) gives perfect file-level min/max pruning
on the sort key and none on other columns. Interleaving the bits of k
normalized columns into one Morton code and sorting by THAT gives every
column a per-file range of roughly ``global_range / n_files^(1/k)`` —
worse than a dedicated sort per column, far better than nothing on all of
them at once. This is the layout trick behind Delta/Databricks Z-ORDER
(public knowledge; implemented here from the bit math up with built-in
expressions only — no UDF, stays in codegen).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_bits(
    col: Column, lo: float, hi: float, bits: int
) -> Column:
    """Map numeric ``col`` from [lo, hi] onto integers [0, 2^bits);
    nulls and degenerate ranges map to 0."""
    if hi <= lo:
        return F.lit(0).cast("long")
    span = float(hi) - float(lo)
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(span)
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return F.coalesce(
        F.floor(clamped * F.lit(float((1 << bits) - 1))).cast("long"),
        F.lit(0).cast("long"),
    )


def morton_interleave(norm_cols: Sequence[Column], bits: int) -> Column:
    """Bit-interleave k already-normalized integer columns into one Morton
    code: output bit ``i*k + d`` is input d's bit i. Pure
    shift/mask/sum expression — whole-stage codegen, no Python."""
    k = len(norm_cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    terms = []
    for d, c in enumerate(norm_cols):
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + d
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zvalue(
    df: DataFrame, cols: Sequence[str], bits: int | None = None
) -> Column:
    """Morton code over ``cols`` with ranges taken from ``df`` stats (ONE
    aggregate job). ``bits`` defaults to the most that fit 63 bits total."""
    cols = list(cols)
    if bits is None:
        bits = 63 // len(cols)
    stats = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).first()
    normed = [
        normalize_to_bits(
            F.col(c),
            float(stats[f"lo_{c}"] if stats[f"lo_{c}"] is not None else 0),
            float(stats[f"hi_{c}"] if stats[f"hi_{c}"] is not None else 0),
            bits,
        )
        for c in cols
    ]
    return morton_interleave(normed, bits)
