"""Sequence packing: group documents into fixed token-budget packs for LLM
training batches (north-star training-pipeline op, SURVEY.md §2.13 family).

Two strategies, matching the two ways production pipelines pack:

- :func:`chunk_pack` — concat-then-chunk. Documents are laid out in a
  deterministic order inside each shard and cut into packs at exact
  cumulative-token boundaries (documents may straddle a boundary, as when
  the corpus is concatenated and split every ``budget`` tokens). Pure
  window arithmetic: expressible in ANSI SQL, so it carries a DuckDB
  oracle.
- :func:`greedy_pack` — whole-document first-fit. Documents never split:
  a pack closes when the next document would overflow the budget. A
  running-reset scan, not window-expressible — implemented per shard with
  ``applyInPandas``; invariants (no overflow except oversized singletons,
  contiguity, completeness) are unit-tested.

Scale posture: both partition by the shard column(s) — one shuffle on the
shard key — and never collect. Pack ids are shard-local; the (shard,
pack_id) pair is globally unique, so no global sequence bottleneck exists
at 100 TB. Shards are independent; skewed shards can be salted upstream
with :mod:`.skew` helpers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens


def with_token_count(
    df: DataFrame, text_col: str = "text", out_col: str = "n_tokens"
) -> DataFrame:
    """Whitespace token count per document (the packing currency);
    0 for null text (size(null) is -1 in non-ANSI Spark, so guard the
    null before, not after, the size call)."""
    c = F.col(text_col)
    return df.withColumn(
        out_col,
        F.when(c.isNull(), F.lit(0)).otherwise(F.size(tokens(text_col))),
    )


def chunk_pack(
    df: DataFrame,
    budget: int,
    shard_cols: Sequence[str] = ("source",),
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    out_col: str = "pack_id",
) -> DataFrame:
    """Assign each document to pack ``floor(exclusive_cumsum(tokens) /
    budget)`` within its shard, documents ordered by ``order_col``.

    This is concat-and-cut semantics: pack k holds the documents whose
    first token falls in ``[k*budget, (k+1)*budget)`` of the shard's
    concatenated token stream. One window over (shard, order) — a single
    shuffle on the shard key, each shard sorted independently.
    """
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(out_col, F.floor(prior / F.lit(budget)))


def greedy_pack(
    df: DataFrame,
    budget: int,
    shard_cols: Sequence[str] = ("source",),
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    out_col: str = "pack_id",
) -> DataFrame:
    """Whole-document sequential first-fit: walk each shard in
    ``order_col`` order; start a new pack whenever adding the next document
    would exceed ``budget``. A document larger than the budget gets a pack
    of its own (never split, never dropped).

    The running reset makes this non-window-expressible; each shard is a
    single ``applyInPandas`` group (shards are bounded by construction —
    they are the unit a trainer consumes, not the whole corpus).
    """
    import pandas as pd

    shard_cols = list(shard_cols)
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} bigint"

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        pack_ids = []
        pack, used = 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if used > 0 and used + t > budget:
                pack += 1
                used = 0
            pack_ids.append(pack)
            used += t
        pdf[out_col] = pd.Series(pack_ids, dtype="int64")
        return pdf

    return df.groupBy(*shard_cols).applyInPandas(pack_shard, schema=schema)


def ffd_pack(
    df: DataFrame,
    budget: int,
    shard_cols: Sequence[str] = ("source",),
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    out_col: str = "pack_id",
) -> DataFrame:
    """First-fit-decreasing bin packing per shard: documents sorted by
    token count descending, each placed in the first open pack with room
    (classic FFD — ≤ 11/9·OPT + 1 packs). Use when fill ratio matters more
    than preserving document order inside a pack (offline batch prep);
    :func:`greedy_pack` preserves order, this maximizes density.

    ``order_col`` only breaks token-count ties, keeping the result
    deterministic. Oversized documents still get singleton packs. Per-shard
    ``applyInPandas`` like greedy; the open-bin scan is O(n·bins) with
    bins bounded by shard size / budget.
    """
    import pandas as pd

    shard_cols = list(shard_cols)
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} bigint"

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [token_col, order_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        remaining: list[int] = []  # room left per open pack
        pack_ids = []
        for t in pdf[token_col]:
            t = int(t)
            for p, room in enumerate(remaining):
                if t <= room:
                    remaining[p] = room - t
                    pack_ids.append(p)
                    break
            else:
                remaining.append(budget - t)  # may go negative: oversized singleton
                pack_ids.append(len(remaining) - 1)
        pdf[out_col] = pd.Series(pack_ids, dtype="int64")
        return pdf

    return df.groupBy(*shard_cols).applyInPandas(pack_shard, schema=schema)


def pack_summary(
    packed: DataFrame,
    budget: int,
    shard_cols: Sequence[str] = ("source",),
    token_col: str = "n_tokens",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Per-pack roll-up: document count, token total, fill ratio — the
    packing-efficiency report a training pipeline monitors."""
    return (
        packed.groupBy(*shard_cols, pack_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_col).alias("sum_tokens"),
            F.round(F.sum(token_col) / F.lit(budget), 4).alias("fill_ratio"),
        )
    )


def sample_token_mixture(
    df,
    weights: dict[str, float],
    total_tokens: int,
    source_col: str = "source",
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mix",
):
    """Deterministic TOKEN-BUDGET mixture sampling — the data-mixing step
    of a pre-training run: each source gets ``total_tokens · w_s / Σw``
    tokens; within a source, documents are admitted in hash-priority order
    (same md5 convention as ``transform.sample_fixed_n`` — reproducible
    across runs/engines/partitionings) while the running token total stays
    within budget (cumulative count INCLUDING the doc ≤ budget, so the
    sample never overshoots; a doc larger than its source's whole budget
    is unsampleable). Sources absent from ``weights`` are dropped.

    Returns the sampled rows plus ``n_tokens``. One window per source
    partition (shuffle on source — low cardinality, so AQE coalesces;
    skewed giant sources stay a single partition ONLY for the cumsum,
    which is a streaming frame, not a materialized sort buffer).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if token_col is None:
        df = with_token_count(df, text_col)
        token_col = "n_tokens"
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    budget = None
    for name, w in weights.items():
        b = F.lit(int(total_tokens * w / total_w))
        cond = F.col(source_col) == name
        budget = F.when(cond, b) if budget is None else budget.when(cond, b)
    pri = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    w_cum = (
        Window.partitionBy(source_col)
        .orderBy(F.col("__pri").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.where(F.col(source_col).isin(list(weights)))
        .withColumn("__pri", pri)
        .withColumn("__cum", F.sum(F.col(token_col).cast("long")).over(w_cum))
        .where(F.col("__cum") <= budget)
        .drop("__pri", "__cum")
    )


def temperature_mixture_weights(
    df: DataFrame,
    source_col: str = "source",
    token_col: str | None = None,
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture weights (the multilingual-pretraining
    standard, e.g. mC4/XLM-R): per-source sampling probability
    ``w_s = n_s^alpha / SUM_t n_t^alpha`` where ``n_s`` is the source's
    token count. ``alpha=1`` reproduces natural proportions; ``alpha<1``
    upweights small sources.

    Returns (source, n_tokens, weight) with weight rounded 6dp. One
    aggregate over the corpus; the normalizing sum is decimal-summed over
    6dp-rounded powers so the ratio is bit-stable across engines
    (``alpha=0.5`` uses SQRT, which is IEEE-correctly-rounded — prefer it
    when an oracle must replay the math; other alphas go through pow,
    whose last ulp is libm-dependent).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if token_col is None:
        df = with_token_count(df, text_col)
        token_col = "n_tokens"
    per_src = df.groupBy(source_col).agg(
        F.sum(token_col).cast("long").alias("n_tokens")
    )
    n = F.col("n_tokens").cast("double")
    powed = (
        F.sqrt(n) if float(alpha) == 0.5
        else F.pow(n, F.lit(float(alpha)))
    )
    scaled = per_src.withColumn("__p", F.round(powed, 6))
    w = Window.partitionBy()
    denom = F.sum(F.col("__p").cast("decimal(28,6)")).over(w).cast("double")
    return scaled.select(
        source_col,
        "n_tokens",
        F.round(F.col("__p") / denom + F.lit(1e-9), 6).alias("weight"),
    )


def interleave_sources(
    df: DataFrame,
    weights: dict[str, int],
    id_col: str,
    source_col: str = "source",
    order_col: str | None = None,
    out_col: str = "interleave_pos",
) -> DataFrame:
    """Deterministic STRIDE-SCHEDULED source interleaving — the training
    data ORDER counterpart of the mixture-sampling ops: lay the corpus
    out so every prefix holds each source in proportion to its integer
    weight (a weight-2 source appears twice as often as a weight-1
    source at every depth), with no RNG anywhere. The standard stride
    scheduler: row r (0-based, per source, ordered by ``order_col``,
    default ``id_col``) gets virtual time ``(2r+1)·(M/w)`` with
    ``M = lcm(weights)`` — EXACT integers, so the global order is
    engine-independent; ties (equal virtual time across sources) break
    on (source, id).

    Scale: one window per source for the rank (one shuffle on
    ``source_col``), then the distributed contiguous index (range
    partition + broadcast offsets) — never a single-task global sort.

    Raises on unmapped sources (an unweighted source would silently sort
    first or last); weights must be positive ints. Returns ``df`` +
    ``out_col`` (0-based global position).
    """
    import math as _math

    if not weights:
        raise ValueError("weights must be non-empty")
    if any((not isinstance(w, int)) or w < 1 for w in weights.values()):
        raise ValueError("weights must be positive ints")
    m = 1
    for w in set(weights.values()):
        m = m * w // _math.gcd(m, w)
    order = order_col or id_col
    stride = F.lit(None).cast("long")
    expr = None
    for s, w in weights.items():
        cond = F.col(source_col) == s
        val = F.lit(m // w).cast("long")
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    stride = expr
    w_rank = Window.partitionBy(source_col).orderBy(
        F.col(order).asc(), F.col(id_col).asc()
    )
    tagged = df.withColumn("__stride", stride)
    # unmapped source -> NULL stride; fail loudly instead of mis-sorting
    bad = tagged.where(F.col("__stride").isNull()).select(source_col).first()
    if bad is not None:
        raise ValueError(f"no weight for source {bad[0]!r}")
    ranked = tagged.withColumn(
        "__v",
        (2 * (F.row_number().over(w_rank) - 1) + 1) * F.col("__stride"),
    ).drop("__stride")
    from .transform import add_index_col_distributed

    out = add_index_col_distributed(
        ranked, col_name=out_col, order_by=["__v", source_col, id_col]
    )
    return out.withColumn(out_col, F.col(out_col) - 1).drop("__v")


def epoch_plan(
    df: DataFrame,
    weights: dict[str, int],
    budget_tokens: int,
    source_col: str = "source",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Data-recipe epoch planning (the DoReMi/LLaMA-style mixture sheet):
    given integer mixture ``weights`` and a total token ``budget``, how
    many FULL passes (epochs) of each source fit its share, and how many
    tokens of a partial pass remain. All integer-exact:
    ``target_s = budget·w_s // Σw``, ``full = target_s // T_s``,
    ``remainder = target_s % T_s`` (sources with no tokens plan zero).

    One aggregate over the corpus; the plan is sources-sized. Returns
    ``(source, n_docs, tokens, target_tokens, full_epochs,
    remainder_tokens)``.
    """
    if not weights or any((not isinstance(w, int)) or w < 1 for w in weights.values()):
        raise ValueError("weights must be non-empty positive ints")
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    sum_w = sum(weights.values())
    expr = None
    for s, w in weights.items():
        c = F.col(source_col) == s
        expr = F.when(c, w) if expr is None else expr.when(c, w)
    # a source missing from weights must fail loudly — a NULL weight would
    # silently plan NULL targets for that source
    expr = expr.otherwise(
        F.raise_error(
            F.concat(F.lit("epoch_plan: no weight for source "),
                     F.col(source_col))
        ).cast("int")
    )
    totals = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("tokens"),
    )
    # integer-exact division throughout: (a - a % b) / b on longs — the
    # subtraction makes the double division exact (values < 2^53), so no
    # float-floor boundary case can disagree with the SQL oracle's `//`
    num = F.lit(int(budget_tokens)) * expr.cast("long")
    target = ((num - num % F.lit(sum_w)) / F.lit(sum_w)).cast("long")
    toks = F.col("tokens")
    full = ((target - target % toks) / toks).cast("long")
    return totals.select(
        source_col,
        "n_docs",
        "tokens",
        target.alias("target_tokens"),
        F.when(toks > 0, full).otherwise(F.lit(0)).cast("long").alias(
            "full_epochs"
        ),
        F.when(toks > 0, target % toks).otherwise(F.lit(0)).cast("long").alias(
            "remainder_tokens"
        ),
    )


def materialize_epochs(
    df: DataFrame,
    plan: DataFrame,
    id_col: str,
    source_col: str = "source",
    token_col: str = "n_tokens",
    salt: str = "epoch",
) -> DataFrame:
    """Materialize an :func:`epoch_plan`: every doc repeats once per full
    epoch (``epoch`` = 1…full), and the partial pass admits docs in
    md5-priority order while their cumulative tokens fit
    ``remainder_tokens`` — the same replayable prefix rule as
    ``cap_per_group_bytes``, tagged ``epoch = full_epochs + 1``.

    Shape: one broadcast join of the sources-sized plan, one
    ``explode(sequence)`` fan-out for the full epochs (map-side), one
    window per source for the partial prefix. Returns ``df`` columns +
    ``epoch``.
    """
    j = df.join(
        F.broadcast(
            plan.select(source_col, "full_epochs", "remainder_tokens")
        ),
        source_col,
    )
    fulls = (
        j.where(F.col("full_epochs") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(1), F.col("full_epochs")))
        )
    )
    pri = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    w = (
        Window.partitionBy(source_col)
        .orderBy(pri.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partial = (
        j.where(F.col("remainder_tokens") > 0)
        .withColumn("__cum", F.sum(F.col(token_col).cast("long")).over(w))
        .where(F.col("__cum") <= F.col("remainder_tokens"))
        .withColumn("epoch", (F.col("full_epochs") + 1).cast("int"))
        .drop("__cum")
    )
    keep = [*df.columns, "epoch"]
    return fulls.select(*keep).unionByName(partial.select(*keep))


# per-document and per-sequence token overhead of the inference/training
# serialization format — frozen nominal costs (role sentinels for chat
# turns, FIM region sentinels, EOS separators). Real tokenizers differ by
# a token or two; what matters for packing correctness is that the
# overhead is charged AT ALL (a budget-512 packer that ignores an 8-token
# chat wrapper overflows every sequence by n_docs*8 tokens at train time).
TEMPLATE_OVERHEADS: dict[str, tuple[int, int]] = {
    # template -> (per_doc_overhead, per_seq_overhead)
    "plain": (1, 0),   # EOS separator per doc
    "chat": (8, 2),    # role header/footer sentinels per turn; BOS+system
    "fim": (3, 1),     # fim_prefix/middle/suffix sentinels; BOS
}


def format_aware_pack(
    df: DataFrame,
    budget: int,
    template: str = "chat",
    shard_cols: Sequence[str] = ("source",),
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    out_col: str = "pack_id",
    per_doc_overhead: int | None = None,
    per_seq_overhead: int | None = None,
    oversize: str = "singleton",
    algo: str = "greedy",
) -> DataFrame:
    """Packing at INFERENCE-FORMAT granularity (VERDICT r8 item #8):
    documents are packed under the budget that survives serialization
    into a chat template / FIM triple / plain-EOS stream — each
    document is charged its format's per-document sentinel overhead and
    each sequence reserves the per-sequence overhead, so the packed
    sequences fit the training context EXACTLY instead of overflowing
    by the wrapper tokens.

    Format units are ATOMIC — a chat turn or FIM triple cannot be split
    across sequences — so this always packs whole documents
    (:func:`greedy_pack` order-preserving, or :func:`ffd_pack` when
    ``algo="ffd"`` for density), never :func:`chunk_pack`'s
    concat-and-cut. ``oversize="drop"`` removes documents whose
    wrapped cost exceeds the usable capacity (``"singleton"`` keeps
    them in packs of their own, the greedy/ffd convention).

    Adds ``n_tokens_fmt`` (the wrapped per-doc cost) next to
    ``out_col``. Same scale shape as the underlying packer: one
    applyInPandas per shard.
    """
    if template not in TEMPLATE_OVERHEADS:
        raise ValueError(
            f"unknown template {template!r}; known: {sorted(TEMPLATE_OVERHEADS)}"
        )
    d_over, s_over = TEMPLATE_OVERHEADS[template]
    if per_doc_overhead is not None:
        d_over = int(per_doc_overhead)
    if per_seq_overhead is not None:
        s_over = int(per_seq_overhead)
    capacity = int(budget) - s_over
    if capacity <= d_over:
        raise ValueError(
            f"budget {budget} leaves no room after overheads ({d_over}, {s_over})"
        )
    wrapped = df.withColumn(
        "n_tokens_fmt", (F.col(token_col) + F.lit(d_over)).cast("int")
    )
    if oversize == "drop":
        wrapped = wrapped.where(F.col("n_tokens_fmt") <= capacity)
    elif oversize != "singleton":
        raise ValueError(f"unknown oversize policy {oversize!r}")
    packer = {"greedy": greedy_pack, "ffd": ffd_pack}[algo]
    return packer(
        wrapped, capacity, shard_cols=shard_cols, order_col=order_col,
        token_col="n_tokens_fmt", out_col=out_col,
    )


def truncation_report(
    df: DataFrame,
    budgets: Sequence[int],
    token_col: str = "n_tokens",
) -> DataFrame:
    """Context-budget selection table (round 9): for each candidate
    budget, how much data the two standard policies destroy —
    ``truncate`` loses every token past the budget
    (Σ max(t−B, 0)), ``drop`` loses every over-budget document whole
    (Σ t · [t>B]). The table a training run reads to pick its sequence
    length: the budget where truncate-loss flattens is where the corpus'
    long tail actually ends, and a big truncate/drop gap flags a
    head-heavy length distribution where truncation quietly deletes
    document endings.

    Pure map-side explode over the literal budget list + ONE aggregate
    on the budget key — linear at any scale, no shuffle beyond the
    |budgets|-row rollup.

    Returns ``(budget, n_docs, n_over, frac_over, tokens_total,
    tokens_lost_truncate, tokens_lost_drop, frac_lost_truncate)``.
    """
    if not budgets:
        raise ValueError("budgets must be non-empty")
    t = F.col(token_col).cast("long")
    b = F.col("budget")
    exploded = df.select(
        t.alias("__t"),
        F.explode(
            F.array(*[F.lit(int(x)).cast("long") for x in budgets])
        ).alias("budget"),
    )
    over = F.col("__t") > b
    return (
        exploded.groupBy("budget")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(over.cast("long")).alias("n_over"),
            F.round(F.sum(over.cast("long")) / F.count(F.lit(1)), 6).alias(
                "frac_over"
            ),
            F.sum("__t").alias("tokens_total"),
            F.sum(
                F.greatest(F.col("__t") - b, F.lit(0).cast("long"))
            ).alias("tokens_lost_truncate"),
            F.sum(F.when(over, F.col("__t")).otherwise(F.lit(0))).alias(
                "tokens_lost_drop"
            ),
            F.round(
                F.sum(F.greatest(F.col("__t") - b, F.lit(0).cast("long")))
                / F.sum("__t"),
                6,
            ).alias("frac_lost_truncate"),
        )
        .orderBy("budget")
    )


def pack_attention_stats(
    packed: DataFrame,
    shard_cols: Sequence[str] = ("source",),
    token_col: str = "n_tokens",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Cross-document attention contamination per pack (round 9): when
    packed sequences train WITHOUT document-boundary attention masking,
    every token attends causally across the concatenation seams — the
    contaminated fraction of attention pairs is
    ``1 − Σ_i t_i(t_i+1)/2 ÷ T(T+1)/2`` for a pack of docs sized t_i,
    T = Σ t_i. This table is how you decide whether implementing
    doc-masked attention (or intra-pack sorting by provenance) is worth
    it for a given corpus mix: many small docs per pack → high
    contamination; near-budget single docs → negligible.

    All counts are integer-exact (t·(t+1) is always even; products stay
    far below 2^53 because t is bounded by the pack budget). ONE
    aggregate on the (shard, pack) key.

    Returns ``(shard…, pack_id, n_docs, seq_tokens, total_causal_pairs,
    cross_doc_pairs, frac_cross)``.
    """
    t = F.col(token_col).cast("long")
    within = (t * (t + F.lit(1)) / F.lit(2)).cast("long")
    per = packed.groupBy(*list(shard_cols), pack_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(t).alias("seq_tokens"),
        F.sum(within).alias("__within"),
    )
    big_t = F.col("seq_tokens")
    total = (big_t * (big_t + F.lit(1)) / F.lit(2)).cast("long")
    return per.select(
        *list(shard_cols),
        pack_col,
        "n_docs",
        "seq_tokens",
        total.alias("total_causal_pairs"),
        (total - F.col("__within")).alias("cross_doc_pairs"),
        F.when(
            total > 0,
            F.round((total - F.col("__within")) / total, 6),
        ).otherwise(F.lit(0.0)).alias("frac_cross"),
    )


def pack_boundaries(
    packed: DataFrame,
    shard_cols: Sequence[str] = ("source",),
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    pack_col: str = "pack_id",
    id_col: str = "doc_id",
    base_offset: int = 0,
) -> DataFrame:
    """Per-pack document-boundary offsets (round 10, VERDICT r9 item
    #6): the table a trainer needs to MASK cross-document attention in
    packed sequences — each row is one document's half-open token span
    ``[start_offset, end_offset)`` inside its pack, in pack
    concatenation order. The per-pack offset list is exactly
    flash-attention's varlen ``cu_seqlens`` (and the reset points for
    per-document position ids); :func:`pack_attention_stats`'s
    ``cross_doc_pairs`` is then the attention-pair count this mask
    removes per pack.

    ``base_offset`` shifts every span right — pass the per-sequence
    reserved overhead when composing with :func:`format_aware_pack`
    (e.g. 2 for the chat template's BOS + system stub, so offsets index
    into the SERIALIZED sequence), and that pack's ``token_col`` is
    ``n_tokens_fmt``.

    ONE window over the (shard, pack) key ordered by ``order_col`` —
    the same partitioning the packer produced, no extra shuffle beyond
    the window's. Invariants (tested): spans are contiguous
    (``start(k) = end(k−1)``), the first span starts at
    ``base_offset``, and the last span ends at ``base_offset +
    Σ token_col`` — the pack's sequence length.

    Returns ``(shard…, pack_id, id_col, doc_pos, start_offset,
    end_offset)``.
    """
    shard_cols = list(shard_cols)
    w = Window.partitionBy(*shard_cols, pack_col).orderBy(order_col)
    prior = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return packed.select(
        *shard_cols,
        pack_col,
        F.col(id_col),
        (F.row_number().over(w) - 1).cast("long").alias("doc_pos"),
        (prior + F.lit(int(base_offset))).cast("long").alias("start_offset"),
        (prior + F.lit(int(base_offset)) + F.col(token_col))
        .cast("long")
        .alias("end_offset"),
    )


def padding_waste_report(
    df: DataFrame,
    boundaries: Sequence[int],
    token_col: str = "n_tokens",
    round_to: int = 6,
) -> DataFrame:
    """Padding-waste table for LENGTH-BUCKETED batching (round 10): when
    sequences batch by length bucket instead of packing, every sequence
    pads to its bucket's upper boundary — this table quantifies exactly
    what that costs per bucket, the measured argument for the packing
    family (:func:`greedy_pack` wastes ~(1−fill_ratio); bucketing
    wastes ``pad_frac`` — compare them on YOUR length distribution,
    not folklore).

    ``boundaries`` are ascending bucket upper bounds; a document of
    ``t`` tokens lands in the first bucket with ``t <= bound``
    (documents past the last bound land in an overflow bucket padded to
    the max document length — the dynamic-shapes fallback every
    bucketed loader implements). One map-side bucket assignment + one
    |buckets|-row aggregate; the overflow pad target needs that
    bucket's max, a second grouped aggregate over the same shuffle key.

    Returns per bucket: ``(bucket_bound, n_docs, sum_tokens,
    sum_padded, pad_tokens, pad_frac)`` — ``pad_frac`` is the fraction
    of compute spent on padding in that bucket.
    """
    bounds = sorted(int(b) for b in boundaries)
    if not bounds:
        raise ValueError("boundaries must be non-empty")
    t = F.col(token_col).cast("long")
    bound = F.lit(None).cast("long")
    for b in reversed(bounds):
        bound = F.when(t <= F.lit(b), F.lit(b)).otherwise(bound)
    base = df.where(t.isNotNull()).select(
        t.alias("__t"), bound.alias("__b")
    )
    agg = base.groupBy("__b").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__t").alias("sum_tokens"),
        F.max("__t").alias("__maxt"),
    )
    pad_target = F.coalesce(F.col("__b"), F.col("__maxt"))
    padded = F.col("n_docs") * pad_target
    return agg.select(
        pad_target.alias("bucket_bound"),
        "n_docs",
        "sum_tokens",
        padded.alias("sum_padded"),
        (padded - F.col("sum_tokens")).alias("pad_tokens"),
        F.round(
            F.when(padded > 0, (padded - F.col("sum_tokens")) / padded)
            .otherwise(F.lit(0.0)),
            round_to,
        ).alias("pad_frac"),
    ).orderBy("bucket_bound")


def curriculum_schedule(
    df: DataFrame,
    difficulty_col: str,
    n_phases: int = 4,
    pacing: str = "linear",
    id_col: str = "doc_id",
    out_col: str = "phase",
) -> DataFrame:
    """Competence-based curriculum assignment (round 11; Platanios et
    al. NAACL 2019, "Competence-based Curriculum Learning for NMT"):
    order training data easiest-first by admitting, at phase ``p`` of
    ``n_phases``, only the easiest ``c(p)`` fraction of the corpus —
    ``c(p) = ((p+1)/n)`` for linear pacing, ``sqrt((p+1)/n)`` for the
    paper's root pacing (front-loads easy data less aggressively).
    Each document's emitted ``out_col`` is the FIRST phase that admits
    it: the smallest ``p`` with ``rank ≤ floor(c(p) · N)`` over the
    exact difficulty rank (ascending ``difficulty_col``, ties to the
    smaller ``id_col`` — deterministic at any partitioning).

    The assignment is closed-form from the rank — one global rank
    window (the corpus-ordering shuffle a curriculum inherently needs;
    at 100 TB use the same range-partition + broadcast-offsets recipe
    as :func:`~.transform.shuffle_corpus` if a total sort is too hot)
    plus a 1-row count broadcast; phase thresholds are exact integer
    ``floor`` arithmetic replayable in SQL. Downstream, feed phase
    ``p``'s training mix with ``WHERE phase <= p``.

    Returns ``df`` + ``(difficulty_rank, out_col)``.
    """
    from pyspark.sql.window import Window

    if pacing not in ("linear", "sqrt"):
        raise ValueError(f"pacing must be 'linear' or 'sqrt', got {pacing!r}")
    if n_phases < 1:
        raise ValueError(f"n_phases must be >= 1, got {n_phases}")
    w = Window.orderBy(F.col(difficulty_col).asc(), F.col(id_col).asc())
    ranked = df.withColumn("difficulty_rank", F.row_number().over(w))
    n = ranked.agg(F.count(F.lit(1)).alias("__n"))
    # first admitting phase: smallest p with rank <= floor(c(p)*N).
    # Exact comparisons (integer rank makes floor exact): linear ->
    # rank*n_phases <= (p+1)*N in longs; sqrt -> rank²·n_phases <=
    # (p+1)·N² in DECIMAL(38,0) (N² overflows int64 past ~3e9 rows)
    r = F.col("difficulty_rank").cast("long")
    nn = F.col("__n").cast("long")
    rd = F.col("difficulty_rank").cast("decimal(38,0)")
    nd = F.col("__n").cast("decimal(38,0)")
    phase = F.lit(n_phases - 1).cast("int")
    for p in reversed(range(n_phases - 1)):
        if pacing == "linear":
            admitted = r * n_phases <= (p + 1) * nn
        else:
            admitted = rd * rd * F.lit(n_phases).cast(
                "decimal(38,0)"
            ) <= F.lit(p + 1).cast("decimal(38,0)") * nd * nd
        phase = F.when(admitted, F.lit(p)).otherwise(phase)
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(out_col, phase)
        .drop("__n")
    )
