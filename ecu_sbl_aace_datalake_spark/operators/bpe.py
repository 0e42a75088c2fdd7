"""From-scratch BPE tokenizer: corpus-trained merges + merge-table encode.

LLM-data-pipeline extension (SURVEY.md §2.13 text analysis; the reference
engine has no tokenizer — its text surface stops at cleanString,
reference common.py:609-661). Every real pre-training pipeline budgets
sequence packing and mixture sampling by SUBWORD tokens, not whitespace
tokens; this module supplies those counts with the classic byte-pair
encoding algorithm (Sennrich et al. 2016, the GPT-2 merge-table form).

Scale design (100 TB posture):

- **Training** is split into the corpus-proportional part and the
  vocabulary-proportional part, exactly as the standard implementations
  (HuggingFace tokenizers, SentencePiece) do: ONE distributed word-count
  shuffle reduces the corpus to a (word, count) frequency table, the
  heavy tail is capped deterministically (count desc, word asc → top
  ``max_words``; plus ``min_count``), and the merge loop runs driver-side
  over that bounded table — O(max_words · num_merges) local work,
  independent of corpus size. Iterating the merge loop IN Spark would
  shuffle the corpus ``num_merges`` times for a result identical to the
  word-frequency formulation (BPE statistics depend only on word counts).
- **Encoding** is likewise vocabulary-bounded: the per-document work is a
  split + explode + broadcast hash join; the Python (pandas UDF) encode
  runs once per DISTINCT word, never once per occurrence. At 100 TB the
  distinct-word table is bounded by language vocabulary, so the slow path
  costs O(|vocab|) while the corpus-proportional path stays JVM-side.

Encode semantics (both the Python implementation and the DuckDB
recursive-CTE oracle in plans/driver_queries.py): repeatedly merge the
leftmost occurrence of the lowest-rank applicable pair until no merge
applies. This one-at-a-time form is equivalent to the usual
"merge all occurrences of the lowest-rank pair left-to-right" because
merging an occurrence of pair (a,b) can only destroy, never create,
other occurrences of (a,b) (the new token ``ab`` differs from both
halves), but it is directly expressible as a recursive CTE — which is
what makes the encode stage oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: regex used to split documents into words — whitespace, mirrored by the
#: oracle's regexp_split_to_array(text, '\s+')
WORD_SPLIT_RE = r"\s+"

#: GPT-2-style pre-tokenization (round-6, VERDICT r05 item #3): contraction
#: suffixes, then letter / digit / punctuation runs with the leading-space
#: convention, then whitespace runs. Deliberate deviation from the exact
#: GPT-2 pattern: the ``\s+(?!\S)`` lookahead is dropped because RE2 (the
#: DuckDB oracle's engine) has no lookahead — so a run of 2+ spaces stays
#: one whitespace token and the following word carries no leading space
#: (GPT-2 would split the run). Verified char-identical between Java
#: (Spark regexp_extract_all) and RE2 (DuckDB) on mixed fixtures:
#: leftmost-first alternation + greedy quantifiers agree in both.
GPT2_PRETOK_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte→unicode alphabet (public algorithm from the GPT-2
    paper's released tokenizer): printable latin bytes map to themselves,
    every other byte to a printable codepoint 256+n — so ANY utf-8 string
    becomes a sequence of printable symbols and no token is ever OOV
    (byte fallback). Space maps to 'Ġ' (U+0120), which is what makes the
    leading-space convention visible in merge tables."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


_B2U = bytes_to_unicode()


def map_word_bytes(word: str) -> str:
    """utf-8 encode then byte→unicode map: the byte-level symbol string
    whose CHARS are the BPE base alphabet."""
    return "".join(_B2U[b] for b in word.encode("utf-8"))

#: FIXED byte-level merge table: ``bpe_train(documents, num_merges=80,
#: byte_level=True)`` on the sf0.01 fixture corpus — GPT-2 pre-split +
#: byte-symbol alphabet, so the leading-space convention is visible as
#: 'Ġ' merges. 80 < the 127-merge convergence point. tests/test_bpe.py
#: re-derives the prefix from pre-token counts to pin provenance.
MERGES_DOCS_BYTES_V1: list[tuple[str, str]] = [
    ('Ġ', 's'), ('e', 'r'), ('i', 'n'), ('o', 'w'), ('o', 'r'),
    ('m', 'er'), ('a', 't'), ('l', 'u'), ('Ġ', 'c'), ('a', 's'),
    ('Ġ', 'b'), ('Ġ', 'v'), ('a', 'r'), ('p', 'ar'), ('Ġ', 'f'),
    ('Ġ', 'a'), ('Ġ', 't'), ('j', 'o'), ('jo', 'in'), ('as', 'h'),
    ('h', 'ash'), ('Ġ', 'join'), ('s', 't'), ('r', 'ow'), ('at', 'c'),
    ('atc', 'h'), ('a', 'n'), ('c', 'an'), ('lu', 'm'), ('lum', 'n'),
    ('o', 'lumn'), ('o', 'mer'), ('st', 'omer'), ('u', 'stomer'),
    ('i', 'l'), ('il', 't'), ('ilt', 'er'), ('Ġ', 'hash'), ('a', 'l'),
    ('al', 'l'), ('m', 'all'), ('Ġ', 'row'), ('Ġs', 'can'), ('g', 'e'),
    ('l', 'ow'), ('mer', 'ge'), ('Ġ', 'd'), ('Ġs', 'mall'), ('Ġb', 'atch'),
    ('Ġc', 'olumn'), ('Ġf', 'ilter'), ('c', 't'), ('ct', 'or'),
    ('d', 'er'), ('e', 'ctor'), ('or', 'der'), ('Ġc', 'ustomer'),
    ('in', 'e'), ('l', 'ine'), ('a', 'b'), ('ab', 'l'), ('abl', 'e'),
    ('at', 'a'), ('u', 'p'), ('Ġs', 'low'), ('g', 'g'), ('Ġ', 'order'),
    ('Ġv', 'ector'), ('a', 'lu'), ('alu', 'e'), ('Ġ', 'merge'), ('e', 'y'),
    ('k', 'ey'), ('Ġ', 'line'), ('Ġd', 'ata'), ('a', 'm'), ('e', 'am'),
    ('r', 'eam'), ('Ġa', 'gg'), ('Ġt', 'able'),
]

#: FIXED whitespace-scheme merge table (legacy default): ``bpe_train(
#: documents, num_merges=60)`` on the sf0.01 fixture corpus (a tokenizer
#: is trained once and then applied as a constant everywhere — this is
#: the constant). 60 < the 89-merge convergence point, so rarer words
#: stay multi-token and subword counts genuinely differ from word
#: counts. tests/test_bpe.py re-derives the prefix from word counts to
#: pin provenance.
MERGES_DOCS_V1: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"), ("s", "mall"),
    ("g", "e"), ("l", "ow"), ("mer", "ge"), ("s", "low"), ("c", "t"),
    ("ct", "or"), ("d", "er"), ("e", "ctor"), ("or", "der"),
    ("v", "ector"), ("in", "e"), ("l", "ine"), ("a", "b"), ("ab", "l"),
    ("abl", "e"), ("at", "a"), ("d", "ata"), ("t", "able"), ("u", "p"),
    ("a", "g"), ("ag", "g"), ("a", "lu"),
]


# ---------------------------------------------------------------------------
# pure-python core (driver-side training loop + per-word encode)
# ---------------------------------------------------------------------------

def _merge_all(syms: list[str], left: str, right: str) -> list[str]:
    """Merge every non-overlapping (left, right) occurrence, left to right."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_merges_from_counts(
    word_counts: Sequence[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE training over a word-frequency table.

    Deterministic: the merged pair each round is the (count desc, pair
    asc) maximum. Stops early when no adjacent pair remains (every word
    fully merged). Returns merges in rank order.
    """
    words: list[tuple[list[str], int]] = [
        (list(w), int(c)) for w, c in word_counts if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = [(_merge_all(s, *best), c) for s, c in words]
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a trained merge table (GPT-2-style loop):
    repeatedly merge all occurrences of the lowest-rank pair present."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = _merge_all(syms, *best_pair)
    return syms


# ---------------------------------------------------------------------------
# spark operators
# ---------------------------------------------------------------------------

def _split_expr(text_col: str, byte_level: bool):
    """The pre-tokenizer: whitespace split (legacy scheme) or GPT-2-style
    regex runs (byte-level scheme). Both are JVM-side expressions."""
    if byte_level:
        return F.regexp_extract_all(F.col(text_col), F.lit(GPT2_PRETOK_RE), 0)
    return F.split(F.col(text_col), WORD_SPLIT_RE)


def word_counts(
    df: DataFrame, text_col: str = "text", byte_level: bool = False
) -> DataFrame:
    """(word, cnt) frequency table — the single corpus-proportional shuffle
    of BPE training. ``byte_level=True`` counts GPT-2-style pre-tokens
    (leading-space words, digit/punct runs, whitespace runs) instead of
    whitespace words; the byte mapping happens later, driver-side, so this
    stage stays JVM-only either way."""
    w = F.explode(_split_expr(text_col, byte_level)).alias("word")
    return (
        df.select(w)
        .where((F.col("word").isNotNull()) & (F.col("word") != ""))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    max_words: int = 65536,
    min_count: int = 1,
    byte_level: bool = False,
) -> list[tuple[str, str]]:
    """Train a BPE merge table on a corpus.

    Spark does the word count; the merge loop runs driver-side over the
    top ``max_words`` (count desc, word asc — deterministic) words with
    count ≥ ``min_count``. See module docstring for why this split is the
    standard, scale-correct formulation.

    ``byte_level=True`` = the real-tokenizer scheme (GPT-2): pre-split
    with :data:`GPT2_PRETOK_RE`, then train over BYTE symbols
    (:func:`map_word_bytes`) so merges like ('Ġ', 'c') capture the
    leading-space convention and byte fallback guarantees no OOV.
    """
    wc = (
        word_counts(df, text_col, byte_level)
        .where(F.col("cnt") >= int(min_count))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(int(max_words))
        .toPandas()
    )
    pairs = list(zip(wc["word"].tolist(), wc["cnt"].tolist()))
    if byte_level:
        pairs = [(map_word_bytes(w), c) for w, c in pairs]
    return train_merges_from_counts(pairs, num_merges)


def _encoded_vocab(
    words: DataFrame,
    merges: Sequence[tuple[str, str]],
    byte_level: bool = False,
) -> DataFrame:
    """DISTINCT words → (word, tokens array, n_tok). The only Python-eval
    stage; cost is O(|vocab|), not corpus size. Byte-level: the raw
    pre-token is byte-mapped before the merge loop, so the join key back
    to the corpus stays the raw string (no Python on the corpus side)."""
    ranks = {(left, right): i for i, (left, right) in enumerate(merges)}

    if byte_level:
        @pandas_udf("array<string>")
        def enc(s: pd.Series) -> pd.Series:
            return s.map(lambda w: encode_word(map_word_bytes(w), ranks))
    else:
        @pandas_udf("array<string>")
        def enc(s: pd.Series) -> pd.Series:
            return s.map(lambda w: encode_word(w, ranks))

    vocab = words.select("__w").distinct()
    return vocab.withColumn("__toks", enc("__w")).withColumn(
        "__nt", F.size("__toks")
    )


def _doc_words(
    df: DataFrame, id_col: str, text_col: str, byte_level: bool = False
) -> DataFrame:
    w = F.explode(_split_expr(text_col, byte_level)).alias("__w")
    return df.select(F.col(id_col), w).where(
        (F.col("__w").isNotNull()) & (F.col("__w") != "")
    )


def bpe_token_counts(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "n_tokens",
    byte_level: bool = False,
) -> DataFrame:
    """Per-document subword token count under a FIXED merge table.

    Returns (id, n_words, ``out_col``); documents with no words get 0/0.
    The packing currency: feed ``out_col`` into packing.chunk_pack /
    greedy_pack / ffd_pack via their ``token_col`` parameter.
    ``byte_level=True``: GPT-2 pre-split + byte-symbol encode (pass a
    merge table trained with the same scheme, e.g.
    :data:`MERGES_DOCS_BYTES_V1`); n_words then counts pre-tokens
    (whitespace runs included — they are real tokens in that scheme).
    """
    words = _doc_words(df, id_col, text_col, byte_level)
    enc = _encoded_vocab(words, merges, byte_level).select("__w", "__nt")
    per_doc = (
        words.join(F.broadcast(enc), "__w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__nt").cast("long").alias(out_col),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce(out_col, F.lit(0)).cast("long").alias(out_col),
        )
    )


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "tokens",
    byte_level: bool = False,
) -> DataFrame:
    """Full per-document token sequence (array<string>), in document
    order. Same vocabulary-bounded encode; reassembly is a posexplode +
    broadcast join + ordered flatten. Byte-level tokens are the mapped
    symbols ('Ġthe', not ' the') — the standard visible form."""
    w = F.posexplode(_split_expr(text_col, byte_level)).alias("__pos", "__w")
    words = df.select(F.col(id_col), w).where(
        (F.col("__w").isNotNull()) & (F.col("__w") != "")
    )
    enc = _encoded_vocab(words, merges, byte_level).select("__w", "__toks")
    return (
        words.join(F.broadcast(enc), "__w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__toks"))),
                    lambda s: s["__toks"],
                )
            ).alias(out_col)
        )
    )


def persist_merges(
    spark,
    lakehouse,
    table_name: str,
    merges: Sequence[tuple[str, str]],
) -> dict:
    """Persist a trained merge table as a lakehouse table (rank, left,
    right) — the tokenizer artifact a pipeline trains once and every later
    job loads. Returns the write info."""
    from ..sources.io import write_table

    df = spark.createDataFrame(
        [(i, left, right) for i, (left, right) in enumerate(merges)],
        "rank int, left string, right string",
    )
    return write_table(lakehouse, table_name, df)


def load_merges(spark, lakehouse, table_name: str) -> list[tuple[str, str]]:
    """Load a persisted merge table back into rank order."""
    from ..sources.catalog import table_path
    from ..sources.io import read_path

    rows = (
        read_path(spark, table_path(lakehouse, table_name))
        .orderBy("rank")
        .collect()
    )
    return [(r["left"], r["right"]) for r in rows]


def bpe_vocab_bytes(merges: Sequence[tuple[str, str]]) -> dict[str, int]:
    """The token→id table for a byte-level merge table, GPT-2 layout:
    ids 0..255 are the byte alphabet in byte order (every input is
    encodable — the no-OOV guarantee), id 256+rank is merge ``rank``'s
    product. Merge products are ≥2 mapped chars so they can never
    collide with the single-char base alphabet."""
    b2u = _B2U
    vocab = {b2u[b]: b for b in range(256)}
    for i, (left, right) in enumerate(merges):
        vocab[left + right] = 256 + i
    return vocab


def bpe_encode_ids(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document TOKEN-ID sequence under a byte-level merge table —
    the artifact a training pipeline actually materializes (ids, not
    strings). Returns long-form ``(id, pos, token_id)`` rows (scalar
    columns — oracle- and parquet-friendly; window-free: pos is computed
    inside the reassembled array, not by a row_number).

    Same vocabulary-bounded cost shape as :func:`bpe_encode`: the Python
    encode runs once per DISTINCT pre-token; the id mapping is a literal
    map lookup (JVM-side)."""
    vocab = bpe_vocab_bytes(merges)
    toks = bpe_encode(df, merges, id_col, text_col, byte_level=True)
    m = F.create_map(
        *[x for t, i in sorted(vocab.items()) for x in (F.lit(t), F.lit(i))]
    )
    return toks.select(
        F.col(id_col),
        F.posexplode(
            F.transform(F.col("tokens"), lambda t: F.element_at(m, t))
        ).alias("pos", "token_id"),
    ).select(
        id_col, F.col("pos").cast("int"), F.col("token_id").cast("int")
    )


def tokenizer_fertility(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    byte_level: bool = True,
) -> DataFrame:
    """Tokenizer FERTILITY audit per group (usually language): subword
    tokens per word and UTF-8 bytes per token under a fixed merge table
    — the multilingual-fairness diagnostic (a tokenizer trained on
    English segments other languages into more, shorter tokens, so the
    same context window holds less of their text and per-token pricing
    taxes them; Petrov et al. 2023). Read this table before fixing a
    per-language TOKEN budget: a fertility-2 language needs twice the
    tokens for the same words, and a byte budget built from
    :func:`~.pipeline.cap_per_language` should divide by THIS table's
    bytes_per_token, not a global average.

    One :func:`bpe_token_counts` pass (distinct-vocab encode, corpus
    work JVM-side) + one aggregate on the group key.

    Returns ``(group, n_docs, n_words, n_tokens, n_bytes, fertility,
    bytes_per_token)`` — fertility = tokens/words, rounded 6dp.
    """
    counts = bpe_token_counts(
        df, merges, id_col=id_col, text_col=text_col, byte_level=byte_level
    )
    base = df.select(
        F.col(id_col),
        F.col(group_col).alias("__g"),
        F.coalesce(F.octet_length(text_col), F.lit(0)).alias("__b"),
    )
    return (
        base.join(counts, id_col)
        .groupBy(F.col("__g").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("__b").alias("n_bytes"),
            F.round(F.sum("n_tokens") / F.sum("n_words"), 6).alias(
                "fertility"
            ),
            F.round(F.sum("__b") / F.sum("n_tokens"), 6).alias(
                "bytes_per_token"
            ),
        )
        .orderBy(group_col)
    )
