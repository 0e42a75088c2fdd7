"""PII redaction for text corpora — the pre-training scrub pass.

North-star extension: training-data pipelines redact emails, phone numbers,
and IP addresses before anything else sees the text. Pure regexp_replace
chain — JVM-side, codegen-friendly, no Python in the hot path. Patterns are
deliberately conservative (precision over recall) and use syntax that
behaves identically across Java regex and RE2-family engines so results are
oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# pattern → replacement, applied in order (email first so phone/IP digits
# inside addresses never match partially)
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "[PHONE]"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
]


def redact_pii_col(col: str | Column) -> Column:
    """Replace emails/phones/IPv4s with typed placeholders."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, replacement in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, replacement)
    return c


def redact_pii(text: str) -> str:
    """Driver-side equivalent (for tests / single values)."""
    import re

    for pattern, replacement in PII_PATTERNS:
        text = re.sub(pattern, replacement, text)
    return text


def pii_counts(col: str | Column) -> list[Column]:
    """Per-document PII hit counts (one ``regexp_count`` per pattern
    type): ``n_emails``, ``n_phones``, ``n_ips``. Map-side expressions —
    feed :func:`pii_prevalence_report` for the corpus rollup."""
    c = F.col(col) if isinstance(col, str) else col
    names = ["n_emails", "n_phones", "n_ips"]
    return [
        F.regexp_count(c, F.lit(p)).cast("long").alias(n)
        for (p, _), n in zip(PII_PATTERNS, names)
    ]


def pii_prevalence_report(df, group_col: str = "source", text_col: str = "text"):
    """Per-group PII prevalence — the risk table a curator reads BEFORE
    deciding whether a source needs redaction at all: document counts,
    per-type hit totals, and the fraction of documents carrying any PII.
    ONE aggregate on the group key (map-side partial combine); the same
    conservative patterns as :func:`redact_pii_col`, so "0 hits here"
    and "nothing redacted there" can never disagree."""
    counted = df.select(
        F.col(group_col), *pii_counts(text_col)
    )
    any_pii = (
        (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) > 0
    ).cast("int")
    return (
        counted.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_emails").alias("total_emails"),
            F.sum("n_phones").alias("total_phones"),
            F.sum("n_ips").alias("total_ips"),
            F.round(F.sum(any_pii) / F.count(F.lit(1)), 6).alias(
                "frac_docs_with_pii"
            ),
        )
        .orderBy(group_col)
    )
