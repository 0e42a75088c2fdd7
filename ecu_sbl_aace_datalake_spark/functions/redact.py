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
