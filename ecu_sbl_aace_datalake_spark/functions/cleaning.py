"""Row-level cleaning/standardization functions.

Reference parity (common.py): five row-level UDFs plus driver-side helpers:
- ``custom_initcap`` (631-661): init-cap each token split on the delimiters
  space ``'`` ``-`` `` ` `` ``/``, preserving delimiters; leaves mixed-case
  tokens (McDonald) alone; lower-cases particles ``de``/``of``; None-safe.
- ``fixUpName`` (672-684): ','-strip → None; custom_initcap; truncate at
  first ``(``; flip ``"Last, First"`` → ``"First Last"``.
- ``garbageCLO`` (695-699): True if falsy / non-str / 'n/a'
  (case-insensitive, trimmed). Natively expressible → :func:`garbage_clo_col`
  is a pure Column expression (JVM-side, no Python worker at all).
- ``fixDodgyThing`` (572-585) + ``fixDodgyStatuses`` (708-709) /
  ``fixDodgyAssessLevel`` (720-721): None→'None Supplied', str-coerce,
  .title(), fuzzy-snap to the first legit value with difflib ratio >= 0.6
  (``are_strings_similar`` 554-564).

Execution model: the reference registered plain-Python ``F.udf``s
(common.py:664,687,700,712,724) — per-row pickling, the slowest path in
Spark. Here every UDF is an Arrow-batched ``pandas_udf`` (10-100x faster at
scale), and ``garbage_clo`` additionally gets a native-expression form that
stays inside whole-stage codegen.
"""

from __future__ import annotations

import difflib
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType

# ---------------------------------------------------------------- plain forms

_DELIMS = (" ", "'", "-", "`", "/")
_PARTICLES = {"de", "of"}
_DELIM_SPLIT = re.compile("(" + "|".join(re.escape(d) for d in _DELIMS) + ")")


def _is_mixed_case(s: str) -> bool:
    return any(c.isupper() for c in s) and any(c.islower() for c in s)


def are_strings_similar(a: str, b: str, threshold: float = 0.6) -> bool:
    """difflib SequenceMatcher ratio >= threshold (reference
    ``are_strings_similar`` common.py:554-564)."""
    if a is None or b is None:
        return False
    return difflib.SequenceMatcher(None, a, b).ratio() >= threshold


def custom_initcap(value) -> str | None:
    """Init-cap tokens split on space/'/-/`// preserving the delimiters;
    mixed-case tokens (McDonald, O'Brien inner caps) left alone; particles
    de/of lower-cased; falsy input → None; non-str input str()-coerced
    (reference ``custom_initcap`` common.py:631-661 — delimiter set and
    check ORDER both mirrored exactly: the mixed-case check precedes the
    particle check, so "De" survives as "De" while "DE"/"de" → "de").

    Differs from builtin ``initcap`` which lower-cases the rest of every
    token and has no mixed-case/particle rules.
    """
    if not value:
        return None
    if not isinstance(value, str):
        value = str(value)
    out: list[str] = []
    for tok in _DELIM_SPLIT.split(value):
        if tok in _DELIMS or _is_mixed_case(tok):
            out.append(tok)
        elif tok.lower() in _PARTICLES:
            out.append(tok.lower())
        else:
            out.append(tok.capitalize())
    return "".join(out)


def fix_up_name(value) -> str | None:
    """Name normalizer (reference ``fixUpName`` common.py:672-684): falsy
    input returned as-is (None→None, ''→''); bare ','→None; non-str
    str()-coerced; init-cap; truncate at first '('; comma parts REVERSED
    and space-joined ('Last, First' → 'First Last'; all commas split, not
    just the first — reference reverses every part).

    The reference coerces non-str AFTER calling ``.strip()`` on the value
    (latent AttributeError, common.py:676-679); here coercion comes first
    so e.g. ints are cleaned instead of raising.
    """
    if not value:
        return value
    if not isinstance(value, str):
        value = str(value)
    if value.strip() == ",":
        return None
    v = custom_initcap(value)
    v = v.split("(", 1)[0].strip()
    if "," in v:
        v = " ".join(p.strip() for p in reversed(v.split(",")))
    return v


def garbage_clo(value) -> bool:
    """True if value is falsy / non-str / 'n/a' case-insensitively trimmed
    (reference ``garbageCLO`` common.py:695-699)."""
    if not value or not isinstance(value, str):
        return True
    return value.strip().lower() == "n/a"


STATUS_LEGIT = ["Completed", "Discontinued", "Enrolled"]
ASSESS_LEVEL_LEGIT = ["Consolidated", "Demonstrated"]


def fix_dodgy_thing(value, legit_values: list[str], threshold: float = 0.6) -> str:
    """Falsy→'None Supplied' (reference uses ``if not value`` — empty
    string and 0 included, common.py:575); str-coerce; .title(); fuzzy-snap
    to the FIRST legit value with difflib ratio >= 0.6 (reference
    ``fixDodgyThing`` common.py:572-585)."""
    if not value:
        value = "None Supplied"
    v = str(value).title()
    if v in legit_values:
        return v
    for legit in legit_values:
        if are_strings_similar(v, legit, threshold):
            return legit
    return v


def fix_dodgy_statuses(value) -> str:
    """Reference ``fixDodgyStatuses`` common.py:708-709."""
    return fix_dodgy_thing(value, STATUS_LEGIT)


def fix_dodgy_assess_level(value) -> str:
    """Reference ``fixDodgyAssessLevel`` common.py:720-721."""
    return fix_dodgy_thing(value, ASSESS_LEVEL_LEGIT)


# ------------------------------------------------- vectorized (Arrow) UDFs

@pandas_udf(StringType())
def custom_initcap_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: custom_initcap(v) if v is not None else None)


@pandas_udf(StringType())
def fix_up_name_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: fix_up_name(v) if v is not None else None)


@pandas_udf(BooleanType())
def garbage_clo_udf(s: pd.Series) -> pd.Series:
    return s.map(garbage_clo)


@pandas_udf(StringType())
def fix_dodgy_statuses_udf(s: pd.Series) -> pd.Series:
    return s.map(fix_dodgy_statuses)


@pandas_udf(StringType())
def fix_dodgy_assess_level_udf(s: pd.Series) -> pd.Series:
    return s.map(fix_dodgy_assess_level)


# ------------------------------------------------- native-expression forms

def garbage_clo_col(col: str | Column) -> Column:
    """Native (JVM, codegen) form of ``garbage_clo``: NULL/empty/'n/a' —
    no Python worker involved. Prefer this in hot paths; the pandas_udf
    exists only for API parity."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | (F.trim(c) == "") | (F.lower(F.trim(c)) == F.lit("n/a"))
