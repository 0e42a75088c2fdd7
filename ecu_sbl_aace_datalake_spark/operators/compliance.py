"""License / usage-rights tagging and opt-out screening — the compliance
gate of a training-data pipeline: tag each document with the license its
text declares (SPDX-style detection), flag crawler/TDM opt-out
directives, and roll both up into a per-source compliance report that
decides which slices are safe to train on.

Reference parity note: the reference engine (common.py) has no
compliance tooling — this module is part of the mandated
training-data-pipeline extension surface (The Stack / StarCoder license
filtering, Kocetkov et al. 2022; C4's "curly brace + lorem ipsum"
exclusions are the same shape at a different target).

Everything here is pure Column expressions — one lowercase pass plus a
frozen, ordered regexp ladder — so tagging is map-side, stays inside
whole-stage codegen, and a SQL oracle can replicate it verbatim. At
100 TB: tagging adds zero shuffles; the report is one aggregate on the
group key.

Detection contract (documented, first-match-wins):
1. An explicit ``SPDX-License-Identifier: <id>`` line wins outright and
   is matched against the frozen id set (case-insensitive).
2. Otherwise the free-text ladder runs most-specific-first: AGPL and
   LGPL before GPL (an "lgpl-3.0" mention must not fall through to the
   bare ``gpl-3`` pattern); CC NC variants before SA before plain BY;
   named licenses before the bare "all rights reserved" proprietary
   catch-all.
3. No match → license_id NULL, family 'unknown'.

The pattern table is a frozen approximation (real license detection uses
full-text similarity against the SPDX corpus, e.g. ScanCode); the
approximation is deterministic, documented, and catches the notice
headers that real corpora actually carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "LICENSE_PATTERNS",
    "LICENSE_FAMILY",
    "OPT_OUT_PATTERNS",
    "SPDX_RE",
    "license_id_col",
    "license_family_col",
    "opt_out_col",
    "tag_licenses",
    "compliance_report",
]

# (license_id, lowercase regexp over the document text) — ORDER MATTERS:
# first match wins, most-specific entries first. Regexes are kept to the
# RE2-compatible subset (no backreferences/lookaround) so the DuckDB
# oracle can run the identical patterns.
LICENSE_PATTERNS: tuple[tuple[str, str], ...] = (
    ("AGPL-3.0", r"gnu affero general public license|\bagpl[- ]?v?3"),
    ("LGPL-2.1", r"gnu lesser general public license|\blgpl\b"),
    ("GPL-3.0", r"gnu general public license[,;]? (as published.{0,40})?version 3|\bgpl[- ]?v?3"),
    ("GPL-2.0", r"gnu general public license[,;]? (as published.{0,40})?version 2|\bgpl[- ]?v?2"),
    ("Apache-2.0", r"apache license[,;]? version 2\.0|apache[- ]2\.0"),
    ("MPL-2.0", r"mozilla public license|\bmpl[- ]?2\.0"),
    ("BSD-3-Clause", r"bsd 3[- ]clause|bsd-3-clause|redistribution and use in source and binary forms"),
    ("MIT", r"mit license|permission is hereby granted, free of charge"),
    ("Unlicense", r"this is free and unencumbered software"),
    ("CC0-1.0", r"\bcc0\b|public domain dedication"),
    ("CC-BY-NC-4.0", r"creative commons attribution[- ]noncommercial|\bcc[- ]by[- ]nc"),
    ("CC-BY-SA-4.0", r"creative commons attribution[- ]sharealike|\bcc[- ]by[- ]sa"),
    ("CC-BY-4.0", r"creative commons attribution|\bcc[- ]by\b"),
    ("Proprietary", r"all rights reserved"),
)

# rights family each id belongs to — drives the keep/drop policy
LICENSE_FAMILY: dict[str, str] = {
    "MIT": "permissive",
    "Apache-2.0": "permissive",
    "BSD-3-Clause": "permissive",
    "CC-BY-4.0": "permissive",
    "MPL-2.0": "weak-copyleft",
    "LGPL-2.1": "weak-copyleft",
    "GPL-2.0": "copyleft",
    "GPL-3.0": "copyleft",
    "AGPL-3.0": "copyleft",
    "CC-BY-SA-4.0": "copyleft",
    "CC-BY-NC-4.0": "noncommercial",
    "CC0-1.0": "public-domain",
    "Unlicense": "public-domain",
    "Proprietary": "proprietary",
}

# canonical SPDX short-id line (The Stack keys its filtering off this)
SPDX_RE = r"spdx-license-identifier:\s*([a-z0-9.+-]+)"

# TDM / AI-training opt-out signals (robots meta tokens, TDM Reservation
# Protocol, ai.txt-style directives) — any hit sets opted_out
OPT_OUT_PATTERNS: tuple[tuple[str, str], ...] = (
    ("noai", r"\bnoai\b|\bnoimageai\b|\bnotrain\b"),
    ("noindex", r"\bnoindex\b"),
    ("tdm_reserved", r"tdm-reservation\s*[:=]\s*1|tdmrep"),
)

_SPDX_CANON = {i.lower(): i for i in LICENSE_FAMILY}


def license_id_col(text_col) -> F.Column:
    """License id for a text column: the SPDX identifier line when
    present (frozen id set), else the first-match free-text ladder,
    else NULL. One lowercase pass; pure regexp expressions."""
    low = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    spdx = F.regexp_extract(low, SPDX_RE, 1)
    spdx_id = F.when(spdx == "", F.lit(None).cast("string"))
    for raw, canon in _SPDX_CANON.items():
        spdx_id = spdx_id.when(spdx == raw, F.lit(canon))
    spdx_id = spdx_id.otherwise(F.lit(None).cast("string"))

    ladder = F.lit(None).cast("string")
    expr = F.when(spdx_id.isNotNull(), spdx_id)
    for lic, pat in LICENSE_PATTERNS:
        expr = expr.when(low.rlike(pat), F.lit(lic))
    return expr.otherwise(ladder)


def _family_col(lic: F.Column) -> F.Column:
    expr = F.when(lic.isNull(), F.lit("unknown"))
    for lid, fam in LICENSE_FAMILY.items():
        expr = expr.when(lic == lid, F.lit(fam))
    # an SPDX id outside the frozen set (can't happen via license_id_col,
    # but the column form is reusable on user-supplied ids)
    return expr.otherwise(F.lit("unknown"))


def license_family_col(text_col) -> F.Column:
    """Rights family for a text column in one expression:
    ``license_id_col`` composed with the family mapping ('unknown' for
    undetected). The gate form used by pipeline/streaming doors."""
    return _family_col(license_id_col(text_col))


def opt_out_col(text_col) -> F.Column:
    """TRUE when the text carries any TDM/AI opt-out directive."""
    low = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    out = F.lit(False)
    for _, pat in OPT_OUT_PATTERNS:
        out = out | low.rlike(pat)
    return out


def tag_licenses(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``license_id`` / ``license_family`` / ``opted_out`` columns.
    Map-side only — zero shuffles, whole-stage codegen throughout."""
    lic = license_id_col(text_col)
    return (
        df.withColumn("license_id", lic)
        .withColumn("license_family", _family_col(F.col("license_id")))
        .withColumn("opted_out", opt_out_col(text_col))
    )


def compliance_report(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-group compliance rollup: document counts by rights family plus
    the opt-out rate — the table a data curator reads to decide which
    sources are trainable. ONE aggregate on the group key (map-side
    partial combine); rates rounded to 6dp for cross-engine stability."""
    tagged = tag_licenses(df, text_col=text_col)
    n = F.count(F.lit(1))

    def frac(cond) -> F.Column:
        return F.round(F.sum(cond.cast("int")) / n, 6)

    fam = F.col("license_family")
    return (
        tagged.groupBy(group_col)
        .agg(
            n.alias("n_docs"),
            F.sum((fam != "unknown").cast("int")).alias("n_licensed"),
            frac(fam.isin("permissive", "public-domain")).alias(
                "frac_permissive"
            ),
            frac(fam.isin("copyleft", "weak-copyleft")).alias(
                "frac_copyleft"
            ),
            frac(fam == "noncommercial").alias("frac_noncommercial"),
            frac(fam == "proprietary").alias("frac_proprietary"),
            frac(F.col("opted_out")).alias("frac_opted_out"),
        )
        .orderBy(group_col)
    )
