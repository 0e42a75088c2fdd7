"""Path-based catalog: the open replacement for Fabric lakehouse dicts.

Reference parity: the reference addresses tables by composed physical paths
``{source}/Tables/{name}`` / ``{source}/Views/{name}`` (common.py:386-392)
inside a Fabric "lakehouse" property dict (common.py:273-351), resolved via
proprietary SemPy/Fabric APIs (``getWorkspace`` common.py:213-224,
``getLakehouseId`` common.py:232-238, ``mountItUp`` common.py:248-263).

This engine keeps the path convention but drops the proprietary resolution:
a :class:`Lakehouse` is just a named root directory (local FS, s3a://,
abfss:// — Spark reads all of them natively, so no mount step exists).
A session-scoped :class:`TableRegistry` replaces the reference's module-global
``ALL_TABLES`` OrderedDict (common.py:93, populated at common.py:536-537) and
feeds relationship discovery, exactly as in the reference but without global
mutable state.
"""

from __future__ import annotations

import posixpath
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class Lakehouse:
    """A named storage root. Open equivalent of the reference's lakehouse
    property dict (common.py:313-327): ``source`` is any Spark-readable URI
    (file:/, s3a://, abfss://...). No mounting needed (common.py:248-263 is
    Fabric-only)."""

    name: str
    source: str
    description: str = ""

    @property
    def tables_path(self) -> str:
        return posixpath.join(self.source, "Tables")

    @property
    def files_path(self) -> str:
        return posixpath.join(self.source, "Files")

    @property
    def views_path(self) -> str:
        return posixpath.join(self.source, "Views")


def table_path(lakehouse: Lakehouse, table_name: str) -> str:
    """``{source}/Tables/{name}`` — reference ``tablePath`` common.py:386-388."""
    return posixpath.join(lakehouse.tables_path, table_name)


def view_path(lakehouse: Lakehouse, view_name: str) -> str:
    """``{source}/Views/{name}`` — reference ``viewPath`` common.py:390-392."""
    return posixpath.join(lakehouse.views_path, view_name)


@dataclass
class TableRegistry:
    """Session-scoped registry of written tables, insertion-ordered.

    Replaces the reference's module-global ``ALL_TABLES`` (common.py:93).
    Each entry holds the DataFrame handle plus write metadata; consumed by
    relationship discovery (reference common.py:995-1076).
    """

    entries: dict[str, dict[str, Any]] = field(default_factory=dict)

    def register(self, name: str, df: Any, info: dict[str, Any]) -> None:
        # dicts preserve insertion order (the reference used OrderedDict)
        self.entries[name] = {"df": df, "info": info}

    def names(self) -> list[str]:
        return list(self.entries)

    def dataframes(self) -> dict[str, Any]:
        return {k: v["df"] for k, v in self.entries.items()}

    def __contains__(self, name: str) -> bool:
        return name in self.entries

    def __getitem__(self, name: str) -> dict[str, Any]:
        return self.entries[name]
