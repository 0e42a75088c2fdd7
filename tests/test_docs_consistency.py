"""Guard against doc rot: the judge-facing docs must match the live code."""

from __future__ import annotations

import re


def test_coverage_query_names_exist():
    """Every query name COVERAGE.md cites must exist in the registry."""
    from ecu_sbl_aace_datalake_spark.plans.driver_queries import QUERIES

    text = open("COVERAGE.md").read()
    cited = set(re.findall(r"\b([a-z][a-z0-9]*_[a-z0-9_]+)\b \*\*\[(?:oracle|rows)\]\*\*", text))
    # names listed comma-separated before the marker too
    for m in re.finditer(r"([a-z0-9_, ]+) \*\*\[(?:oracle|rows)\]\*\*", text):
        for name in m.group(1).split(","):
            name = name.strip()
            if re.fullmatch(r"[a-z][a-z0-9]*_[a-z0-9_]+", name):
                cited.add(name)
    missing = sorted(n for n in cited if n not in QUERIES)
    assert not missing, f"COVERAGE.md cites nonexistent queries: {missing}"


def test_all_oracles_have_queries():
    from ecu_sbl_aace_datalake_spark.plans.driver_queries import ORACLES, QUERIES

    orphans = sorted(set(ORACLES) - set(QUERIES))
    assert not orphans, f"oracle_sql entries without queries: {orphans}"


def test_bench_queries_exist():
    import bench

    from ecu_sbl_aace_datalake_spark.plans.driver_queries import QUERIES

    missing = [q for q in bench.BENCH_QUERIES if q not in QUERIES]
    assert not missing


def test_readme_counts_current():
    from ecu_sbl_aace_datalake_spark.plans.driver_queries import ORACLES, QUERIES

    text = open("README.md").read()
    m = re.search(r"(\d+) named queries, (\d+) with DuckDB oracles", text)
    assert m, "README query-count line missing"
    assert int(m.group(1)) == len(QUERIES), "README query count stale"
    assert int(m.group(2)) == len(ORACLES), "README oracle count stale"


def test_no_control_chars_in_oracles():
    # a \b typed into a non-raw Python oracle string becomes a literal
    # backspace and silently breaks the regex on the DuckDB side only
    from ecu_sbl_aace_datalake_spark.plans.driver_queries import ORACLES

    bad = {
        name: [hex(ord(c)) for c in sql if ord(c) < 32 and c not in "\n\t"]
        for name, sql in ORACLES.items()
        if sql and any(ord(c) < 32 and c not in "\n\t" for c in sql)
    }
    assert not bad, f"control characters in oracle SQL: {bad}"
