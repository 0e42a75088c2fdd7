"""Differential fuzz in CI: seeded random SQL on Spark vs DuckDB."""

from __future__ import annotations


def test_differential_fuzz_seeded(spark, sf_dir):
    import sys

    sys.path.insert(0, ".")
    from tools.fuzz_differential import run_fuzz

    # sf0.001 for speed; seed fixed so CI is deterministic
    passed, failures = run_fuzz(n=25, seed=11, sf_dir=sf_dir)
    assert not failures, failures[:3]
    assert passed == 25
