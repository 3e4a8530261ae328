"""Driver-scale (sf0.01) full-registry gate in CI.

The driver's own correctness gate samples ~50 keys per round, and the fast
differential suite (tests/test_correctness.py) runs at sf0.001 where
empty-group / skew / spill edge cases can hide. This slow test runs the
SAME comparison the driver runs — every registered key vs its DuckDB
oracle — at the driver's sf0.01 scale, so every key has a driver-scale
result on record every round. Marked slow (~8-10 min); deselect with
`-m "not slow"` when iterating locally.
"""

from __future__ import annotations

import pytest

from tools.selfcheck import run_selfcheck, summarize


@pytest.mark.slow
def test_all_keys_at_driver_scale(spark):
    results = run_selfcheck(spark, sf="sf0.01", verbose=False)
    fails = {
        k: v.get("problems", v["status"])
        for k, v in results.items()
        if v["status"] == "fail"
    }
    assert not fails, fails
    c = summarize(results)
    # every key must run, and only the documented by-design keys may be
    # rows-only (fn_hash_spark: Spark-defined hash algorithms)
    rows_only = sorted(k for k, v in results.items() if v["status"] == "rows_only")
    assert rows_only == ["fn_hash_spark"], rows_only
    assert c["ok"] == len(results) - 1
