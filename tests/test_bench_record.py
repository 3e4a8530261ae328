"""Unit tests for bench.py's record parsing and A/B statistic selection —
the pure-python half of the dispersion/A-B protocol (VERDICT r6 #2). No
Spark session needed.
"""

from __future__ import annotations

import json

import pytest

import bench


def test_bench_record_takes_last_json_line_and_skips_noise():
    out = (
        "Using Spark's default log4j profile: ...\n"
        '{"metric": "old", "value": 9.9}\n'
        "some stray stderr-ish line\n"
        '{"metric": "bench_total_best7", "value": 2.8, "median": 3.0}\n'
    )
    rec = bench._bench_record(out)
    assert rec["metric"] == "bench_total_best7"
    assert rec["median"] == 3.0


def test_bench_record_raises_without_json():
    with pytest.raises(RuntimeError):
        bench._bench_record("no json here\nstill none\n")


def test_ab_stat_uses_median_only_when_all_records_stamp_it():
    new = {"value": 2.8, "median": 3.0}
    old = {"value": 2.9}  # pre-round-7 best-of-3 format
    assert bench._ab_stat([new, new]) == "median"
    # mixed formats MUST fall back to value on both sides: best-of-N vs
    # median is the cross-format bias the first --ab smoke run exposed
    assert bench._ab_stat([old, new]) == "value"
    assert bench._ab_stat([old, old]) == "value"


def test_headline_record_contract_fields():
    """The dispersion-stamped record must keep the driver contract fields
    (metric/value/unit/queries/sf) and add runs/median/spread — pinned
    here so a refactor cannot silently drop the dispersion evidence."""
    sample = {
        "metric": f"bench_total_best{bench.PASSES}",
        "value": 2.8,
        "unit": "sec",
        "queries": {m: 0.1 for m in bench.BENCH_QUERIES},
        "sf": 0.1,
        "passes": bench.PASSES,
        "runs": [3.0] * bench.PASSES,
        "median": 3.0,
        "spread": 0.0,
    }
    # shape-check only: json round-trip + required keys
    rec = json.loads(json.dumps(sample))
    for k in ("metric", "value", "unit", "queries", "sf", "runs", "median", "spread"):
        assert k in rec
    assert len(rec["runs"]) == bench.PASSES
