"""Unit tests for scale_sweep's regression-reprobe selection — the pure
half of the --reprobe-regressions protocol (VERDICT r7 #6). No Spark
session needed; the measurement half is exercised by the per-round sweep
itself (SCALESWEEP_r{N}.json's `reprobe` stamp).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))

from scale_sweep import _regressed_keys  # noqa: E402


def test_flags_doubled_ratio_only():
    prior = {"a": {"ratio": 3.0}, "b": {"ratio": 5.0}, "c": {"ratio": 2.0}}
    now = {"a": {"ratio": 6.0}, "b": {"ratio": 9.9}, "c": {"ratio": 3.9}}
    # a doubled exactly (>= 2x flags), b rose 1.98x (under), c rose 1.95x
    assert _regressed_keys(now, prior) == ["a"]


def test_skips_keys_without_comparable_ratios():
    prior = {"a": {"ratio": 3.0}, "e": {"err": "boom"}}
    now = {
        "a": {"err": "boom"},        # errored this sweep: nothing to re-probe
        "d": {"ratio": 50.0},        # new key, no prior record: not a regression
        "e": {"ratio": 4.0},         # prior errored: no baseline to double
    }
    assert _regressed_keys(now, prior) == []


def test_sorted_and_factor_override():
    prior = {"x": {"ratio": 1.0}, "y": {"ratio": 1.0}}
    now = {"y": {"ratio": 1.6}, "x": {"ratio": 1.7}}
    assert _regressed_keys(now, prior, factor=1.5) == ["x", "y"]
    assert _regressed_keys(now, prior) == []
