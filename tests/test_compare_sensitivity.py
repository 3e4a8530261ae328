"""Mutation sensitivity of the correctness gate itself: the comparator
(`backup_repo_spark.testing.compare`, the driver-gate mirror every other
test relies on) must CATCH value/row/column drift and must NOT flag
row-order or column-order permutations. A gate that silently passes
mutations proves nothing; this file proves the gate."""

from __future__ import annotations

import pandas as pd
import pytest

from backup_repo_spark.testing import compare, hard_problems


@pytest.fixture()
def frame() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "k": [1, 2, 3, 4],
            "name": ["a", "b", "c", "d"],
            "amt": [1.5, 2.5, 3.5, 4.5],
        }
    )


def test_identical_frames_pass(frame):
    assert not hard_problems(compare(frame, frame.copy()))


def test_row_order_is_ignored(frame):
    shuffled = frame.iloc[[2, 0, 3, 1]].reset_index(drop=True)
    assert not hard_problems(compare(frame, shuffled))


def test_column_order_is_ignored(frame):
    assert not hard_problems(compare(frame, frame[["amt", "k", "name"]]))


def test_single_value_change_caught(frame):
    bad = frame.copy()
    bad.loc[2, "amt"] = 3.6
    assert hard_problems(compare(frame, bad))


def test_string_value_change_caught(frame):
    bad = frame.copy()
    bad.loc[0, "name"] = "z"
    assert hard_problems(compare(frame, bad))


def test_row_count_change_caught(frame):
    assert hard_problems(compare(frame, frame.iloc[:3]))


def test_duplicated_row_caught(frame):
    dup = pd.concat([frame.iloc[:3], frame.iloc[[2]]], ignore_index=True)
    assert hard_problems(compare(frame, dup))


def test_column_rename_caught(frame):
    assert hard_problems(compare(frame, frame.rename(columns={"amt": "amount"})))


def test_int_float_width_is_tolerated(frame):
    widened = frame.copy()
    widened["k"] = widened["k"].astype("int32")
    assert not hard_problems(compare(frame, widened))


def test_float_ulp_noise_is_tolerated_exact_diff_caught(frame):
    close = frame.copy()
    close["amt"] = close["amt"] + 1e-12  # within rtol — sum-order ulp noise
    assert not hard_problems(compare(frame, close))
    far = frame.copy()
    far["amt"] = far["amt"] + 1e-3
    assert hard_problems(compare(frame, far))


def test_null_vs_value_caught(frame):
    bad = frame.copy()
    bad.loc[1, "name"] = None
    assert hard_problems(compare(frame, bad))
