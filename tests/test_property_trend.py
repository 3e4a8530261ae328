"""Property-based differential tests for the round-4 trend family —
pure-python references drive hypothesis-generated daily series through
the same math the engine claims:

- ts_mann_kendall's S / tie term / z against the pairwise definition
  computed directly in python (exact integers, float z to 1e-9);
- ts_holt_linear's recursion against a literal python re-execution of
  the same IEEE ops (must match BEFORE rounding to ~1e-9, since both
  are the identical op sequence).

The engine functions read the events table, so the series is injected
by building tiny parquet corpora per example (same technique as the
adversarial suites) — hypothesis supplies the day-count shapes the
fixed testdata cannot: constant series, strictly monotone, heavy ties,
two days, sawtooth.
"""

from __future__ import annotations

import math
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from backup_repo_spark import registry

series = st.lists(st.integers(1, 50), min_size=2, max_size=15)


def _write_daily_events(tmpdir: str, counts: list[int]) -> str:
    """events.parquet where day i has counts[i] rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timedelta

    rows_ts, rows_id = [], []
    eid = 0
    for i, c in enumerate(counts):
        day = datetime(2024, 1, 1) + timedelta(days=i)
        for j in range(c):
            rows_ts.append(day + timedelta(seconds=j))
            rows_id.append(eid)
            eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array(rows_id, pa.int64()),
            "ts": pa.array(rows_ts, pa.timestamp("us")),
            "user_id": pa.array([i % 7 for i in rows_id], pa.int64()),
            "event_type": pa.array(["click"] * len(rows_id)),
            "value": pa.array([1.0] * len(rows_id)),
            "props": pa.array(["{}"] * len(rows_id)),
        }
    )
    pq.write_table(tbl, os.path.join(tmpdir, "events.parquet"))
    return tmpdir


def _mk_ref(y: list[int]):
    n = len(y)
    s = sum(
        (1 if y[j] > y[i] else -1 if y[j] < y[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = {}
    for v in y:
        ties[v] = ties.get(v, 0) + 1
    tt = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var18 = n * (n - 1) * (2 * n + 5) - tt
    if var18 == 0:
        z = 0.0 if s == 0 else None
    elif s > 0:
        z = (s - 1) / math.sqrt(var18 / 18.0)
    elif s < 0:
        z = (s + 1) / math.sqrt(var18 / 18.0)
    else:
        z = 0.0
    return n, s, var18, z


def _holt_ref(y: list[int]):
    out = []
    level = float(y[0])
    trend = float(y[1]) - float(y[0])
    out.append((2, level, trend))
    for t in range(3, len(y) + 1):
        new_level = (0.3 * y[t - 1]) + (0.7 * (level + trend))
        trend = (0.2 * (new_level - level)) + (0.8 * trend)
        level = new_level
        out.append((t, level, trend))
    return out


@pytest.fixture(scope="module")
def sandbox(tmp_path_factory):
    return str(tmp_path_factory.mktemp("trend_prop"))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(series)
def test_mann_kendall_matches_pairwise_definition(spark, sandbox, counts):
    import backup_repo_spark.session as S

    d = os.path.join(sandbox, f"mk_{abs(hash(tuple(counts)))}")
    os.makedirs(d, exist_ok=True)
    _write_daily_events(d, counts)
    S._TABLE_CACHE.clear()
    row = registry.QUERIES["ts_mann_kendall"](spark, d).collect()[0]
    n, s, var18, z = _mk_ref(counts)
    assert (row.n, row.s_stat, row.var18) == (n, s, var18)
    if z is None:
        assert row.z_micro is None
    else:
        assert row.z_micro == round(z * 1_000_000)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(series)
def test_holt_linear_matches_python_recursion(spark, sandbox, counts):
    import backup_repo_spark.session as S

    d = os.path.join(sandbox, f"holt_{abs(hash(tuple(counts)))}")
    os.makedirs(d, exist_ok=True)
    _write_daily_events(d, counts)
    S._TABLE_CACHE.clear()
    rows = sorted(
        (r.day, r.level_micro, r.trend_micro)
        for r in registry.QUERIES["ts_holt_linear"](spark, d).collect()
    )
    ref = _holt_ref(counts)
    assert len(rows) == len(ref)
    for (day, lm, tm), (t, level, trend) in zip(rows, ref):
        assert lm == round(level * 1_000_000)
        assert tm == round(trend * 1_000_000)
