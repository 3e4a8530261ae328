"""Property-based tests for the algorithmic operators added round 2:
skyline dominance invariants and SymSpell deletion-signature completeness
on hypothesis-generated inputs — edge cases (duplicates, ties, singletons,
empty neighborhoods) the fixed testdata tables cannot produce.

Pure-python reference implementations are the oracles here; the Spark
implementations are exercised through the same session as the rest of the
suite.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


# ---- skyline ---------------------------------------------------------------

points = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=40,
)


def _dominates(q, p):
    """q dominates p: minimize price (x), maximize size (y)."""
    return q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])


def _skyline_ref(pts):
    return sorted({p for p in pts if not any(_dominates(q, p) for q in pts)})


def _skyline_spark(spark, pts):
    from backup_repo_spark.operators.skyline import _local_skyline

    df = spark.createDataFrame(
        [(i, f"p{i}", float(x), y) for i, (x, y) in enumerate(pts)],
        "p_partkey LONG, p_name STRING, p_retailprice DOUBLE, p_size INT",
    ).repartition(3)
    cand = df.mapInPandas(_local_skyline, schema=df.schema)
    dom = cand.select(
        F.col("p_retailprice").alias("q_price"), F.col("p_size").alias("q_size")
    )
    dominated = (
        (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") >= F.col("p_size"))
        & ((F.col("q_price") < F.col("p_retailprice")) | (F.col("q_size") > F.col("p_size")))
    )
    rows = cand.join(F.broadcast(dom), dominated, "left_anti").collect()
    return sorted({(int(r.p_retailprice), r.p_size) for r in rows})


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(points)
def test_skyline_matches_reference_on_random_points(spark, pts):
    assert _skyline_spark(spark, pts) == _skyline_ref(pts)


# ---- SymSpell edit-distance join -------------------------------------------

words = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6),
    min_size=1,
    max_size=15,
    unique=True,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _pairs_ref(names):
    return sorted(
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if _lev(a, b) <= 1
        for a, b in [tuple(sorted((a, b)))]
    )


def _pairs_spark(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "n STRING")
    sigs = df.select(
        "n",
        F.explode(
            F.expr(
                "transform(sequence(0, length(n)), i -> CASE WHEN i = 0 THEN n "
                "ELSE concat(substring(n, 1, i - 1), substring(n, i + 1)) END)"
            )
        ).alias("sig"),
    ).distinct()
    a = sigs.select(F.col("n").alias("name_a"), "sig")
    b = sigs.select(F.col("n").alias("name_b"), "sig")
    cand = (
        a.join(b, "sig")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
        .filter(F.levenshtein("name_a", "name_b") <= 1)
    )
    return sorted((r.name_a, r.name_b) for r in cand.collect())


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(words)
def test_symspell_join_complete_on_random_strings(spark, names):
    assert _pairs_spark(spark, names) == _pairs_ref(sorted(names))


# ---- rank statistics (round 3) ---------------------------------------------
# Brute-force pairwise references for the histogram-first Mann-Whitney U and
# the value-grid Kendall tau-b: hypothesis generates small cohorts with
# heavy ties, and the Spark keys (run on staged parquet, exactly like the
# driver) must reproduce the O(n^2) definitional counts.

import os as _os

import pytest as _pytest

from backup_repo_spark import registry as _registry
from backup_repo_spark.session import TABLES as _TABLES
from tests.conftest import SF_DIR as _SF_DIR


def _stage_orders(tmpdir, f_vals, o_vals):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [("F", v) for v in f_vals] + [("O", v) for v in o_vals]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(rows)), pa.int64()),
                "o_custkey": pa.array([1] * len(rows), pa.int64()),
                "o_orderstatus": pa.array([r[0] for r in rows], pa.string()),
                "o_totalprice": pa.array(
                    [float(r[1]) for r in rows], pa.float64()
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
            }
        ),
        _os.path.join(tmpdir, "orders.parquet"),
    )
    for t in _TABLES:
        p = _os.path.join(tmpdir, f"{t}.parquet")
        if not _os.path.exists(p):
            _os.symlink(f"{_SF_DIR}/{t}.parquet", p)


def _u1_doubled_bruteforce(f_vals, o_vals):
    # doubled U1 = sum over (f, o) pairs of 2*[f > o] + 1*[f == o]
    return sum(
        2 if f > o else (1 if f == o else 0) for f in f_vals for o in o_vals
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    f_vals=st.lists(st.integers(0, 6), min_size=1, max_size=12),
    o_vals=st.lists(st.integers(0, 6), min_size=1, max_size=12),
)
def test_mann_whitney_matches_pairwise_definition(
    spark, tmp_path_factory, f_vals, o_vals
):
    d = str(tmp_path_factory.mktemp("prop_mwu"))
    _stage_orders(d, f_vals, o_vals)
    row = _registry.QUERIES["stats_mann_whitney"](spark, d).collect()[0]
    assert row.n1 == len(f_vals) and row.n2 == len(o_vals)
    assert row.u1_doubled == _u1_doubled_bruteforce(f_vals, o_vals)
    assert row.u1_doubled + row.u2_doubled == 2 * row.n1 * row.n2
