"""Property-based differential tests for operators/prefix.py — the
two-phase bucketed prefix-sum machinery every former single-partition
window now rides on. The claims under test are EQUALITIES, not sanity
bounds:

- bucketed_prefix_sums == the naive `Window.orderBy(v)` cumulative sum,
  bit-for-bit, for any histogram, any bucket width, inclusive or
  exclusive, with or without partition columns (integer sums cannot be
  reassociated into different answers — that is the whole trick);
- ntile_nosort == F.ntile(k) over the same (value, tie) order for any
  row multiset and any k, including n < k, heavy ties, and negative
  values (DESC emulation passes negated values through the same path).

Hypothesis drives the shapes the fixed testdata cannot: empty-ish
inputs, all-tied values, single buckets, bucket boundaries landing on
values, n not divisible by k.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from backup_repo_spark.operators.prefix import bucketed_prefix_sums, ntile_nosort

hists = st.lists(
    st.tuples(st.integers(-50, 50), st.integers(1, 9)),  # (value, count)
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    hists,
    st.integers(1, 16),
    st.booleans(),
)
def test_bucketed_prefix_equals_naive_window(spark, hist, width, inclusive):
    h = spark.createDataFrame(hist, "v LONG, cnt LONG").repartition(3)
    two = {
        r.v: r.cum_cnt
        for r in bucketed_prefix_sums(
            h, "v", ["cnt"], bucket_width=width, inclusive=inclusive
        ).collect()
    }
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0 if inclusive else -1
    )
    naive = {
        r.v: r.c
        for r in h.select(
            "v", F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("c")
        ).collect()
    }
    assert two == naive


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(-30, 30), st.integers(1, 9)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: (t[0], t[1]),
    ),
    st.integers(1, 12),
)
def test_bucketed_prefix_partitioned_equals_naive(spark, hist, width):
    """The `by` (partitioned) mode must equal the per-partition naive
    window — the mode Spearman's per-returnflag ranks ride on."""
    h = spark.createDataFrame(hist, "g LONG, v LONG, cnt LONG").repartition(3)
    two = {
        (r.g, r.v): r.cum_cnt
        for r in bucketed_prefix_sums(
            h, "v", ["cnt"], bucket_width=width, by=["g"]
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = {
        (r.g, r.v): r.c
        for r in h.select(
            "g", "v", F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("c")
        ).collect()
    }
    assert two == naive


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(-20, 20), st.integers(0, 999)),  # (value, tie)
        min_size=1,
        max_size=60,
        unique_by=lambda t: t,
    ),
    st.integers(2, 10),
    st.integers(1, 8),
    st.sampled_from([None, 1, 4, 64]),
)
def test_ntile_nosort_equals_spark_ntile(spark, rows, tiles, width, tie_width):
    df = spark.createDataFrame(rows, "v LONG, tie LONG").repartition(3)
    ours = {
        (r.v, r.tie): r.bin
        for r in ntile_nosort(
            df, "v", "tie", tiles=tiles, bucket_width=width,
            tie_bucket_width=tie_width,
        ).collect()
    }
    theirs = {
        (r.v, r.tie): r.bin
        for r in df.select(
            "v",
            "tie",
            F.ntile(tiles).over(Window.orderBy("v", "tie")).alias("bin"),
        ).collect()
    }
    assert ours == theirs


def test_bucketed_prefix_keeps_null_values(spark):
    """Rows with a NULL value (or NULL by-key) must survive — the offset
    join is null-safe (<=>), not a silent filter (ADVICE r4: the old
    name-list join dropped them).  NULLs order FIRST, matching Spark's
    ascending nulls-first Window.orderBy."""
    h = spark.createDataFrame(
        [(None, 5), (10, 2), (20, 3)], "v LONG, cnt LONG"
    )
    got = {
        r.v: r.cum_cnt
        for r in bucketed_prefix_sums(h, "v", ["cnt"], bucket_width=7).collect()
    }
    # exclusive prefix, NULL first: NULL->0, 10->5, 20->7
    assert got == {None: 0, 10: 5, 20: 7}


def test_ntile_nosort_keeps_null_values(spark):
    """NULL-valued rows must be binned (nulls-first), not dropped — both
    the plain and tie-bucketed paths."""
    rows = [(None, 1), (None, 2), (5, 1), (5, 2), (9, 1), (9, 2)]
    df = spark.createDataFrame(rows, "v LONG, tie LONG")
    w = Window.orderBy(F.col("v").asc_nulls_first(), "tie")
    want = {
        (r.v, r.tie): r.bin
        for r in df.select(
            "v", "tie", F.ntile(3).over(w).alias("bin")
        ).collect()
    }
    for tw in (None, 2):
        got = {
            (r.v, r.tie): r.bin
            for r in ntile_nosort(
                df, "v", "tie", tiles=3, bucket_width=4, tie_bucket_width=tw
            ).collect()
        }
        assert got == want, f"tie_bucket_width={tw}"


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(-400, 400)),  # (group, value*10)
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([1.0, 2.5, 10.0, 1000.0]),
)
def test_bucketed_range_count_equals_naive_window(spark, rows, span):
    """bucketed_range_count == the naive RANGE-frame window, exactly, for
    any value multiset (duplicates included), any group split, any span —
    including a span so large everything is one bucket and values negative
    enough to exercise floor-division bucketing."""
    from backup_repo_spark.operators.prefix import bucketed_range_count

    df = spark.createDataFrame(
        [(g, v / 10.0) for g, v in rows], "g LONG, v DOUBLE"
    ).repartition(3)
    ours = sorted(
        (r.g, r.v, r.range_count)
        for r in bucketed_range_count(df, "v", span, by=["g"]).collect()
    )
    naive = sorted(
        (r.g, r.v, r.c)
        for r in df.select(
            "g",
            "v",
            F.expr(
                f"count(*) OVER (PARTITION BY g ORDER BY v "
                f"RANGE BETWEEN {span!r} PRECEDING AND CURRENT ROW)"
            ).alias("c"),
        ).collect()
    )
    assert ours == naive


def test_bucketed_range_count_null_values(spark):
    """NULL-valued rows are mutual peers under RANGE semantics and must be
    counted once each, not duplicated by the context copy."""
    from backup_repo_spark.operators.prefix import bucketed_range_count

    df = spark.createDataFrame(
        [(None,), (None,), (1.0,), (1.5,)], "v DOUBLE"
    )
    got = {
        (r.v, r.range_count)
        for r in bucketed_range_count(df, "v", 1.0).collect()
    }
    assert got == {(None, 2), (1.0, 1), (1.5, 2)}


def test_bucketed_range_count_heavy_ties(spark):
    """The adversarial shape for value-bucketed schemes: 99% of rows share
    ONE value. The histogram-first form collapses the window input to the
    distinct-value count, so this must stay correct (and fast) instead of
    serializing all tied rows through one window partition."""
    from backup_repo_spark.operators.prefix import bucketed_range_count

    rows = [(0, 42.0)] * 5000 + [(0, 41.5), (0, 43.0), (1, 42.0), (1, 500.0)]
    df = spark.createDataFrame(rows, "g LONG, v DOUBLE").repartition(8)
    got = {
        (r.g, r.v): r.range_count
        for r in bucketed_range_count(df, "v", 1.0, by=["g"]).collect()
    }
    # g=0: 41.5 has 1 peer (itself); 42.0 has 5000 ties + 41.5 = 5001;
    # 43.0 reaches back to 42.0: 5000 + 1 = 5001.  g=1 isolated.
    assert got == {
        (0, 41.5): 1,
        (0, 42.0): 5001,
        (0, 43.0): 5001,
        (1, 42.0): 1,
        (1, 500.0): 1,
    }
