"""Adversarial differential tests for the rank-statistics family
(operators/rankstats.py).

The synthetic tables are statistically benign: both order cohorts are
populated, every lineitem group varies in both variables, the regressors
are far from collinear. Real drift-gate inputs are not — so this harness
stages orders/lineitem tables made of the degenerate hazards and replays
the rankstats keys through the driver comparison:

- an orders table whose 'O' cohort has a SINGLE row and whose values are
  heavily tied (Mann-Whitney: the tie-correction term, and the doubled
  average ranks of a 5-way tie);
- an orders table with one cohort entirely ABSENT (var -> 0 paths);
- an orders table where EVERY price is identical (tie term T = n^3 - n
  makes the variance exactly zero -> z must be NULL on both engines, not
  a Spark ANSI DIVIDE_BY_ZERO crash);
- a lineitem group with a SINGLE row and one with a CONSTANT quantity
  (Spearman: zero rank variance -> rho NULL; F.corr would raise under
  ANSI where DuckDB returns NULL — the moments formulation must not);
- a lineitem table with a single distinct quantity (Kendall: zero
  x-comparable pairs -> empty grid self-join, conc = disc = 0, tau NULL);
- a lineitem table whose discount is CONSTANT (OLS: the 2x2 normal-
  equation determinant is exactly 0 -> both coefficients NULL);
- ZERO-ROW orders and lineitem (every key must return its aggregate
  shell with engine-identical NULLs, never crash).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from backup_repo_spark import registry
from backup_repo_spark.session import TABLES
from backup_repo_spark.testing import compare, hard_problems
from tests.conftest import SF_DIR

# (o_orderkey, o_custkey, status, total, priority)
ORDERS_TIED = [
    # 'F' cohort: five rows all tied at 100.00 + two distinct
    (1, 1, "F", 100.00, "1-URGENT"),
    (2, 1, "F", 100.00, "1-URGENT"),
    (3, 1, "F", 100.00, "2-HIGH"),
    (4, 1, "F", 100.00, "2-HIGH"),
    (5, 1, "F", 100.00, "3-MEDIUM"),
    (6, 1, "F", 250.50, "3-MEDIUM"),
    (7, 1, "F", 0.01, "4-NOT SPECIFIED"),
    # 'O' cohort: a single row, tied with the F block
    (8, 1, "O", 100.00, "5-LOW"),
    # 'P' rows must be filtered out by the cohort predicate
    (9, 1, "P", 999.99, "1-URGENT"),
]

ORDERS_ONE_COHORT = [(i, 1, "F", 100.0 + i, "1-URGENT") for i in range(1, 6)]

ORDERS_ALL_SAME = [
    (i, 1, "F" if i % 2 else "O", 42.42, "1-URGENT") for i in range(1, 9)
]

# (l_orderkey, l_quantity, l_extendedprice, l_discount, l_returnflag)
LINEITEM_DEGENERATE = [
    # group 'A': single row  -> Spearman rho NULL
    (1, 5.0, 5000.00, 0.05, "A"),
    # group 'N': constant quantity, varying price -> zero x-rank variance
    (2, 7.0, 1000.00, 0.00, "N"),
    (3, 7.0, 2000.00, 0.10, "N"),
    (4, 7.0, 3000.00, 0.04, "N"),
    # group 'R': healthy variation (the control group)
    (5, 1.0, 900.00, 0.01, "R"),
    (6, 20.0, 25000.00, 0.06, "R"),
    (7, 45.0, 60000.00, 0.09, "R"),
    (8, 30.0, 31000.00, 0.02, "R"),
]

# single distinct quantity across the WHOLE table -> Kendall has zero
# x-discriminating pairs; discount constant -> OLS determinant exactly 0
LINEITEM_COLLINEAR = [
    (i, 10.0, 1000.0 * i, 0.05, "R") for i in range(1, 7)
]

_KEYS_ORDERS = ["stats_mann_whitney"]
_KEYS_LINEITEM = ["stats_spearman", "stats_kendall_tau", "ml_ols_multi"]


def _write_orders(d, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
                "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
                "o_orderpriority": pa.array([r[4] for r in rows], pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )


def _write_lineitem(d, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_quantity": pa.array([r[1] for r in rows], pa.float64()),
                "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
                "l_discount": pa.array([r[3] for r in rows], pa.float64()),
                "l_returnflag": pa.array([r[4] for r in rows], pa.string()),
            }
        ),
        str(d / "lineitem.parquet"),
    )


def _stage(tmp_path_factory, name, orders=None, lineitem=None):
    d = tmp_path_factory.mktemp(name)
    if orders is not None:
        _write_orders(d, orders)
    if lineitem is not None:
        _write_lineitem(d, lineitem)
    for t in TABLES:
        if not (d / f"{t}.parquet").exists():
            os.symlink(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


def _duck_for(path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}/{t}.parquet')"
        )
    return con


def _assert_matches(spark, sf, keys):
    con = _duck_for(sf)
    try:
        for name in keys:
            spark_pdf = registry.QUERIES[name](spark, sf).toPandas()
            duck_pdf = con.execute(registry.ORACLES[name]).fetchdf()
            problems = hard_problems(compare(spark_pdf, duck_pdf))
            assert not problems, f"{name} diverges: {problems}"
    finally:
        con.close()


def test_mann_whitney_heavy_ties_and_singleton_cohort(spark, tmp_path_factory):
    sf = _stage(tmp_path_factory, "adv_rs_tied", orders=ORDERS_TIED)
    _assert_matches(spark, sf, _KEYS_ORDERS)
    row = registry.QUERIES["stats_mann_whitney"](spark, sf).collect()[0]
    assert row.n1 == 7 and row.n2 == 1
    # the single O row is tied with five F rows: its doubled average rank
    # is 2*1 + 6 + 1 = 9 (cnt_less=1 from 0.01, cnt_eq=6)
    assert row.u2_doubled + row.u1_doubled == 2 * row.n1 * row.n2


def test_mann_whitney_absent_cohort_yields_nulls(spark, tmp_path_factory):
    sf = _stage(tmp_path_factory, "adv_rs_onecohort", orders=ORDERS_ONE_COHORT)
    _assert_matches(spark, sf, _KEYS_ORDERS)
    row = registry.QUERIES["stats_mann_whitney"](spark, sf).collect()[0]
    assert row.n2 == 0 and row.z_micro is None


def test_mann_whitney_all_values_identical(spark, tmp_path_factory):
    """All prices equal -> tie term makes the variance EXACTLY zero
    (proven integer identity, no -epsilon sqrt hazard) -> z NULL on both
    engines instead of an ANSI DIVIDE_BY_ZERO crash."""
    sf = _stage(tmp_path_factory, "adv_rs_allsame", orders=ORDERS_ALL_SAME)
    _assert_matches(spark, sf, _KEYS_ORDERS)
    row = registry.QUERIES["stats_mann_whitney"](spark, sf).collect()[0]
    assert row.z_micro is None
    # with every value tied, U1 must sit exactly at its mean n1*n2
    assert row.u1_doubled == 2 * row.n1 * row.n2 - row.u1_doubled


def test_lineitem_degenerate_groups(spark, tmp_path_factory):
    sf = _stage(
        tmp_path_factory, "adv_rs_degen", lineitem=LINEITEM_DEGENERATE
    )
    _assert_matches(spark, sf, _KEYS_LINEITEM)
    rows = {
        r.rf: r for r in registry.QUERIES["stats_spearman"](spark, sf).collect()
    }
    assert rows["A"].rho_spearman is None  # single row: zero variance
    assert rows["N"].rho_spearman is None  # constant quantity
    assert rows["R"].rho_spearman == pytest.approx(1.0)  # monotone group


def test_kendall_single_x_value_and_collinear_ols(spark, tmp_path_factory):
    sf = _stage(
        tmp_path_factory, "adv_rs_collinear", lineitem=LINEITEM_COLLINEAR
    )
    _assert_matches(spark, sf, _KEYS_LINEITEM)
    krow = registry.QUERIES["stats_kendall_tau"](spark, sf).collect()[0]
    assert krow.conc == 0 and krow.disc == 0 and krow.tau_b_micro is None
    orow = registry.QUERIES["ml_ols_multi"](spark, sf).collect()[0]
    # constant discount -> determinant exactly 0 -> no unique solution
    assert orow.beta_qty is None and orow.beta_disc_pt is None


def test_zero_row_inputs_never_crash(spark, tmp_path_factory):
    sf = _stage(
        tmp_path_factory, "adv_rs_empty", orders=[], lineitem=[]
    )
    _assert_matches(
        spark, sf, _KEYS_ORDERS + ["stats_kendall_tau", "ml_ols_multi"]
    )
    # spearman groups by a column of an empty table -> empty result
    assert registry.QUERIES["stats_spearman"](spark, sf).count() == 0


def test_spearman_two_phase_equals_windowed_formulation(spark):
    """The shipped two-phase bucketed-prefix-sum ranks must be BIT-identical
    to the naive per-group windowed ranks (the formulation the oracle uses)
    on the real testdata — the scale rewrite may never change a value."""
    from pyspark.sql import functions as F

    from backup_repo_spark.session import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    li.createOrReplaceTempView("li_spearman_check")
    windowed = spark.sql(
        """
        WITH r AS (
          SELECT l_returnflag AS rf,
                 2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
                   + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS rx2
          FROM li_spearman_check
        )
        SELECT rf, CAST(sum(rx2) AS DECIMAL(19,0)) AS s1 FROM r GROUP BY rf
        """
    ).collect()
    want = {r.rf: int(r.s1) for r in windowed}
    # rebuild the same rank sum from the shipped helper
    from backup_repo_spark.operators.rankstats import _doubled_ranks

    h = (
        li.groupBy(
            F.col("l_returnflag").alias("rf"),
            F.col("l_quantity").cast("bigint").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    got = {
        r.rf: int(r.s1)
        for r in _doubled_ranks(h, bucket_width=8)
        .join(h.withColumnRenamed("cnt", "c"), ["rf", "v"])
        .groupBy("rf")
        .agg(F.sum(F.col("dr") * F.col("c")).alias("s1"))
        .collect()
    }
    assert got == want


def test_kruskal_wallis_degenerate_inputs(spark, tmp_path_factory):
    """All-tied values: the tie correction denominator (1 - T/(n^3-n))
    is EXACTLY zero -> H NULL on both engines; empty orders -> empty
    result on both engines; the heavy-tie table exercises shared ranks
    across groups."""
    for name, orders in [
        ("adv_kw_tied", ORDERS_TIED),
        ("adv_kw_allsame", ORDERS_ALL_SAME),
        ("adv_kw_empty", []),
    ]:
        sf = _stage(tmp_path_factory, name, orders=orders)
        _assert_matches(spark, sf, ["stats_kruskal_wallis"])
    sf = _stage(tmp_path_factory, "adv_kw_allsame2", orders=ORDERS_ALL_SAME)
    rows = registry.QUERIES["stats_kruskal_wallis"](spark, sf).collect()
    assert rows and all(r.h_micro is None for r in rows)
