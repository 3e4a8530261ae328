"""Adversarial differential tests for the ML-on-SQL family (mlsql.py).

The synthetic schema is statistically benign: every class is present,
clusters are balanced, no score is degenerate. Real training-data audits
are not — so this harness stages customer/orders tables made of the ML
hazards and replays the mlsql keys through the driver comparison:

- a massive outlier next to a tight value cluster (k-means: a centroid's
  cluster can drain empty -> the keep-previous-centroid path);
- a class entirely ABSENT from the label column (naive Bayes: smoothing
  + the conditional-aggregate class counts must yield 0, not NULL);
- a priority value observed under only one class (zero joint counts);
- heavy score ties across both classes (AUC: the tie-corrected rank-sum
  must land exactly on 1/2 for the all-tied block);
- thresholds that put ZERO rows on one split side (stump: the n=0 Gini
  guard);
- a segment with a single order (chi-square: 1-count cells);
- duplicate prices concentrated in one sample (KS over grouped values).
"""

from __future__ import annotations

import os
from datetime import datetime

import duckdb
import pytest

from backup_repo_spark import registry
from backup_repo_spark.session import TABLES
from backup_repo_spark.testing import compare, hard_problems
from tests.conftest import SF_DIR


def _ts(s):
    return datetime.fromisoformat(s)


CUSTOMERS = [
    # (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    (1, "Customer#1", 0, -999.99, "BUILDING"),   # domain minimum
    (2, "Customer#2", 1, -999.98, "BUILDING"),   # tight cluster at the min
    (3, "Customer#3", 2, -999.97, "BUILDING"),
    (4, "Customer#4", 3, 9999.99, "MACHINERY"),  # lone far outlier:
    (5, "Customer#5", 4, -999.96, "AUTOMOBILE"), #   mid-centroid drains empty
    (6, "Customer#6", 0, -999.95, "HOUSEHOLD"),  # singleton segments for
    (7, "Customer#7", 1, -999.94, "FURNITURE"),  #   chi-square 1-count cells
]

ORDERS = [
    # (o_orderkey, o_custkey, status, total, orderdate, priority)
    # NOTE: status 'P' never occurs -> NB class count cP must be 0.
    (100, 1, "O", 100.0, _ts("1996-01-02"), "1-URGENT"),
    (101, 1, "F", 100.0, _ts("1995-06-15"), "1-URGENT"),   # tied score, both classes
    (102, 2, "O", 100.0, _ts("1997-03-03"), "2-HIGH"),
    (103, 3, "F", 100.0, _ts("1998-09-02"), "2-HIGH"),     # 4-way tie at 100.0
    (104, 4, "F", 999999.99, _ts("1995-01-02"), "3-MEDIUM"),  # > every stump threshold
    (105, 5, "O", 1.0, _ts("1996-12-31"), "3-MEDIUM"),     # < every stump threshold
    (106, 6, "O", 1.0, _ts("1996-05-05"), "4-NOT SPECIFIED"),  # priority only ever 'O'
    (107, 7, "F", 450000.0, _ts("1997-07-07"), "5-LOW"),   # priority only ever 'F'
    (108, 2, "O", 1.0, _ts("1998-01-01"), "4-NOT SPECIFIED"),
]

_ML_KEYS = [
    "ml_kmeans",
    "ml_naive_bayes",
    "ml_confusion_matrix",
    "ml_decision_stump",
    "ml_auc_roc",
    "ml_calibration_bins",
    "ml_feature_stats",
    "stats_ks_test",
    "stat_chi_square",
]


@pytest.fixture(scope="module")
def adv_ml_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adv_ml_sf")
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in CUSTOMERS], pa.int64()),
                "c_name": [r[1] for r in CUSTOMERS],
                "c_nationkey": pa.array([r[2] for r in CUSTOMERS], pa.int32()),
                "c_acctbal": pa.array([r[3] for r in CUSTOMERS], pa.float64()),
                "c_mktsegment": [r[4] for r in CUSTOMERS],
            }
        ),
        str(d / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in ORDERS], pa.int64()),
                "o_custkey": pa.array([r[1] for r in ORDERS], pa.int64()),
                "o_orderstatus": [r[2] for r in ORDERS],
                "o_totalprice": pa.array([r[3] for r in ORDERS], pa.float64()),
                "o_orderdate": pa.array([r[4] for r in ORDERS], pa.timestamp("us")),
                "o_orderpriority": [r[5] for r in ORDERS],
            }
        ),
        str(d / "orders.parquet"),
    )
    for t in TABLES:
        if t not in ("customer", "orders"):
            os.symlink(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adv_ml_duck(adv_ml_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{adv_ml_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _ML_KEYS)
def test_ml_key_on_adversarial_data(name, spark, adv_ml_dir, adv_ml_duck):
    spark_pdf = registry.QUERIES[name](spark, adv_ml_dir).toPandas()
    duck_pdf = adv_ml_duck.execute(registry.ORACLES[name]).fetchdf()
    problems = hard_problems(compare(spark_pdf, duck_pdf))
    assert not problems, f"{name} diverges on adversarial data: {problems}"


def test_auc_all_tied_block_is_half(spark, adv_ml_dir):
    """The four orders tied at 100.0 split 2/2 across classes; combined
    with the separated outliers the tie-corrected AUC must stay strictly
    inside (0,1) and the doubled-U identity must be even-divisible."""
    row = registry.QUERIES["ml_auc_roc"](spark, adv_ml_dir).collect()[0]
    assert 0 < row.auc_ppm < 1_000_000
    assert row.two_u >= 0


def test_kmeans_outlier_isolated(spark, adv_ml_dir):
    """The lone 9999.99 customer must end in its own cluster; the tight
    block at the domain minimum shares one centroid."""
    rows = {r.cluster_id: r for r in registry.QUERIES["ml_kmeans"](spark, adv_ml_dir).collect()}
    assert rows[2].n == 1 and rows[2].centroid_cents == 999999
    assert rows[0].n == len(CUSTOMERS) - 1


@pytest.fixture(scope="module")
def empty_ml_dir(tmp_path_factory):
    """customer/orders with ZERO rows (schema-only parquet)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("empty_ml_sf")
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "c_name": pa.array([], pa.string()),
                "c_nationkey": pa.array([], pa.int32()),
                "c_acctbal": pa.array([], pa.float64()),
                "c_mktsegment": pa.array([], pa.string()),
            }
        ),
        str(d / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_custkey": pa.array([], pa.int64()),
                "o_orderstatus": pa.array([], pa.string()),
                "o_totalprice": pa.array([], pa.float64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_orderpriority": pa.array([], pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )
    for t in TABLES:
        if t not in ("customer", "orders"):
            os.symlink(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["ml_kmeans", "ml_naive_bayes", "ml_confusion_matrix", "ml_decision_stump",
     "ml_feature_stats", "stat_chi_square", "ml_calibration_bins",
     "ml_calibration_width_bucket"],
)
def test_ml_key_on_empty_tables(name, spark, empty_ml_dir):
    """Zero-row inputs must not crash and must agree with the oracle
    (typically: zero rows out, or a stump table of all-zero splits)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{empty_ml_dir}/{t}.parquet')"
        )
    sp = registry.QUERIES[name](spark, empty_ml_dir).toPandas()
    du = con.execute(registry.ORACLES[name]).fetchdf()
    con.close()
    problems = hard_problems(compare(sp, du))
    assert not problems, f"{name} diverges on empty tables: {problems}"
