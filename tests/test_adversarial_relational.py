"""Adversarial-relational differential tests.

The synthetic star schema is referentially perfect: every order has a
customer and lineitems, no group is empty, no predicate lands exactly on
a boundary. Real warehouses are not — so this harness stages customer/
orders/lineitem tables made of the hazards (customers with no orders,
orders with no lineitems, FK orphans on BOTH fact sides, a shipdate
landing exactly on the Q1 predicate boundary, out-of-domain discounts,
zero quantities, negative balances) and replays the relational keys
through the driver comparison. Outer joins, semi/anti, correlated
subqueries, and the dq gates are exactly the operators whose semantics
live in these edges.
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
    (1, "Customer#1", 0, 100.0, "BUILDING"),
    (2, "Customer#2", 1, -50.25, "BUILDING"),     # negative balance
    (3, "Customer#3", 2, 0.0, "MACHINERY"),
    (4, "Customer#4", 3, 999.99, "AUTOMOBILE"),
    (5, "Customer#5", 4, 10.0, "HOUSEHOLD"),
    (6, "Customer#6", 0, 5.0, "BUILDING"),        # customer with NO orders
]

ORDERS = [
    # (o_orderkey, o_custkey, status, total, orderdate, priority)
    (100, 1, "O", 1000.0, _ts("1996-01-02"), "1-URGENT"),
    (101, 1, "F", 250000.5, _ts("1995-06-15"), "5-LOW"),
    (102, 2, "O", 1.0, _ts("1997-03-03"), "1-URGENT"),      # minimal price
    (103, 3, "P", 310000.0, _ts("1998-09-02"), "3-MEDIUM"),
    (104, 4, "F", 42.42, _ts("1995-01-02"), "2-HIGH"),
    (110, 5, "O", 77.0, _ts("1996-12-31"), "4-NOT SPECIFIED"),  # NO lineitems
    (120, 999, "O", 5000.0, _ts("1997-07-07"), "1-URGENT"),  # orphan customer FK
]

LINEITEM = [
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, qty, extprice, disc,
    #  tax, returnflag, linestatus, shipdate)
    (100, 1, 1, 1, 10.0, 1000.0, 0.05, 0.02, "N", "O", _ts("1996-02-01")),
    (100, 2, 2, 2, 0.0, 500.0, 0.0, 0.0, "N", "O", _ts("1996-02-02")),   # zero qty
    (101, 3, 3, 1, 5.0, 2000.0, 0.1, 0.08, "R", "F", _ts("1998-09-02")), # EXACT Q1 boundary
    (101, 4, 4, 2, 7.0, 1500.0, 0.5, 0.04, "A", "F", _ts("1998-09-03")), # post-boundary + domain-violating discount
    (102, 5, 5, 1, 3.0, 1.0, 0.01, 0.01, "N", "O", _ts("1997-04-01")),
    (103, 1, 1, 1, 50.0, 99999.99, 0.02, 0.0, "R", "F", _ts("1998-01-01")),
    (104, 2, 2, 1, 1.0, 42.42, 0.0, 0.08, "A", "F", _ts("1995-02-01")),
    (888, 3, 3, 1, 9.0, 900.0, 0.03, 0.03, "N", "O", _ts("1996-06-06")), # orphan order FK
]

_REL_KEYS = [
    "agg_tpch_q1",
    "topk_revenue",
    "join_star_5way",
    "join_outer",
    "join_semi",
    "join_anti",
    "join_theta",
    "join_lateral",
    "subq_correlated",
    "subq_exists",
    "subq_not_in_null",
    "agg_rollup",
    "agg_grouping_sets",
    "win_rank",
    "dq_constraints",
    "dq_schema_contract",
]


@pytest.fixture(scope="module")
def adv_rel_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adv_rel_sf")
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
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in LINEITEM], pa.int64()),
                "l_partkey": pa.array([r[1] for r in LINEITEM], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in LINEITEM], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in LINEITEM], pa.int32()),
                "l_quantity": pa.array([r[4] for r in LINEITEM], pa.float64()),
                "l_extendedprice": pa.array([r[5] for r in LINEITEM], pa.float64()),
                "l_discount": pa.array([r[6] for r in LINEITEM], pa.float64()),
                "l_tax": pa.array([r[7] for r in LINEITEM], pa.float64()),
                "l_returnflag": [r[8] for r in LINEITEM],
                "l_linestatus": [r[9] for r in LINEITEM],
                "l_shipdate": pa.array([r[10] for r in LINEITEM], pa.timestamp("us")),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    for t in TABLES:
        if t not in ("customer", "orders", "lineitem"):
            os.symlink(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adv_rel_duck(adv_rel_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{adv_rel_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _REL_KEYS)
def test_relational_key_on_adversarial_schema(name, spark, adv_rel_dir, adv_rel_duck):
    spark_pdf = registry.QUERIES[name](spark, adv_rel_dir).toPandas()
    duck_pdf = adv_rel_duck.execute(registry.ORACLES[name]).fetchdf()
    problems = hard_problems(compare(spark_pdf, duck_pdf))
    assert not problems, f"{name} diverges on adversarial schema: {problems}"
