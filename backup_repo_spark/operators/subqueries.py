"""Subqueries & CTEs — SURVEY.md §2.B rows B51–B54.

Reference parity: Spark 1.4's subquery support (which Astro inherited) was
weak — no correlated decorrelation. Spark 4.x Catalyst rewrites correlated
subqueries into joins (``RewriteCorrelatedScalarSubquery`` etc.), so these
run as joins, not per-row re-executions. SQL-string entry path (§3.2 shape 1):
identical text runs on Spark and DuckDB.

Scale notes: the scalar subqueries here become broadcast joins of a 1-row
aggregate; correlated EXISTS becomes a semi join shuffled on the correlation
key. Nothing is per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table


def _sql(spark: SparkSession, sf_dir: str, sql: str, tables: list[str]) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


_SUBQ_SCALAR = """
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice > (SELECT round(avg(o_totalprice) * 1.5, 2) FROM orders)
"""


@query("subq_scalar", oracle=_SUBQ_SCALAR)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B51: uncorrelated scalar subquery (threshold rounded so both engines
    compare against bit-identical values)."""
    return _sql(spark, sf_dir, _SUBQ_SCALAR, ["orders"])


_SUBQ_EXISTS = """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


@query("subq_exists", oracle=_SUBQ_EXISTS)
def subq_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B52: IN subquery → planned as a left semi join."""
    return _sql(spark, sf_dir, _SUBQ_EXISTS, ["customer", "orders"])


_SUBQ_CORR = """
    SELECT c.c_custkey, round(c.c_acctbal, 2) AS bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) + 2000 FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
"""


@query("subq_correlated", oracle=_SUBQ_CORR)
def subq_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B53: correlated scalar subquery — Catalyst decorrelates into an
    aggregate + join on the correlation key (c_nationkey)."""
    return _sql(spark, sf_dir, _SUBQ_CORR, ["customer"])


_CTE = """
    WITH rev AS (
      SELECT o_custkey, sum(o_totalprice) AS r FROM orders GROUP BY o_custkey
    )
    SELECT count(*) AS n_above, round(avg(r), 2) AS avg_above
    FROM rev WHERE r > (SELECT avg(r) FROM rev)
"""


@query("cte_reuse", oracle=_CTE)
def cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B54: CTE referenced twice (body + scalar subquery over it)."""
    return _sql(spark, sf_dir, _CTE, ["orders"])
