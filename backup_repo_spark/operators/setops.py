"""Set operations — SURVEY.md §2.B rows B39–B42.

Reference parity: UNION/INTERSECT/EXCEPT were Spark SQL 1.4 surface that
Astro inherited. Spark's multiset semantics (intersectAll/exceptAll) match
ANSI — the oracles use DuckDB's INTERSECT ALL / EXCEPT ALL to pin that.

Scale notes: UNION ALL is a zero-shuffle concatenation of partitions.
INTERSECT/EXCEPT/DISTINCT all shuffle on the full row — at 100 TB prefer
dedup on a narrow key or hash (see llm/dedup.py) over whole-row distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table


@query(
    "set_union",
    oracle="""
    SELECT side, nationkey, count(*) AS n FROM (
      SELECT 'cust' AS side, c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT 'supp' AS side, s_nationkey AS nationkey FROM supplier
    ) u GROUP BY side, nationkey
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B39: UNION ALL (partition concat, no shuffle) feeding an aggregate."""
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("cust").alias("side"), F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supp").alias("side"), F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).groupBy("side", "nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B40: INTERSECT ALL — multiset semantics (min of multiplicities)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@query(
    "set_except",
    oracle="""
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B41: EXCEPT ALL — multiset difference (multiplicities subtract)."""
    o = load_table(spark, sf_dir, "orders")
    open_p = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    closed_p = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return open_p.exceptAll(closed_p)


@query(
    "set_dedup_exact",
    oracle="SELECT DISTINCT o_custkey, o_orderstatus FROM orders",
)
def set_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B42: DISTINCT on a projected key set (dropDuplicates over the
    projection — deterministic, unlike keyed dropDuplicates which keeps an
    arbitrary survivor row)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_custkey", "o_orderstatus").dropDuplicates()


@query(
    "set_union_byname",
    oracle="""
    SELECT r_regionkey AS k, r_name AS name, NULL AS extra
    FROM region
    UNION ALL
    SELECT n_nationkey AS k, n_name AS name, n_regionkey AS extra
    FROM nation WHERE n_nationkey < 5
    """,
)
def set_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns — schema-evolution-tolerant
    union (columns matched by NAME, absent ones null-filled), vs positional
    union. DuckDB's UNION ALL BY NAME is the same idea; the oracle spells
    the null-fill explicitly."""
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k"), F.col("r_name").alias("name")
    )
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5).select(
        F.col("n_nationkey").alias("k"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").alias("extra"),
    )
    return r.unionByName(n, allowMissingColumns=True).select(
        "k", "name", F.col("extra").cast("int").alias("extra")
    )
