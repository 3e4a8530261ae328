"""Scan-layer operators — SURVEY.md §2.A rows A1, A2, A4, A5 (the part of
Astro that was its actual machinery, re-expressed as parquet DataSource
behavior).

Reference parity map (upstream paths unverified — reference snapshot empty,
SURVEY.md §0):
- A1 ``HBaseSQLTableScan``/``HBaseSQLReaderRDD`` (range-pruned region scan)
  → Spark FileScan over parquet with min/max row-group skipping.
- A2 ``ScanPredClassifier`` + ``HBaseCustomFilter`` (pushable vs residual
  predicate split) → parquet filter pushdown; `PushedFilters` in explain().
- A4 column-family/qualifier pruning in ``HBaseRelation.buildScan``
  → Catalyst ColumnPruning + parquet column projection (`ReadSchema`).
- A5 coprocessor partial aggregation (``SparkSqlRegionObserver``)
  → HashAggregate(partial) before the shuffle — same semantics, built in.

tests/test_plans.py asserts the physical-plan properties (PushedFilters,
pruned ReadSchema, partial HashAggregate) — the scan behavior IS the feature
here, not just the row values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table


@query(
    "scan_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_quantity > 45.0
    """,
)
def scan_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/B1: selective range scan. The shipdate band + quantity predicate
    both push to parquet row-group statistics — Astro's rowkey-range pruning,
    done by footer min/max instead of region boundaries."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 45.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "filter_pushdown",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice > 450000 AND o_orderstatus = 'F'
    """,
)
def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: conjunctive predicate fully classified as pushable — lands in
    `PushedFilters: [GreaterThan(o_totalprice,...), EqualTo(o_orderstatus,F)]`."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter((F.col("o_totalprice") > 450000) & (F.col("o_orderstatus") == "F")).select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price")
    )


@query(
    "column_pruning",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_discount), 2) AS sum_disc
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def column_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: 2-of-11-column read — ReadSchema must shrink to
    (l_returnflag, l_discount); at 100 TB this is an ~5× I/O reduction on
    this table before any predicate helps."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_discount"), 2).alias("sum_disc"))
        .orderBy("l_returnflag")
    )


@query(
    "partial_agg",
    oracle="""
    SELECT l_suppkey, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY l_suppkey
    """,
)
def partial_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: Astro's coprocessor partial aggregation ≡ Spark's
    HashAggregate(partial) before the exchange: each scan task pre-collapses
    to ≤ |suppkeys| rows, so shuffle volume is keys×partitions, not rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )
