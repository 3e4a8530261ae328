"""Projection / filter / predicate operators — SURVEY.md §2.B rows B5–B8.

Reference parity: Astro's contribution here was classifying predicates into
storage-pushable vs residual (upstream ``ScanPredClassifier.scala``,
``HBaseCustomFilter.scala`` — unverified, SURVEY.md §2.A A2) and De Morgan
normalization (``NotPusher.scala``, A9). In Spark 4.x both are built in:
Catalyst ``BooleanSimplification`` normalizes, and the parquet DataSource
pushes supported predicates to row-group stats (verify via
``explain()`` → ``PushedFilters``; asserted in tests/test_plans.py).

Scale notes: these queries are scan-shaped — no shuffle at all. At 100 TB
the only cost is the scan itself, which pushdown + column pruning minimize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table


@query(
    "project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price,
           l_returnflag || '/' || l_linestatus AS flag_status,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: projection with arithmetic, string concat, cast, aliasing.

    net_price is deliberately NOT rounded: per-row IEEE double arithmetic in
    a fixed order is bit-identical across engines, whereas round() on
    near-tie values (x.xx5±ulp) disagrees between Spark's BigDecimal HALF_UP
    and DuckDB's double rounding. Rounding is for order-dependent aggregates
    only (FIXTURES.md hazard #2)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
            "net_price"
        ),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
    )


@query(
    "filter_complex",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE (l_returnflag = 'R' AND l_discount > 0.05)
       OR NOT (l_quantity < 25.0 OR l_linestatus = 'F')
    """,
)
def filter_complex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: AND/OR/NOT predicate tree (Astro's NotPusher territory —
    Catalyst BooleanSimplification handles the normalization)."""
    li = load_table(spark, sf_dir, "lineitem")
    cond = ((F.col("l_returnflag") == "R") & (F.col("l_discount") > 0.05)) | ~(
        (F.col("l_quantity") < 25.0) | (F.col("l_linestatus") == "F")
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "filter_in_between_like",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal, 2) AS bal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND c_acctbal BETWEEN 1000.0 AND 8000.0
      AND c_name LIKE 'Customer#%1%'
      AND c_name IS NOT NULL
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: IN / BETWEEN / LIKE / IS NULL predicates."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_acctbal").between(1000.0, 8000.0)
        & F.col("c_name").like("Customer#%1%")
        & F.col("c_name").isNotNull()
    ).select("c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("bal"))


@query(
    "case_when",
    oracle="""
    SELECT o_orderstatus,
           CASE WHEN o_totalprice >= 300000 THEN 'big'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_orderstatus, bucket
    ORDER BY o_orderstatus, bucket
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: CASE WHEN conditional expression feeding an aggregation."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 300000, "big")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("small")
    )
    return (
        o.select("o_orderstatus", bucket.alias("bucket"), "o_totalprice")
        .groupBy("o_orderstatus", "bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("o_orderstatus", "bucket")
    )


@query(
    "null_handling",
    oracle="""
    WITH holed AS (
      SELECT o_orderkey,
             nullif(o_orderstatus, 'P') AS status_n,
             CASE WHEN o_totalprice > 400000 THEN NULL ELSE o_totalprice END AS price_n
      FROM orders
    )
    SELECT o_orderkey,
           coalesce(status_n, 'UNKNOWN') AS status_filled,
           coalesce(price_n, -1.0) AS price_filled
    FROM holed
    WHERE status_n IS NOT NULL OR price_n IS NOT NULL
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrameNaFunctions surface: NULLs are introduced (nullif / when),
    then df.na.fill patches them per-column and df.na.drop(how='all',
    subset=...) removes rows where every observed column is NULL — the
    standard dirty-data hygiene pass. Oracle mirrors with coalesce +
    IS NOT NULL."""
    o = load_table(spark, sf_dir, "orders")
    holed = o.select(
        "o_orderkey",
        F.nullif("o_orderstatus", F.lit("P")).alias("status_n"),
        F.when(F.col("o_totalprice") > 400000, None)
        .otherwise(F.col("o_totalprice"))
        .alias("price_n"),
    )
    cleaned = holed.na.drop(how="all", subset=["status_n", "price_n"]).na.fill(
        {"status_n": "UNKNOWN", "price_n": -1.0}
    )
    return cleaned.select(
        "o_orderkey",
        F.col("status_n").alias("status_filled"),
        F.col("price_n").alias("price_filled"),
    )


@query(
    "filter_ilike_search",
    oracle="""
    SELECT p_type, count(*) AS n,
           CAST(sum(CASE WHEN p_name ILIKE '%red%' THEN 1 ELSE 0 END) AS BIGINT)
             AS red_parts,
           CAST(sum(CASE WHEN p_name ILIKE 'small%' THEN 1 ELSE 0 END) AS BIGINT)
             AS small_prefix
    FROM part
    WHERE p_name ILIKE '%e%'
    GROUP BY p_type ORDER BY p_type
    """,
)
def filter_ilike_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive pattern search (ILIKE) as filter and as projected
    flags — the user-facing search predicate B7's LIKE row doesn't cover.
    Contains/prefix patterns compile to JVM contains/startsWith after
    lowercasing, staying inside whole-stage codegen (no regex engine)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").ilike("%e%"))
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("p_name").ilike("%red%").cast("int")).cast("bigint").alias("red_parts"),
            F.sum(F.col("p_name").ilike("small%").cast("int")).cast("bigint").alias("small_prefix"),
        )
        .orderBy("p_type")
    )
