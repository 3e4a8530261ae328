"""Sorts / limits / top-k — SURVEY.md §2.B rows B36–B38.

Reference parity: Astro's rowkey order made key-prefix sorts free at the
storage layer; everything else delegated to Spark's Sort/TakeOrdered.
Our analog: range-partitioned parquet layout (sources/layout.py) gives the
same key-order property; global sorts here exercise the general path.

Scale notes: ``orderBy().limit(k)`` plans TakeOrderedAndProject — each task
keeps a k-heap, the driver merges k·numPartitions rows. No global sort shuffle
for top-k, which is why it's the only sane "give me the biggest" pattern at
100 TB. A full ``orderBy`` (sort_multikey) is a range-repartition + local
sort; AQE sizes the range partitions from sampled statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table


@query(
    "sort_multikey",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY nullif(o_orderstatus, 'P') ASC NULLS FIRST, o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36: multi-key global sort with explicit NULL placement (Spark's
    default is NULLS FIRST for ASC, DuckDB's is NULLS LAST — pinned
    explicitly on both sides). LIMIT makes the order observable through the
    driver's order-insensitive hash."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("price"),
            F.expr("nullif(o_orderstatus, 'P')").alias("_nk"),
            F.col("o_totalprice").alias("_tp"),
        )
        .orderBy(F.col("_nk").asc_nulls_first(), F.col("_tp").desc(), "o_orderkey")
        .limit(100)
        .drop("_nk", "_tp")
    )


@query(
    "topk_revenue",
    oracle="""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37: TPC-H Q3-style top-k — BASELINE.md q_join3_topk. Plans
    TakeOrderedAndProject above the aggregation: per-task heaps, no global
    sort. Ordered by the unrounded measure with o_orderkey tie-break;
    projection rounds for cross-engine hash stability."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"))
        .orderBy(F.desc("_rev"), "o_orderkey")
        .limit(10)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("odate"),
            F.round("_rev", 2).alias("revenue"),
        )
    )


@query(
    "sort_keyset_pagination",
    oracle="""
    WITH cursor_row AS (
      SELECT o_totalprice AS cp, o_orderkey AS ck FROM (
        SELECT o_totalprice, o_orderkey,
               row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
      ) WHERE rn = 40
    )
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderstatus
    FROM orders o CROSS JOIN cursor_row
    WHERE o.o_totalprice < cursor_row.cp
       OR (o.o_totalprice = cursor_row.cp AND o.o_orderkey > cursor_row.ck)
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def sort_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYSET (seek) pagination: fetch the 20 rows AFTER a (price, key)
    cursor via a sargable compound predicate — never OFFSET, which scans
    and discards all preceding rows (O(page_number) per page; at 100 TB,
    page 10 000 of an OFFSET plan reads the whole table). The cursor here
    is derived in-query (row 40 of the global order) so the test is
    self-contained; real callers pass the last row of the previous page.
    The predicate pushes to the scan; the page is TakeOrderedAndProject —
    and so is the cursor derivation: top-40 via per-partition local
    top-k FIRST, then the row_number window runs over 40 rows, so no
    single-partition pass over the table exists anywhere in the plan."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    cur = (
        o.select("o_totalprice", "o_orderkey")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(40)
        .select(
            "o_totalprice", "o_orderkey",
            F.row_number()
            .over(Window.orderBy(F.desc("o_totalprice"), "o_orderkey"))
            .alias("rn"),
        )
        .filter(F.col("rn") == 40)
        .select(F.col("o_totalprice").alias("cp"), F.col("o_orderkey").alias("ck"))
    )
    return (
        o.crossJoin(F.broadcast(cur))
        .filter(
            (F.col("o_totalprice") < F.col("cp"))
            | ((F.col("o_totalprice") == F.col("cp")) & (F.col("o_orderkey") > F.col("ck")))
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )
