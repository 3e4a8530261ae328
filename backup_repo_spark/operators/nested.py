"""Nested (repeated-record) columnar round-trip — the Dremel model.

From the retrieved-paper corpus: "Dremel: A Decade of Interactive SQL
Analysis at Web Scale" (VLDB 2020, PAPERS.md). Dremel's core data model is
the NESTED repeated record stored columnar (repetition/definition levels);
Spark + parquet inherit exactly that machinery. This query exercises the
full cycle on the fact table:

  shred:    lineitem rows → one record per order with a sorted
            ARRAY<STRUCT<linenumber, quantity>> child table
            (collect_list(struct) — the "record assembly" direction)
  compute:  per-order stats evaluated ON the nested form with array
            lambdas (aggregate/size/array_max) — no re-flatten, the
            Dremel-style "query the repeated field in place"
  verify:   oracle computes the same stats from the FLAT rows in DuckDB —
            equality proves shredding lost nothing.

Scale notes: collect_list per order is bounded by lines-per-order (~4–7,
TPC-H shape), not data size — safe at any SF; the nested record is then
map-only. This is the layout trick that collapses a fact⋈fact join into
one table at 100 TB (orders+lines co-stored), at the price of array-lambda
access — both sides of that trade are in the operator inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table


@query(
    "nested_dremel_roundtrip",
    oracle="""
    SELECT l_orderkey AS okey, count(*) AS n_lines,
           round(sum(l_quantity), 2) AS total_qty,
           CAST(max(l_linenumber) AS INTEGER) AS max_line,
           CAST(min(l_linenumber) AS INTEGER) AS first_line
    FROM lineitem GROUP BY l_orderkey
    HAVING count(*) >= 6
    ORDER BY okey
    """,
)
def nested_dremel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shred lineitem into per-order nested records, then answer from the
    NESTED form only (array lambdas over the repeated field); the oracle
    answers from the flat rows. See module docstring."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct("l_linenumber", "l_quantity"))
        ).alias("lines")
    )
    total_qty = F.aggregate(
        "lines", F.lit(0.0), lambda acc, x: acc + x["l_quantity"]
    )
    line_nums = F.transform("lines", lambda x: x["l_linenumber"])
    return (
        nested.select(
            F.col("l_orderkey").alias("okey"),
            F.size("lines").cast("bigint").alias("n_lines"),
            F.round(total_qty, 2).alias("total_qty"),
            F.array_max(line_nums).alias("max_line"),
            F.element_at(line_nums, 1).alias("first_line"),
        )
        .filter(F.col("n_lines") >= 6)
        .orderBy("okey")
    )
