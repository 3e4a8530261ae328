"""Skyline (Pareto-dominance frontier) operator.

Not in the reference (Astro exposes only Spark-1.4 SQL); added from the
retrieved-paper corpus: "Integration of Skyline Queries into Spark SQL"
(EDBT 2023, PAPERS.md) — the operator that returns every tuple not
DOMINATED by another (dominator is ≤ on every minimized dim, ≥ on every
maximized dim, strictly better on at least one).

Distributed design (the paper's core observation, restated Spark-first):
the skyline is DISTRIBUTIVE — skyline(S) = skyline(∪ skyline(part_i)) —
so it runs as:

1. **Local phase** (``mapInPandas``, Arrow-vectorized, zero shuffle): each
   partition sorts by (price asc, size desc) and keeps only points that
   achieve the running size maximum — an O(n log n) sweep that yields a
   small SUPERSET of the partition's skyline (every pruned point is
   strictly dominated by the point that set the running max).
2. **Global phase**: the surviving candidates (tiny vs n) go through an
   exact dominance LEFT ANTI self-join. On candidates this is a broadcast
   nested-loop over a few hundred rows — at 100 TB the heavy lifting
   happened map-side; only candidate-set size, not data size, reaches the
   join.

The result is a deterministic SET (algorithm-independent), so the oracle is
the textbook NOT EXISTS dominance query over the full table.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table


def _local_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition sweep: sorted by (price asc, size desc), a point whose
    size is below the running max is strictly dominated (the max-setter has
    ≤ price and > size). Keeping running-max achievers yields a superset of
    the local skyline — exactness is restored in the global phase."""
    import numpy as np

    for pdf in batches:
        if len(pdf) == 0:
            yield pdf
            continue
        pdf = pdf.sort_values(["p_retailprice", "p_size"], ascending=[True, False])
        cm = np.maximum.accumulate(pdf["p_size"].to_numpy())
        yield pdf[pdf["p_size"].to_numpy() >= cm]


@query(
    "skyline_frontier",
    oracle="""
    SELECT p_partkey, p_name, round(p_retailprice, 2) AS price, p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    ORDER BY price, p_partkey
    """,
)
def skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline over part: minimize p_retailprice, maximize p_size —
    "no part is both cheaper and larger". Local mapInPandas sweep prunes
    each partition to a candidate superset; an exact dominance anti-join
    over the (small) candidates finishes. Oracle = textbook NOT EXISTS
    dominance on the full table: same set, any algorithm."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice", "p_size"
    )
    cand = p.mapInPandas(_local_skyline, schema=p.schema)
    dom = cand.select(
        F.col("p_retailprice").alias("q_price"), F.col("p_size").alias("q_size")
    )
    dominated = (
        (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") >= F.col("p_size"))
        & ((F.col("q_price") < F.col("p_retailprice")) | (F.col("q_size") > F.col("p_size")))
    )
    return (
        cand.join(F.broadcast(dom), dominated, "left_anti")
        .select(
            "p_partkey",
            "p_name",
            F.round("p_retailprice", 2).alias("price"),
            "p_size",
        )
        .orderBy("price", "p_partkey")
    )
