"""Skew-resilient join patterns — the 100 TB survival kit.

Reference parity: Astro's analog is region-aligned partitioning (one HBase
region = one partition); a hot rowkey range meant a hot region, and the fix
was manual region splitting. In Spark the same problem appears as a hot
join/agg key: one shuffle partition receives most of the rows and the stage
straggles. Two standard fixes, both demonstrated here against the plain-join
oracle (salting must be result-invariant):

1. **Salting** (manual, this module): spread each fact-side key over N
   sub-keys; replicate the dim side N×. The shuffle key becomes (key, salt),
   so a hot key occupies N partitions instead of 1. Cost: dim side grows N×
   — only worth it for genuinely skewed fact⋈dim joins.
2. **AQE skew-join splitting** (automatic): `spark.sql.adaptive.skewJoin.
   enabled=true` (on in session.py) splits oversized partitions at runtime
   using exact shuffle statistics. Prefer it when it fires; salting remains
   the portable fallback (e.g. for aggregations, which AQE skew handling
   does not cover).

tests/test_skew_aqe.py demonstrates layer 2 end-to-end: a forced-skew
fixture (90% of rows on one key) executed under lowered AQE thresholds
shows `OptimizeSkewedJoin` marking the SMJ `skew=true` and splitting the
hot partition via AQEShuffleRead — plus the control run proving the
marker comes from the rewrite. Rules of thumb that fall out:
- JOIN skew needs no salting on an AQE engine; AGG skew still does
  (this module's `agg_skew_twophase`).
- AQE judges skew on POST-PRUNING shuffle BYTES, not row counts: if
  Catalyst prunes the wide columns before the exchange (e.g. a pure
  count(*) above the join), a 65:1 row-skewed key can be a few
  harmless KB and AQE correctly leaves it alone. Measure with
  `stats_key_skew` (rows) AND the exchange's mapStats (bytes) before
  reaching for salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table

_SALT = 8


@query(
    "join_skew_salted",
    oracle="""
    SELECT o_orderpriority, count(*) AS n, round(sum(l_extendedprice), 2) AS total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi join: fact side gets salt = hash(row) mod N; dim side is
    replicated against all N salts via explode(sequence(...)); join on
    (key, salt). The oracle is the PLAIN join — proving salting is purely a
    physical rewrite with identical semantics. The salt is derived from
    stable row columns (not rand()) so task retries re-produce it."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt",
        F.pmod(F.xxhash64("l_partkey", "l_suppkey", "l_linenumber"), F.lit(_SALT)).cast("int"),
    )
    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1)))
    )
    joined = li.join(o, (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt))
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("total"))
        .orderBy("o_orderpriority")
    )


@query(
    "agg_skew_twophase",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS total
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_skew_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation for a hot group key: aggregate by
    (key, salt) first — spreading each hot key over N partitions — then
    re-aggregate by key. Only 3 distinct l_returnflag values exist, the
    degenerate low-cardinality case where a single-phase shuffle would use
    at most 3 reducers regardless of cluster size; the two-phase form uses
    3×N. Decomposable aggregates only (sum/count/min/max — avg as
    sum÷count)."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALT)).cast("int"),
    )
    partial = li.groupBy("l_returnflag", "salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("l_extendedprice").alias("psum")
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(F.sum("pn").alias("n"), F.round(F.sum("psum"), 2).alias("total"))
        .orderBy("l_returnflag")
    )
