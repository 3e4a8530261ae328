"""AQE skew-join demonstration (VERDICT r5 #6): prove Spark's own
`OptimizeSkewedJoin` rewrite fires on a forced-skew join, and document
when manual salting (operators/skew.py) is and is not needed.

The engine's skew story has three layers:
1. `stats_key_skew` MEASURES skew (run first, decide);
2. AQE skew-join splitting (session.py enables it) FIXES skewed
   sort-merge/shuffled-hash JOINS automatically from exact runtime
   shuffle statistics — this test makes that rewrite visible;
3. manual salting (`join_skew_salted` / `agg_skew_twophase`) remains
   for what AQE does NOT cover: skewed AGGREGATIONS, and joins whose
   skewed side AQE cannot split (e.g. the build side of a broadcast
   that must not be broadcast, or pre-AQE engines).

Verification protocol (per .claude/skills/verify): assert on the
EXECUTED query's final adaptive plan — `count()` wrappers suppress
OptimizeSkewedJoin (it is an extra-shuffle rule), so `collect()` the
real query and read `queryExecution().executedPlan()` afterwards.
Thresholds are lowered so a ~100k-row fixture exhibits "skew" the same
way a 100 TB fact would against production defaults (256 MB advisory);
the rewrite is threshold-relative, so the demonstration is faithful.

Measured interplay worth knowing (found building this test): skew is
judged on POST-PRUNING shuffle bytes. A `count(*)` aggregate above the
join lets Catalyst prune the wide payload before the fact shuffle, and
the "hot" partition collapses to a few KB of near-constant join keys —
below any sane threshold, so AQE correctly does nothing (mapStats:
[1.1KB ... 24KB ... 1.6KB]). The fixture therefore aggregates OVER the
payload so the bytes that make the key hot actually cross the shuffle,
as a real wide fact's would. Corollary for users: row-count skew is not
byte skew; if pruning strips your wide columns before the exchange, the
hot key may be harmless — `stats_key_skew` measures rows, AQE measures
bytes, and both are right.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

# (conf, forced-skew value, production default) — restored after the test
_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    # force SMJ: a broadcast join has no shuffle to split
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # a partition is "skewed" when > factor * median AND > threshold;
    # scale both down so the hot key trips them at test size
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    # keep coalescing from merging the split partitions right back
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def skew_session(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skew_fixture(spark):
    """zipf-ish fact: 90% of rows carry user_id 0, the rest spread evenly —
    the shape stats_key_skew exists to detect. The payload is md5-hex
    (incompressible enough that shuffle bytes track row counts) and is
    AGGREGATED, not dropped, so column pruning cannot strip it before the
    fact exchange — see module docstring."""
    fact = spark.range(120_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise((F.col("id") % 1000).cast("long"))
        .alias("user_id"),
        F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5((F.col("id") + 1).cast("string")),
        ).alias("payload"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("name"),
    )
    return (
        fact.join(dim, "user_id")
        .groupBy("name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.length("payload")).alias("payload_len"),
        )
    )


def test_aqe_splits_skewed_join_partition(skew_session):
    spark = skew_session
    joined = _skew_fixture(spark)
    rows = joined.collect()  # execute the REAL query (no count() wrapper)
    # semantics unchanged by the rewrite: 90% of the fact hits user 0
    by_name = {r["name"]: r["n"] for r in rows}
    assert by_name["u0"] == 108_000
    assert sum(by_name.values()) == 120_000
    final = joined._jdf.queryExecution().executedPlan().toString()
    # OptimizeSkewedJoin marks the join node itself...
    assert "skew=true" in final, f"no skew-split in final plan:\n{final[:2000]}"
    # ...and the skewed side is read through an AQEShuffleRead that lists
    # more partitions than the shuffle wrote (the split).
    assert "AQEShuffleRead" in final


def test_same_join_without_aqe_keeps_single_hot_partition(skew_session):
    """Control: with skew-join splitting off, the identical query keeps
    `skew=false` on its SMJ — proving the marker above is the rewrite
    firing, not a constant."""
    spark = skew_session
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        joined = _skew_fixture(spark)
        joined.collect()
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in final
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
