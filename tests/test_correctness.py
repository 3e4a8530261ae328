"""Differential-oracle tests: every registered query vs DuckDB at sf0.001.

This is a fast local mirror of the driver's t2 gate (which runs at sf0.01);
tools/selfcheck.py runs the same comparison at driver scale.
"""

from __future__ import annotations

import pytest

from backup_repo_spark import registry
from backup_repo_spark.testing import compare, hard_problems
from tests.conftest import SF_DIR

ALL_KEYS = sorted(registry.QUERIES)


@pytest.mark.parametrize("name", ALL_KEYS)
def test_query_matches_oracle(name, spark, duck):
    spark_pdf = registry.QUERIES[name](spark, SF_DIR).toPandas()
    if name not in registry.ORACLES:
        # rows-only contract: just verify it executes and yields a schema
        assert spark_pdf is not None
        assert len(spark_pdf.columns) > 0
        return
    duck_pdf = duck.execute(registry.ORACLES[name]).fetchdf()
    problems = hard_problems(compare(spark_pdf, duck_pdf))
    assert not problems, f"{name}: {problems}"


def test_hll_sketch_estimate_accuracy(spark):
    """The query now carries its own bounds contract (merged_within_5pct,
    oracled TRUE); re-assert it here against an independently computed
    exact count so a bug in the query's own anchor column can't self-mask."""
    row = registry.QUERIES["agg_hll_sketch"](spark, SF_DIR).collect()[0]
    from backup_repo_spark.session import load_table

    exact = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert row.exact_total_du == exact
    assert bool(row.merged_within_5pct), row


def test_hampel_event_id_order_matches_ts_order(spark):
    """ts_hampel_filter's second window orders by event_id alone (its
    docstring claims equivalence to (ts, event_id) order within a user) —
    assert zero inversions so the claim stays pinned to the data."""
    from pyspark.sql import Window

    from backup_repo_spark.session import load_events

    ev = load_events(spark, SF_DIR)
    w = Window.partitionBy("user_id").orderBy("event_id")
    from pyspark.sql import functions as F

    inv = (
        ev.select("user_id", "ts", F.lag("ts").over(w).alias("pts"))
        .where(F.col("pts") > F.col("ts"))
        .count()
    )
    assert inv == 0
