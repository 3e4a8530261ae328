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
    """rows-only query, but the estimate itself is boundable: HLL at default
    lgK=12 has ~1.6% standard error; assert within 5% of exact."""
    row = registry.QUERIES["agg_hll_sketch"](spark, SF_DIR).collect()[0]
    from backup_repo_spark.session import load_table

    exact = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert abs(row.merged_estimate - exact) <= max(3, 0.05 * exact), (
        row.merged_estimate,
        exact,
    )
