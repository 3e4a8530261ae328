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
