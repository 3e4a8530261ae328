"""Engine robustness: concurrent query execution on one shared session
(the multi-tenant usage shape an analytics engine must survive) and clean
failure on bad inputs."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from backup_repo_spark import registry
from backup_repo_spark.session import load_table
from tests.conftest import SF_DIR

_CONCURRENT = [
    "agg_tpch_q1",
    "topk_revenue",
    "join_star_5way",
    "win_topn_per_group",
    "agg_distinct",
    "llm_dedup_exact",
    "fn_string",
    "set_union",
]


def test_concurrent_queries_share_one_session(spark):
    """Eight queries driven from eight threads against the same session —
    exercises the table cache and Spark's own thread-safe scheduling. Each
    thread must get the same row count as a serial run."""
    serial = {k: registry.QUERIES[k](spark, SF_DIR).count() for k in _CONCURRENT}

    def run(key: str) -> tuple[str, int]:
        return key, registry.QUERIES[key](spark, SF_DIR).count()

    with ThreadPoolExecutor(max_workers=8) as pool:
        parallel = dict(pool.map(run, _CONCURRENT))
    assert parallel == serial


def test_bad_sf_dir_fails_cleanly(spark):
    with pytest.raises(Exception, match="PATH_NOT_FOUND|Path does not exist"):
        load_table(spark, "/root/testdata/sf_nope", "lineitem").count()


def test_same_query_twice_is_deterministic(spark):
    a = registry.QUERIES["llm_dedup_simhash"](spark, SF_DIR).toPandas()
    b = registry.QUERIES["llm_dedup_simhash"](spark, SF_DIR).toPandas()
    assert a.sort_values(a.columns.tolist()).reset_index(drop=True).equals(
        b.sort_values(b.columns.tolist()).reset_index(drop=True)
    )
