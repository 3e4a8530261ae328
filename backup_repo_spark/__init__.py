"""backup_repo_spark — a PySpark-native analytics engine with the query and
data-processing surface of Huawei-Spark/Backup-Repo (Astro, "Spark SQL on
HBase"), re-expressed Spark-first per SURVEY.md.

Importing this package populates the query registry (registry.QUERIES /
registry.ORACLES) — the driver contract in ``__spark_entry__.py`` reads it.
"""

from backup_repo_spark import registry, session  # noqa: F401

# Import every query module for its registration side effects.
from backup_repo_spark.functions import packs  # noqa: F401
from backup_repo_spark.llm import (  # noqa: F401
    bpe,
    dedup,
    lm,
    multimodal,
    pipeline,
    pq,
    simsearch,
    textstats,
)
from backup_repo_spark.operators import (  # noqa: F401
    aggregates,
    events_analytics,
    graph,
    joins,
    mlsql,
    modern_sql,
    nested,
    projections,
    rankstats,
    scans,
    reshape,
    setops,
    skew,
    skyline,
    similarity_join,
    sorts,
    subqueries,
    timeseries,
    tpch_full,
    tpch_more,
    windows,
)
from backup_repo_spark.plans import inspect as plans_inspect  # noqa: F401
from backup_repo_spark.sources import (  # noqa: F401
    astro_datasource,
    astro_dialect,
    clustering,
    dml,
    layout,
)
from backup_repo_spark.streaming import live as streaming_live  # noqa: F401
from backup_repo_spark.streaming import windows as streaming_windows  # noqa: F401
from backup_repo_spark.udx import surface as udx_surface  # noqa: F401

__all__ = ["registry", "session"]
