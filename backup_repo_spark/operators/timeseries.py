"""Time-series operators over the events stream table — gap-filled resample
and per-period first/last (OHLC-style) rollups.

Reference parity: none (Astro has no time-series surface; SURVEY.md §1.1
last row). These are north-star extensions: the batch analogs of the
streaming windows in streaming/windows.py, expressed so DuckDB can oracle
them.

Scale notes (100 TB): the dense time grid is generated from ONE global
min/max aggregate (2 scalars broadcast back), never by collecting events;
grid size = periods × series keys, independent of event count. min_by/
max_by give first/last-in-window without a sort or a window function —
a single hash aggregate, versus the sort-per-partition a row_number()
approach would cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table


@query(
    "ts_resample_gapfill",
    oracle="""
    WITH ev AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, value FROM events
    ),
    b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ev),
    grid AS (
      SELECT t.event_type, g.hour
      FROM (SELECT DISTINCT event_type FROM ev) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
                  FROM b) g
    ),
    c AS (
      SELECT event_type, hour, count(*) AS n, round(sum(value), 2) AS total
      FROM ev GROUP BY event_type, hour
    )
    SELECT grid.event_type, grid.hour,
           coalesce(c.n, 0) AS n, coalesce(c.total, 0.0) AS total
    FROM grid LEFT JOIN c ON grid.event_type = c.event_type AND grid.hour = c.hour
    ORDER BY grid.event_type, grid.hour
    """,
)
def ts_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with zero-filled gaps: dense (event_type × hour) grid
    from sequence(min,max) × distinct keys, left-joined against the hourly
    aggregate. The empty hours appear with n=0 — the property a naive
    groupBy cannot give."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("hour"), "value"
    )
    bounds = ev.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    grid = ev.select("event_type").distinct().crossJoin(hours)
    counts = ev.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    return (
        grid.join(counts, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
        .orderBy("event_type", "hour")
    )


@query(
    "ts_daily_ohlc",
    oracle="""
    SELECT event_type, date_trunc('day', ts) AS day,
           min_by(value, ts) AS open_v,
           max_by(value, ts) AS close_v,
           min(value) AS lo,
           max(value) AS hi,
           count(*) AS n
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    ORDER BY event_type, day
    """,
)
def ts_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open/high/low/close per event_type: first/last-by-timestamp via
    min_by/max_by — one hash aggregate, no window sort. Selected values are
    projected raw (selection, not arithmetic — bit-identical cross-engine);
    sub-second ns timestamps make open/close ties practically impossible."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.min_by("value", "ts").alias("open_v"),
            F.max_by("value", "ts").alias("close_v"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type", "day")
    )
