"""Time-window aggregations — SURVEY.md §2.C rows C1–C4 (batch-equivalent
forms; the live Structured Streaming variants are in streaming/live.py).

The reference (Astro, 2015) predates Structured Streaming entirely — this
module is north-star extension surface (SURVEY.md §2.C). Each query is the
batch-mode evaluation of the same logical window the streaming variant runs;
Spark guarantees batch/streaming agreement for windowed aggregations, which
is what makes a DuckDB oracle possible at all.

Cross-engine notes: window starts are projected as formatted strings
(``date_format`` vs ``strftime``) because Spark timestamps are µs and DuckDB
reads events.ts at ns — identical values, different physical types. Testdata
ts values are exact µs (verified), so truncation and banding agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_events

_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "stream_tumbling",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_s,
           event_type, count(*) AS n, round(sum(value), 2) AS sv
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C2: tumbling 1-hour window aggregation (BASELINE.md
    q_events_window). ``F.window`` is the same operator the streaming plan
    uses; in batch it's a plain group-by on the derived window.

    r14 (guide §2.4): output cardinality is hour-buckets x event_types —
    time-span-bounded (744 x 5 at the fixture's one-month span), far too
    small to need a rangepartitioning sort exchange, so the final
    deterministic order is a SinglePartition sort (coalesce(1)): the
    range-sampling job and its re-run of the window aggregate go away
    (plans/r14/stream_tumbling_{before,after}.txt)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .select(
            F.date_format("w.start", _FMT).alias("hour_s"),
            "event_type",
            "n",
            "sv",
        )
        .coalesce(1)
        .orderBy("hour_s", "event_type")
    )


@query(
    "stream_sliding",
    oracle="""
    WITH starts AS (
      SELECT unnest(generate_series(TIMESTAMP '2023-12-31 23:30:00',
                                    TIMESTAMP '2024-01-31 00:00:00',
                                    INTERVAL 30 MINUTE)) AS s
    )
    SELECT strftime(s, '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n, round(sum(value), 2) AS sv
    FROM events JOIN starts ON ts >= s AND ts < s + INTERVAL 1 HOUR
    GROUP BY s
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: sliding window (1 h length, 30 min slide) — each event lands in 2
    windows via Spark's Expand; the oracle reconstructs the same banding with
    a generate_series range join."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .select(F.date_format("w.start", _FMT).alias("win_start"), "n", "sv")
    )


@query(
    "stream_session",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       < INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events, round(sum(value), 2) AS sv
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: gap-based session window (30 min), keyed by user.
    ``F.session_window`` merges an event into the open session iff
    ts < last_ts + gap (strict) — the oracle's lag-gap cumulative-sum
    sessionization implements exactly that predicate."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sv"))
        .select(
            "user_id",
            F.date_format("w.start", _FMT).alias("session_start"),
            "n_events",
            "sv",
        )
    )
