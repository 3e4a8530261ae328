"""Event-analytics operators: ordered funnel, cohort retention, blocked
fuzzy matching — the OLAP workloads an events table exists for. All are
Spark-SQL/DataFrame compositions (no reference analog; Astro's SQL surface
could express them but shipped no such library — SURVEY.md §2.B scope).

Scale notes:
- funnel: one conditional-aggregation pass per user (partial-agg friendly:
  150 users here, millions at scale — the groupBy key is the user, so state
  is one row per user, not per event).
- retention: two aggregations sharing the user-day grain; the distinct
  (user, day) projection collapses the event volume FIRST, so the heavy
  input is reduced before any join.
- fuzzy join: levenshtein inside a block is O(block²); the block key
  (name prefix) bounds the pair space exactly like an LSH band — never run
  edit distance on the unblocked cross product at 100 TB.

Timestamp hazard (SURVEY.md §7.0): events.ts is TIMESTAMP(NANOS); the
engine reads µs via load_events, DuckDB reads ns. Testdata ts values are
exact µs, so ordering/equality agree; only raw sub-second ts is never
projected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_events, load_table


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'view' AND e.ts > s1.t1
                GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.ts) AS t3
                FROM events e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                GROUP BY e.user_id)
    SELECT 'step1_signup' AS step, count(*) AS n_users FROM s1
    UNION ALL SELECT 'step2_view', count(*) FROM s2
    UNION ALL SELECT 'step3_purchase', count(*) FROM s3
    ORDER BY step
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: signup → later view → later purchase. Each step's
    entry time is the min event time AFTER the previous step's — the
    strict-ordering semantics product funnels need (a purchase before the
    first view does not count). Three user-grain aggregations, each a
    partial-agg-friendly groupBy on user_id."""
    ev = load_events(spark, sf_dir)
    ev.createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'signup' GROUP BY user_id),
             s2 AS (SELECT e.user_id, min(e.ts) AS t2
                    FROM events e JOIN s1 ON e.user_id = s1.user_id
                    WHERE e.event_type = 'view' AND e.ts > s1.t1
                    GROUP BY e.user_id),
             s3 AS (SELECT e.user_id, min(e.ts) AS t3
                    FROM events e JOIN s2 ON e.user_id = s2.user_id
                    WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                    GROUP BY e.user_id)
        SELECT 'step1_signup' AS step, count(*) AS n_users FROM s1
        UNION ALL SELECT 'step2_view', count(*) FROM s2
        UNION ALL SELECT 'step3_purchase', count(*) FROM s3
        ORDER BY step
        """
    )


@query(
    "events_retention",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
                FROM events),
         cohort AS (SELECT user_id, min(d) AS c0 FROM ud GROUP BY user_id)
    SELECT cohort.c0 AS cohort_day,
           date_diff('day', cohort.c0, ud.d) AS day_offset,
           count(*) AS n_active
    FROM ud JOIN cohort ON ud.user_id = cohort.user_id
    WHERE date_diff('day', cohort.c0, ud.d) <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active day, counted on
    each subsequent day-offset (first week). The distinct (user, day)
    projection collapses event volume before the cohort join — at 100 TB
    that reduction (events → user-days) is the whole game; the join then
    moves rows proportional to users, not events."""
    ev = load_events(spark, sf_dir)
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    cohort = ud.groupBy("user_id").agg(F.min("d").alias("c0"))
    return (
        ud.join(cohort, "user_id")
        .withColumn("day_offset", F.datediff("d", "c0").cast("long"))
        .filter(F.col("day_offset") <= 7)
        .groupBy(F.col("c0").alias("cohort_day"), "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "join_fuzzy_blocked",
    oracle="""
    WITH c AS (SELECT c_name, substr(c_name, 1, 16) AS blk FROM customer)
    SELECT a.blk, count(*) AS n_pairs
    FROM c a JOIN c b ON a.blk = b.blk AND a.c_name < b.c_name
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    GROUP BY a.blk
    ORDER BY a.blk
    """,
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join: near-identical customer names (edit
    distance ≤ 1) found inside prefix blocks. The block key turns an
    O(n²) similarity join into an equi join plus per-block verification —
    the same candidate-then-verify shape as MinHash-LSH, with levenshtein
    as the verifier. The a < b ordering emits each unordered pair once."""
    c = (
        load_table(spark, sf_dir, "customer")
        .select("c_name", F.substring("c_name", 1, 16).alias("blk"))
    )
    a, b = c.alias("a"), c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.c_name") < F.col("b.c_name")),
        )
        .filter(F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1)
        .groupBy(F.col("a.blk").alias("blk"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("blk")
    )
