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
from backup_repo_spark.session import load_events, load_table


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
    ev = load_events(spark, sf_dir).select(
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
    ev = load_events(spark, sf_dir)
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


_BAND_MIN = 30  # minutes


@query(
    "join_range_banded",
    oracle="""
    SELECT a.event_id AS err_id, count(*) AS n_clicks
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'error' AND b.event_type = 'click'
     AND b.ts >= a.ts - INTERVAL 30 MINUTE AND b.ts <= a.ts
    GROUP BY a.event_id ORDER BY a.event_id
    """,
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable interval join via time-bucketing: a naive range join is a
    broadcast-nested-loop (O(n·m) comparisons — dead at 100 TB). Rewrite:
    bucket both sides by 30-minute windows, replicate the probe side into
    its own and the NEXT bucket (a 30-min look-back spans ≤2 buckets), then
    EQUI-join on (user_id, bucket) — hash-partitionable, shuffle-based,
    skew-handled by AQE — and apply the exact band as a residual filter.
    The oracle is the naive range join: identical semantics, different
    join strategy."""
    ev = load_events(spark, sf_dir)
    bucket = (F.unix_timestamp("ts") / (60 * _BAND_MIN)).cast("long")
    errs = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("err_ts"),
        bucket.alias("bkt"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("ts").alias("click_ts"),
        # look-back of one band ⇒ a click is visible from its own bucket and
        # the next one
        F.explode(F.array(bucket, bucket + 1)).alias("cbkt"),
    )
    joined = errs.join(
        clicks,
        (F.col("u") == F.col("cu"))
        & (F.col("bkt") == F.col("cbkt"))
        & (F.col("click_ts") >= F.col("err_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("click_ts") <= F.col("err_ts")),
    )
    return (
        joined.groupBy("err_id").agg(F.count(F.lit(1)).alias("n_clicks")).orderBy("err_id")
    )


@query(
    "ts_interpolate_linear",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(date_diff('hour', TIMESTAMP '2024-01-01',
                            date_trunc('hour', ts)) AS INT) AS h
      FROM events
    ), cnt AS (
      SELECT event_type, h, count(*) AS c FROM e GROUP BY 1, 2
    ), bounds AS (
      SELECT min(h) AS h0, max(h) AS h1 FROM e
    ), grid AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series((SELECT h0 FROM bounds),
                                      (SELECT h1 FROM bounds))) AS h
      ) g
    ), j AS (
      SELECT grid.event_type, grid.h, cnt.c
      FROM grid LEFT JOIN cnt USING (event_type, h)
    ), w AS (
      SELECT event_type, h, c,
        last_value(c IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        first_value(c IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM j
    )
    SELECT event_type, h,
      CASE WHEN c IS NOT NULL THEN c * 1.0
           WHEN pv IS NOT NULL AND nv IS NOT NULL
             THEN pv + (nv - pv) * (h - ph) * 1.0 / (nh - ph)
           ELSE coalesce(pv, nv) * 1.0 END AS filled,
      CAST(c IS NULL AS INT) AS imputed
    FROM w
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series imputation: hourly event counts per type on a dense
    hour grid, missing hours LINEARLY INTERPOLATED between the nearest
    present neighbors (edges carry the nearest value). The neighbor search
    is two IGNORE-NULLS window passes — never a self-join. Integer counts
    keep the interpolation arithmetic IEEE-exact cross-engine.

    Scale: grid build is |types| x |hours| (tiny vs the fact table); the
    two window passes partition by type. At 100 TB, partition the window
    by (type, week) with a 1-hour overlap fringe to bound sort size."""
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir)
    e = ev.select(
        "event_type",
        F.expr(
            "CAST(timestampdiff(HOUR, timestamp'2024-01-01 00:00:00',"
            " date_trunc('hour', ts)) AS INT)"
        ).alias("h"),
    )
    cnt = e.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("c"))
    bounds = e.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(bounds.select(F.explode(F.sequence("h0", "h1")).alias("h")))
    )
    j = grid.join(cnt, ["event_type", "h"], "left")
    back = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    c, h = F.col("c"), F.col("h")
    w = (
        j.withColumn("pv", F.last("c", ignorenulls=True).over(back))
        .withColumn("ph", F.last(F.when(c.isNotNull(), h), ignorenulls=True).over(back))
        .withColumn("nv", F.first("c", ignorenulls=True).over(fwd))
        .withColumn("nh", F.first(F.when(c.isNotNull(), h), ignorenulls=True).over(fwd))
    )
    pv, ph, nv, nh = F.col("pv"), F.col("ph"), F.col("nv"), F.col("nh")
    filled = (
        F.when(c.isNotNull(), c * 1.0)
        .when(
            pv.isNotNull() & nv.isNotNull(),
            pv + (nv - pv) * (h - ph) * F.lit(1.0) / (nh - ph),
        )
        .otherwise(F.coalesce(pv, nv) * 1.0)
    )
    return w.select(
        "event_type", "h", filled.alias("filled"),
        c.isNull().cast("int").alias("imputed"),
    )


@query(
    "ts_seasonal_naive",
    oracle="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hr, count(*) AS c
      FROM events GROUP BY 1
    ), j AS (
      SELECT a.hr, a.c AS actual, b.c AS pred
      FROM h a JOIN h b ON b.hr = a.hr - INTERVAL 7 DAY
    )
    SELECT count(*) AS n_hours,
           CAST(sum(abs(actual - pred)) AS BIGINT) AS abs_err_sum,
           sum(abs(actual - pred)) * 1.0 / count(*) AS mae
    FROM j
    """,
)
def ts_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast BACKTEST: predict each hour's event count
    with the same hour one week earlier, score by MAE — the baseline every
    forecasting pipeline must beat, computed inside the engine (hourly
    rollup, self-join on the lagged key, integer error arithmetic + one
    IEEE division). The rollup shrinks the fact table before the self-join
    touches anything."""
    ev = load_events(spark, sf_dir)
    h = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("c")
    )
    a, b = h.alias("a"), h.alias("b")
    j = a.join(
        b, F.col("b.hr") == F.expr("a.hr - INTERVAL 7 DAY")
    ).select(F.col("a.c").alias("actual"), F.col("b.c").alias("pred"))
    err = F.abs(F.col("actual") - F.col("pred"))
    return j.agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum(err).cast("bigint").alias("abs_err_sum"),
        (F.sum(err) * 1.0 / F.count(F.lit(1))).alias("mae"),
    )


@query(
    "ts_seasonality_profile",
    oracle="""
    WITH c AS (
      SELECT isodow(date_trunc('day', ts)) AS dow,
             CAST(hour(ts) AS INT) AS hod, count(*) AS n
      FROM events GROUP BY 1, 2
    ), t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
    SELECT dow, hod, n, n * 1.0 / t.total AS share
    FROM c CROSS JOIN t
    """,
)
def ts_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality fingerprint: event share per (ISO weekday, hour-of-day)
    cell — the 7x24 profile that seeds anomaly baselines and the seasonal-
    naive forecaster (`ts_seasonal_naive`). Integer counts + one division;
    partial-aggregable with the 1-row total broadcast back."""
    ev = load_events(spark, sf_dir)
    c = ev.groupBy(
        (F.weekday(F.date_trunc("day", F.col("ts"))) + 1).alias("dow"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "dow", "hod", "n", (F.col("n") * 1.0 / F.col("total")).alias("share")
    )


@query(
    "orders_ship_lag_hist",
    oracle="""
    WITH l AS (
      SELECT date_diff('day', o_orderdate, l_shipdate) AS lag_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT CAST(floor(lag_days / 7.0) AS INT) AS lag_week,
           count(*) AS n,
           min(lag_days) AS min_d, max(lag_days) AS max_d
    FROM l GROUP BY 1
    """,
)
def orders_ship_lag_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-lag distribution: order-to-ship day gap per lineitem,
    bucketed by week — the operational-latency histogram. One fact⋈fact
    equi-join (sort-merge at scale, AQE-skew-handled) feeding a tiny
    integer-bucket aggregate; all-integer date arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    l = li.join(o, li.l_orderkey == o.o_orderkey).select(lag.alias("lag_days"))
    return (
        # floor, not DIV: Spark DIV truncates toward zero while DuckDB //
        # floors — they disagree on negative lags, floor() agrees everywhere.
        l.withColumn("lag_week", F.floor(F.col("lag_days") / 7.0).cast("int"))
        .groupBy("lag_week")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lag_days").alias("min_d"),
            F.max("lag_days").alias("max_d"),
        )
    )


@query(
    "ts_week_over_week",
    oracle="""
    WITH w AS (
      SELECT event_type, date_trunc('week', ts) AS wk, count(*) AS n
      FROM events GROUP BY 1, 2
    ), l AS (
      SELECT event_type, wk, n,
             lag(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev
      FROM w
    )
    SELECT event_type, strftime(wk, '%Y-%m-%d') AS week_start, n,
           coalesce(prev, -1) AS prev,
           CASE WHEN prev IS NULL THEN -1.0 ELSE n * 1.0 / prev END AS wow
    FROM l
    """,
)
def ts_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type: weekly rollup + one lag
    window + exact count ratio (NULL first-week coalesced to sentinels
    per the hash-compare policy). The standard KPI delta query; the
    window partitions by type so weeks of different types never
    serialize together."""
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir)
    w = ev.groupBy("event_type", F.date_trunc("week", "ts").alias("wk")).agg(
        F.count(F.lit(1)).alias("n")
    )
    prev = F.lag("n").over(Window.partitionBy("event_type").orderBy("wk"))
    return w.select(
        "event_type",
        F.date_format("wk", "yyyy-MM-dd").alias("week_start"),
        "n",
        prev.alias("prev"),
    ).select(
        "event_type", "week_start", "n",
        F.coalesce("prev", F.lit(-1)).alias("prev"),
        F.when(F.col("prev").isNull(), -1.0)
        .otherwise(F.col("n") * 1.0 / F.col("prev"))
        .alias("wow"),
    )


@query(
    "ts_inter_event_gaps",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_type, count(*) AS n_gaps,
           CAST(min(gap_us) AS BIGINT) AS min_us,
           median(gap_us) AS p50_us,
           quantile_cont(gap_us, 0.9) AS p90_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def ts_inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution per type (arrival-process profile —
    feeds session-gap and watermark tuning: the 30-min session gap and
    10-min watermark in this repo were chosen from exactly this view).
    Integer µs lag differences; exact interpolated percentiles. The gap
    window partitions by user; the percentile rollup is per type."""
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir)
    us = F.unix_micros("ts")
    gap = us - F.lag(us).over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
    g = ev.select("event_type", gap.alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").cast("bigint").alias("min_us"),
        F.expr("percentile(gap_us, 0.5)").alias("p50_us"),
        F.expr("percentile(gap_us, 0.9)").alias("p90_us"),
    )


@query(
    "ts_seasonal_anomaly",
    oracle="""
    WITH slot AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             isodow(date_trunc('day', ts)) AS dow,
             CAST(hour(ts) AS INT) AS hod, count(*) AS n
      FROM events GROUP BY 1, 2, 3
    ), base AS (
      SELECT dow, hod, CAST(sum(n) AS BIGINT) AS total, count(*) AS n_days
      FROM slot GROUP BY 1, 2
    )
    SELECT s.day, s.hod, s.n, base.total, base.n_days
    FROM slot s JOIN base USING (dow, hod)
    WHERE 2 * s.n * base.n_days > 3 * base.total
    """,
)
def ts_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONALLY-AWARE anomaly flags: an hour-slot is anomalous when its
    count exceeds 1.5x the historical average for the SAME (weekday, hour)
    cell — a Monday-9am spike is judged against Monday-9am history, not a
    global mean (which `events_anomaly_mad` provides). The 1.5x-average test
    is cross-multiplied into pure integers (2*n*n_days > 3*total): no
    division, no float, bit-exact. Two rollups + one broadcast join."""
    ev = load_events(spark, sf_dir)
    slot = ev.groupBy(
        F.to_date("ts").alias("day"),
        (F.weekday(F.date_trunc("day", F.col("ts"))) + 1).alias("dow"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"))
    base = slot.groupBy("dow", "hod").agg(
        F.sum("n").cast("bigint").alias("total"), F.count(F.lit(1)).alias("n_days")
    )
    return (
        slot.join(F.broadcast(base), ["dow", "hod"])
        .filter(2 * F.col("n") * F.col("n_days") > 3 * F.col("total"))
        .select("day", "hod", "n", "total", "n_days")
    )


@query(
    "ts_cross_correlation",
    oracle="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hr,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS clicks,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS buys
      FROM events GROUP BY 1
    )
    SELECT count(*) AS n_hours,
           round(corr(clicks, buys), 4) AS corr_same_hour,
           round(corr(prev_clicks, buys), 4) AS corr_lag1
    FROM (
      SELECT hr, clicks, buys,
             lag(clicks) OVER (ORDER BY hr) AS prev_clicks
      FROM h
    ) WHERE prev_clicks IS NOT NULL
    """,
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series correlation: do clicks move with purchases, and do
    LAST hour's clicks predict THIS hour's purchases (lag-1 lead
    indicator)? Hourly rollup → one lag window → two corr() aggregates
    (rounded per the float-aggregate policy). The lead-indicator shape
    behind forecasting-feature selection, fully in-engine."""
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir)
    h = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("bigint").alias("clicks"),
        F.sum((F.col("event_type") == "purchase").cast("int")).cast("bigint").alias("buys"),
    )
    lagged = h.select(
        "hr", "clicks", "buys",
        F.lag("clicks").over(Window.orderBy("hr")).alias("prev_clicks"),
    ).filter(F.col("prev_clicks").isNotNull())
    return lagged.agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.round(F.corr("clicks", "buys"), 4).alias("corr_same_hour"),
        F.round(F.corr("prev_clicks", "buys"), 4).alias("corr_lag1"),
    )


@query(
    "ts_distribution_drift",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)    AS c1,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)     AS c2,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c3,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)    AS c4,
             CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)   AS c5,
             count(*) AS n
      FROM events GROUP BY 1
    ), l AS (
      SELECT day, c1, c2, c3, c4, c5, n,
             lag(c1) OVER w AS p1, lag(c2) OVER w AS p2, lag(c3) OVER w AS p3,
             lag(c4) OVER w AS p4, lag(c5) OVER w AS p5, lag(n) OVER w AS pn
      FROM d WINDOW w AS (ORDER BY day)
    )
    SELECT day,
           abs(c1 * 1.0 / n - p1 * 1.0 / pn) + abs(c2 * 1.0 / n - p2 * 1.0 / pn)
         + abs(c3 * 1.0 / n - p3 * 1.0 / pn) + abs(c4 * 1.0 / n - p4 * 1.0 / pn)
         + abs(c5 * 1.0 / n - p5 * 1.0 / pn) AS drift_l1
    FROM l WHERE pn IS NOT NULL
    """,
)
def ts_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution DRIFT monitor: L1 distance between consecutive days'
    event-type mix — the input-drift alarm every deployed-model pipeline
    watches. Categories are pivoted to fixed columns so the five |Δshare|
    terms add in a fixed expression order (deterministic doubles — a
    groupBy-sum over categories would be order-dependent); shares are
    exact count ratios. One rollup + one lag window over ~30 rows."""
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir)
    cnt = lambda t: F.sum((F.col("event_type") == t).cast("int")).cast("bigint")  # noqa: E731
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        cnt("click").alias("c1"), cnt("view").alias("c2"),
        cnt("purchase").alias("c3"), cnt("error").alias("c4"),
        cnt("signup").alias("c5"), F.count(F.lit(1)).alias("n"),
    )
    w = Window.orderBy("day")
    l = d.select(
        "day", "c1", "c2", "c3", "c4", "c5", "n",
        *[F.lag(c).over(w).alias(f"p{i}") for i, c in enumerate(["c1", "c2", "c3", "c4", "c5"], 1)],
        F.lag("n").over(w).alias("pn"),
    ).filter(F.col("pn").isNotNull())
    drift = None
    for i in range(1, 6):
        term = F.abs(
            F.col(f"c{i}") * 1.0 / F.col("n") - F.col(f"p{i}") * 1.0 / F.col("pn")
        )
        drift = term if drift is None else drift + term
    return l.select("day", drift.alias("drift_l1"))


@query(
    "ts_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, count(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    stats AS (SELECT avg(n) AS mu FROM daily),
    cus AS (
      SELECT day, n,
             round(sum(n - (SELECT mu FROM stats))
                   OVER (ORDER BY day ROWS UNBOUNDED PRECEDING), 4) + 0.0 AS cusum
      FROM daily
    )
    SELECT day, CAST(n AS BIGINT) AS n, cusum,
           CAST(abs(cusum) = (SELECT max(abs(cusum)) FROM cus) AS INTEGER)
             AS is_changepoint
    FROM cus ORDER BY day
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on the daily purchase series: the
    cumulative sum of deviations from the series mean peaks (in absolute
    value) at the most likely level-shift day — the classic offline
    change-point statistic, computed with one ordered window over a
    30-row daily rollup (window input is the ROLLUP, never raw events, so
    the single-partition ordered sum is over days, not data). Determinism
    recipe: deviations sum in day order on both engines (sequential window
    sums are order-pinned), rounded before the argmax flag; + 0.0 collapses IEEE -0.0
    (a -0.0/0.0 render split breaks canonical row sorting). The mean and
    the peak are broadcast 1-row aggregates fused into the plan
    (crossJoin(broadcast(agg)) — the same scalar pattern used everywhere
    else), not driver collect()s, so the whole statistic is one job."""
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir)
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mu = daily.agg(F.avg("n").alias("mu"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cus = daily.crossJoin(F.broadcast(mu)).select(
        "day",
        F.col("n").cast("bigint").alias("n"),
        (F.round(F.sum(F.col("n") - F.col("mu")).over(w), 4) + F.lit(0.0)).alias(
            "cusum"
        ),
    )
    peak = cus.agg(F.max(F.abs("cusum")).alias("peak"))
    return (
        cus.crossJoin(F.broadcast(peak))
        .select(
            "day",
            "n",
            "cusum",
            (F.abs("cusum") == F.col("peak")).cast("int").alias("is_changepoint"),
        )
        .orderBy("day")
    )


@query(
    "ts_ewma",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, count(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    idx AS (
      SELECT day, n,
             row_number() OVER (ORDER BY day) - 1 AS t
      FROM daily
    ),
    acc AS (
      SELECT day, n, t,
             sum(n * pow(0.7, -t)) OVER (ORDER BY t
               ROWS UNBOUNDED PRECEDING) AS c,
             first_value(n) OVER (ORDER BY t) AS x0
      FROM idx
    )
    SELECT day, CAST(n AS BIGINT) AS n,
           round(pow(0.7, t) * (0.3 * (c - x0) + x0), 4) AS ewma
    FROM acc ORDER BY day
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=0.3) of the daily
    purchase series — the standard smoothing/alerting baseline. The
    recursion ewma_t = a*x_t + (1-a)*ewma_{t-1} (init x_0) is not a SQL
    window, but its closed form is: ewma_t = (1-a)^t * (a*sum_{i=1..t}
    x_i (1-a)^{-i} + x_0) — ONE cumulative-sum window over the daily
    rollup plus a map-only rescale. The (1-a)^{-i} terms stay bounded
    because the window input is the ~30-row ROLLUP, never raw events —
    at 100 TB the shuffle is the per-day aggregate, and the ordered
    window runs over days."""
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir)
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_ord = Window.orderBy("day")
    idx = daily.select(
        "day", "n", (F.row_number().over(w_ord) - 1).alias("t")
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    w_first = Window.orderBy("t")
    acc = idx.select(
        "day",
        "n",
        "t",
        F.sum(F.col("n") * F.pow(F.lit(0.7), -F.col("t"))).over(w_cum).alias("c"),
        F.first("n").over(w_first).alias("x0"),
    )
    ewma = F.pow(F.lit(0.7), F.col("t")) * (
        0.3 * (F.col("c") - F.col("x0")) + F.col("x0")
    )
    return acc.select(
        "day", F.col("n").cast("bigint").alias("n"), F.round(ewma, 4).alias("ewma")
    ).orderBy("day")


@query(
    "ts_acf",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS y
      FROM events GROUP BY 1
    ),
    lags AS (SELECT k FROM generate_series(1, 7) g(k)),
    pairs AS (
      SELECT l.k, a.y AS x, b.y AS yy
      FROM daily a JOIN lags l ON TRUE
      JOIN daily b ON b.d = a.d + CAST(l.k AS INTEGER)
    ),
    m AS (
      SELECT k, count(*) AS n, sum(x) AS sx, sum(yy) AS sy,
             sum(x * yy) AS sxy, sum(x * x) AS sxx, sum(yy * yy) AS syy
      FROM pairs GROUP BY k
    )
    SELECT k AS lag, n,
           round(
             CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 6) AS acf_r6
    FROM m
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    ORDER BY k
    """,
)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-count series at lags
    1..7 — the seasonality/persistence diagnostic behind forecast-model
    selection (sibling of ts_cross_correlation, which is cross-series at
    lag 1). Deliberately NOT the engines' corr() aggregate: its streaming
    accumulator merges are partition-order-dependent; instead Pearson is
    assembled from EXACT integer moment sums (daily counts are ints;
    products bounded ≈ 10^10 at sf0.1), so the only floats are one
    division and two IEEE sqrt's on identical integers — bit-stable.

    Scale: one day-rollup (partial-aggregable), a 7-row lag-constant
    broadcast join, one self-join on shifted day keys (30×7 rows), one
    moment aggregate. Degenerate lags (fewer than 2 pairs, or a constant
    series with zero variance — 0/0 is NaN in Spark but NULL in DuckDB)
    are filtered identically in both engines rather than emitted as
    engine-specific non-values. Nothing scales with raw event count but
    the first rollup."""
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(F.count(F.lit(1)).alias("y"))
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("k"))
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("x"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yy"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.expr("date_add(da, k)"))
    )
    m = pairs.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yy").alias("sy"),
        F.sum(F.col("x") * F.col("yy")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("yy") * F.col("yy")).alias("syy"),
    )
    return m.filter(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
    ).select(
        F.col("k").alias("lag"), "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
            / F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")),
            6,
        ).alias("acf_r6"),
    )


@query(
    "ts_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS y
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT y, CAST(d - DATE '2024-01-01' AS BIGINT) AS t FROM daily
    ),
    slopes AS (
      SELECT (b.y - a.y) * 1000000 // (b.t - a.t) AS slope_ppm
      FROM idx a JOIN idx b ON b.t > a.t
    )
    SELECT count(*) AS n_pairs,
           CAST(quantile_disc(slope_ppm, 0.5) AS BIGINT) AS theil_sen_slope_ppm
    FROM slopes
    """,
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimator over the daily event-count series:
    the MEDIAN of all pairwise slopes — immune to the outlier days that
    wreck least-squares (the robust sibling of agg_regression). Slopes are
    truncating-integer ppm (exact: integer Δy·10⁶ // integer Δdays) and
    the median is the DISCRETE quantile (an actual observed slope), so
    the estimate is bit-deterministic with no interpolation convention to
    align.

    Scale: pairwise slopes are O(days²) — 435 pairs on a 30-day rollup;
    at years of history pre-aggregate to weeks or use the repeated-median
    variant per bounded window. The fact-table scan collapses to the day
    rollup first, so data volume never enters the quadratic term."""
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(F.count(F.lit(1)).alias("y"))
    idx = daily.select(
        "y", F.datediff(F.col("d"), F.lit("2024-01-01").cast("date")).cast("long").alias("t")
    )
    a = idx.select(F.col("t").alias("ta"), F.col("y").alias("ya"))
    b = idx.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    slopes = a.join(b, F.col("tb") > F.col("ta")).select(
        F.expr("(yb - ya) * 1000000 DIV (tb - ta)").alias("slope_ppm")
    )
    return slopes.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY slope_ppm) AS BIGINT)").alias(
            "theil_sen_slope_ppm"
        ),
    )


@query(
    "ts_hampel_filter",
    oracle="""
    WITH base AS (
      SELECT user_id, event_id, value,
             quantile_cont(value, 0.5) OVER w AS med
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    dev AS (
      SELECT user_id, event_id, value, med,
             quantile_cont(abs(value - med), 0.5) OVER w AS mad
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    )
    SELECT user_id, event_id, value, med, mad,
           CAST(CASE WHEN abs(value - med) > 3 * 1.4826 * mad
                THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
    FROM dev
    """,
)
def ts_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier filter: per-user centered 7-point rolling MEDIAN and
    rolling MAD (median of |value − local median| over the same frame);
    a point is an outlier when it sits more than 3 scaled MADs
    (k = 3·1.4826, the Gaussian consistency constant) from its local
    median — the robust despiking standard for sensor/metric streams,
    immune to the outliers a rolling z-score lets poison its own mean.

    Determinism: exact interpolated percentile is selection + one IEEE
    midpoint (bit-identical across engines, same argument as
    win_moving_median); the threshold comparison multiplies bit-identical
    doubles by a literal, so the boundary decision cannot diverge.  Both
    rolling medians share ONE shuffle on user_id (the second window
    re-sorts within the same partitioning); at 100 TB this is the keyed-
    window pattern scaling with events per user.  The second frame orders
    by event_id alone — deterministic because event_id embeds the ts
    order within a user (asserted equivalent in tests)."""
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    base = ev.select(
        "user_id",
        "event_id",
        "value",
        F.expr("percentile(value, 0.5)").over(w1).alias("med"),
    )
    w2 = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-3, 3)
    dev = base.withColumn(
        "mad",
        F.expr("percentile(abs(value - med), 0.5)").over(w2),
    )
    return dev.select(
        "user_id",
        "event_id",
        "value",
        "med",
        "mad",
        F.when(
            F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad"), 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("is_outlier"),
    )


@query(
    "ts_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS y
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(coalesce(sum(CASE WHEN b.y > a.y THEN 1
                                    WHEN b.y < a.y THEN -1 ELSE 0 END), 0)
                  AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
    ties AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tt
      FROM (SELECT count(*) AS t FROM daily GROUP BY y)
    )
    SELECT n, s_stat,
           n * (n - 1) * (2 * n + 5) - tt AS var18,
           CAST(round(
             CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt((n * (n - 1) * (2 * n + 5) - tt) / 18.0)
                  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt((n * (n - 1) * (2 * n + 5) - tt) / 18.0)
                  ELSE 0.0 END * 1000000) AS BIGINT) AS z_micro
    FROM s CROSS JOIN nn CROSS JOIN ties
    """,
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on the daily event-count series — the
    standard nonparametric "is there a monotonic trend" gate for metric
    drift (companion to stats_mann_whitney's two-cohort shift test and
    ts_cusum_changepoint's level-shift detector).  S = Σ sign(y_j − y_i)
    over day pairs i<j and the tie term are exact BIGINTs; the only
    floats are the final continuity-corrected z — one sqrt and one
    division on identical integers, rounded to micro.

    Scale: the pair space is the DAILY ROLLUP self-join — bounded by the
    calendar window (≤30×30 here; ≤366² for a year), never the raw
    stream, so the deliberate inequality join is constant-size at any
    data volume (whitelisted like stats_kendall_tau's value grid)."""
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    s = a.join(b, F.col("da") < F.col("db")).agg(
        F.coalesce(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("s_stat")
    )
    nn = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tt")
        )
    )
    n, ss, tt = F.col("n"), F.col("s_stat"), F.col("tt")
    var18 = n * (n - 1) * (2 * n + 5) - tt
    # try_divide: n<2 or an all-tied series zeroes the variance — both
    # engines must yield NULL, not raise (module ANSI rule).
    denom = F.sqrt(var18 / F.lit(18.0))
    z = (
        F.when(ss > 0, F.try_divide(ss - 1, denom))
        .when(ss < 0, F.try_divide(ss + 1, denom))
        .otherwise(F.lit(0.0))
    )
    return (
        s.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .select(
            "n",
            "s_stat",
            var18.alias("var18"),
            F.round(z * 1000000).cast("bigint").alias("z_micro"),
        )
    )


@query(
    "ts_pacf",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS y
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(y) AS HUGEINT) AS s,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS p0
      FROM daily
    ),
    lagm AS (
      SELECT l.k,
             CAST(count(*) AS HUGEINT) AS m,
             CAST(sum(CAST(a.y AS HUGEINT) * b.y) AS HUGEINT) AS p,
             CAST(sum(a.y) AS HUGEINT) AS sa,
             CAST(sum(b.y) AS HUGEINT) AS sb
      FROM daily a
      JOIN (SELECT k FROM generate_series(1, 4) g(k)) l ON TRUE
      JOIN daily b ON b.d = a.d + CAST(l.k AS INTEGER)
      GROUP BY l.k
    ),
    cov AS (
      SELECT t.n,
             CAST(t.n * t.n * t.p0 - 2 * t.n * t.s * t.s + t.n * t.s * t.s
                  AS DOUBLE) AS c0,
             max(CASE WHEN k = 1 THEN CAST(t.n*t.n*p - t.n*t.s*(sa+sb) + m*t.s*t.s AS DOUBLE) END) AS c1,
             max(CASE WHEN k = 2 THEN CAST(t.n*t.n*p - t.n*t.s*(sa+sb) + m*t.s*t.s AS DOUBLE) END) AS c2,
             max(CASE WHEN k = 3 THEN CAST(t.n*t.n*p - t.n*t.s*(sa+sb) + m*t.s*t.s AS DOUBLE) END) AS c3,
             max(CASE WHEN k = 4 THEN CAST(t.n*t.n*p - t.n*t.s*(sa+sb) + m*t.s*t.s AS DOUBLE) END) AS c4
      FROM lagm CROSS JOIN tot t
      GROUP BY t.n, t.p0, t.s
    ),
    r AS (
      SELECT CAST(n AS BIGINT) AS n,
             c1 / nullif(c0, 0) AS r1, c2 / nullif(c0, 0) AS r2,
             c3 / nullif(c0, 0) AS r3, c4 / nullif(c0, 0) AS r4
      FROM cov
    ),
    l2 AS (
      SELECT n, r1, r2, r3, r4, r1 AS p11,
             (r2 - (r1 * r1)) / nullif(1 - (r1 * r1), 0) AS p22
      FROM r
    ),
    l3 AS (
      SELECT n, r1, r2, r3, r4, p11, p22,
             (p11 - (p22 * p11)) AS f21
      FROM l2
    ),
    l4 AS (
      SELECT n, r1, r2, r3, r4, p11, p22, f21,
             (r3 - ((f21 * r2) + (p22 * r1)))
               / nullif(1 - ((f21 * r1) + (p22 * r2)), 0) AS p33
      FROM l3
    ),
    l5 AS (
      SELECT n, r1, r2, r3, r4, p11, p22, p33,
             (f21 - (p33 * p22)) AS f31,
             (p22 - (p33 * f21)) AS f32
      FROM l4
    ),
    l6 AS (
      SELECT n, p11, p22, p33,
             (r4 - (((f31 * r3) + (f32 * r2)) + (p33 * r1)))
               / nullif(1 - (((f31 * r1) + (f32 * r2)) + (p33 * r3)), 0) AS p44
      FROM l5
    )
    SELECT n,
           CAST(round(p11 * 1000000) AS BIGINT) AS pacf1_micro,
           CAST(round(p22 * 1000000) AS BIGINT) AS pacf2_micro,
           CAST(round(p33 * 1000000) AS BIGINT) AS pacf3_micro,
           CAST(round(p44 * 1000000) AS BIGINT) AS pacf4_micro
    FROM l6
    """,
)
def ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily event-count series at lags
    1..4 via the Durbin-Levinson recursion — the AR-order selection
    diagnostic that complements ts_acf (ACF tails off for AR processes;
    PACF cuts off at the true order).

    Determinism recipe: the autocovariances are computed EXACTLY first —
    n²·c_k = n²·Σ(y_t·y_{t+k}) − n·S·(ΣA + ΣB) + m_k·S², all HUGEINT/
    DECIMAL(38) integer arithmetic — so each r_k is ONE double division
    of identical integers; the DL recursion to lag 4 is then an explicit
    scalar chain of IEEE basic ops with IDENTICAL parenthesization in
    both engines (each op correctly rounded, same tree → same doubles),
    rounded to micro at the end.  Division guards (nullif / try_divide)
    make the constant-series case NULL on both engines.

    Scale: one daily rollup (partial-aggregable) + a 4-lag shifted
    self-join of <=30 rows + one 1-row scalar chain — nothing but the
    rollup touches raw data volume."""
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = daily.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("y").cast("decimal(38,0)").alias("s"),
        F.sum(d38(F.col("y")) * F.col("y")).cast("decimal(38,0)").alias("p0"),
    )
    lags = spark.range(1, 5).select(F.col("id").cast("int").alias("k"))
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    lagm = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.expr("date_add(da, k)"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("m"),
            F.sum(d38(F.col("ya")) * F.col("yb")).cast("decimal(38,0)").alias("p"),
            F.sum("ya").cast("decimal(38,0)").alias("sa"),
            F.sum("yb").cast("decimal(38,0)").alias("sb"),
        )
    )
    n, s, p0 = F.col("n"), F.col("s"), F.col("p0")
    ck = (
        n * n * F.col("p") - n * s * (F.col("sa") + F.col("sb"))
        + F.col("m") * s * s
    ).cast("double")
    cov = (
        lagm.crossJoin(F.broadcast(tot))
        .groupBy("n", "p0", "s")
        .agg(
            *[
                F.max(F.when(F.col("k") == k, ck)).alias(f"c{k}")
                for k in (1, 2, 3, 4)
            ]
        )
        .select(
            n.cast("bigint").alias("n"),
            (n * n * p0 - 2 * n * s * s + n * s * s).cast("double").alias("c0"),
            "c1", "c2", "c3", "c4",
        )
    )
    r = cov.select(
        "n",
        *[
            F.try_divide(F.col(f"c{k}"), F.nullif(F.col("c0"), F.lit(0.0))).alias(f"r{k}")
            for k in (1, 2, 3, 4)
        ],
    )
    r1, r2, r3, r4 = (F.col(f"r{k}") for k in (1, 2, 3, 4))
    l2 = r.select(
        "n", "r1", "r2", "r3", "r4",
        r1.alias("p11"),
        F.try_divide(
            r2 - (r1 * r1), F.nullif(F.lit(1.0) - (r1 * r1), F.lit(0.0))
        ).alias("p22"),
    )
    l3 = l2.select(
        "*", (F.col("p11") - (F.col("p22") * F.col("p11"))).alias("f21")
    )
    f21, p22 = F.col("f21"), F.col("p22")
    l4 = l3.select(
        "*",
        F.try_divide(
            r3 - ((f21 * r2) + (p22 * r1)),
            F.nullif(F.lit(1.0) - ((f21 * r1) + (p22 * r2)), F.lit(0.0)),
        ).alias("p33"),
    )
    p33 = F.col("p33")
    l5 = l4.select(
        "*",
        (f21 - (p33 * p22)).alias("f31"),
        (p22 - (p33 * f21)).alias("f32"),
    )
    f31, f32 = F.col("f31"), F.col("f32")
    l6 = l5.select(
        "n", "p11", "p22", "p33",
        F.try_divide(
            r4 - (((f31 * r3) + (f32 * r2)) + (p33 * r1)),
            F.nullif(
                F.lit(1.0) - (((f31 * r1) + (f32 * r2)) + (p33 * r3)),
                F.lit(0.0),
            ),
        ).alias("p44"),
    )
    return l6.select(
        "n",
        *[
            F.round(F.col(f"p{k}{k}") * 1000000).cast("bigint").alias(f"pacf{k}_micro")
            for k in (1, 2, 3, 4)
        ],
    )


# Shared Holt-linear recursion (Spark 4 recursive CTE == DuckDB recursive
# CTE): identical SQL text on both engines, so the 29-step float
# recursion is the same sequence of correctly-rounded IEEE ops — bit-
# identical without any integer trick. __SRC__ is the daily rollup.
_HOLT_CORE = """
idx AS (
  SELECT d, y, row_number() OVER (ORDER BY d) AS t
  FROM __SRC__
),
holt(t, level, trend) AS (
  SELECT 2, CAST(a.y AS DOUBLE),
         CAST(b.y AS DOUBLE) - CAST(a.y AS DOUBLE)
  FROM idx a JOIN idx b ON a.t = 1 AND b.t = 2
  UNION ALL
  SELECT i.t,
         (0.3 * i.y) + (0.7 * (h.level + h.trend)),
         (0.2 * (((0.3 * i.y) + (0.7 * (h.level + h.trend))) - h.level))
           + (0.8 * h.trend)
  FROM holt h JOIN idx i ON i.t = h.t + 1
)
SELECT i.d AS day, i.y,
       CAST(round(h.level * 1000000) AS BIGINT) AS level_micro,
       CAST(round(h.trend * 1000000) AS BIGINT) AS trend_micro,
       CAST(round((h.level + h.trend) * 1000000) AS BIGINT)
         AS forecast_next_micro
FROM holt h JOIN idx i ON i.t = h.t
ORDER BY day
"""


@query(
    "ts_holt_linear",
    oracle=(
        "WITH RECURSIVE daily AS ("
        "  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS y"
        "  FROM events GROUP BY 1), "
        + _HOLT_CORE.replace("__SRC__", "daily")
    ),
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double exponential) smoothing of the daily event-count
    series — level+trend state, alpha=0.3 / beta=0.2, the one-step-ahead
    forecast EWMA cannot produce (EWMA has no trend state; ts_ewma is the
    level-only sibling).  Implemented as a RECURSIVE CTE — Spark 4's
    WITH RECURSIVE — running the textbook coupled recursion over the day
    index; the oracle runs the IDENTICAL SQL text in DuckDB, so all ~29
    steps are the same sequence of correctly-rounded IEEE ops and the
    results match to the bit (then micro-rounded).

    Scale: the recursion runs over the DAILY ROLLUP (29 rows here; 366 a
    year) — each step is a 1-row join, and nothing but the first rollup
    touches raw volume.  The day-index window is over the same bounded
    rollup (whitelisted).  Recursion depth = days in window, far under
    the engine's limit."""
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    return spark.sql(
        "WITH RECURSIVE " + _HOLT_CORE.replace("__SRC__", "{daily}"),
        daily=daily,
    )
