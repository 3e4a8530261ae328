"""Classical ML and statistical tests as pure DataFrame/SQL programs —
k-means (Lloyd), naive Bayes, decision stumps, two-sample KS, chi-square.

Not in the reference (Astro exposes no ML surface); included because a
100 TB curation pipeline trains/score-gates with exactly these primitives
(cluster-balance audits, quality classifiers, drift tests), and because
they exercise the iterative + conditional-aggregate patterns at the heart
of distributed ML-on-SQL.

Determinism strategy (the hard part of cross-engine ML):

- k-means runs in integer CENTS with a fixed +100000 shift (non-negative,
  so truncating and flooring integer division agree), deterministic
  min/mid/max init, and a fixed CASE tie-break — every centroid is
  bit-identical to the oracle's unrolled iterations.
- naive Bayes avoids floats entirely: the argmax over Laplace-smoothed
  class scores is decided by EXACT integer cross-multiplication of the
  score fractions (products bounded < 2^60 at sf0.1), so predictions can
  never flip on a 1-ulp log() divergence.
- the decision stump scores candidate splits with integer micro-Gini
  ((pos²+neg²)·10⁶ // n²) — pure int64 arithmetic.
- KS compares scaled ECDFs as integers: max |r1·n2 − r2·n1| avoids the
  float division entirely until the final ppm scaling.
- chi-square uses only IEEE basic ops (+,−,×,÷ are correctly rounded and
  engine-identical — no libm), with per-cell contributions rounded to
  integer micro-units before the order-insensitive integer total.

Scale notes (100 TB): every statistic here is one conditional-aggregate
pass (map-side partials) over the fact table; k-means collects exactly k=3
centroids per iteration to the driver and broadcasts them back as literals
— the canonical distributed-k-means shape (MLlib's own implementation
does the same), with per-iteration cost one scan + one k-row groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backup_repo_spark.operators.prefix import (
    bucketed_prefix_sums,
    ntile_nosort,
)
from backup_repo_spark.caching import release_with
from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table

# Shared k-means scaffolding: points in shifted integer cents.
_KM_PTS = """
    pts AS (
      SELECT CAST(round(c_acctbal * 100) AS BIGINT) + 100000 AS x
      FROM customer
    )
"""

# One unrolled Lloyd iteration for the oracle: assign to nearest of the
# three centroids (ties -> lowest cluster id), then recompute means with
# truncating integer division; an empty cluster keeps its previous centroid.
_KM_ASSIGN = """
    a{k} AS (
      SELECT x,
             CASE
               WHEN abs(x - c0) <= abs(x - c1) AND abs(x - c0) <= abs(x - c2) THEN 0
               WHEN abs(x - c1) <= abs(x - c2) THEN 1
               ELSE 2
             END AS cl
      FROM pts CROSS JOIN it{p}
    )
"""
_KM_STEP = """
    it{k} AS (
      SELECT
        coalesce(sum(x) FILTER (WHERE cl = 0) // nullif(count(*) FILTER (WHERE cl = 0), 0),
                 any_value(c0)) AS c0,
        coalesce(sum(x) FILTER (WHERE cl = 1) // nullif(count(*) FILTER (WHERE cl = 1), 0),
                 any_value(c1)) AS c1,
        coalesce(sum(x) FILTER (WHERE cl = 2) // nullif(count(*) FILTER (WHERE cl = 2), 0),
                 any_value(c2)) AS c2
      FROM a{k} CROSS JOIN it{p}
    )
"""


@query(
    "ml_kmeans",
    oracle=f"""
    WITH {_KM_PTS},
    it0 AS (
      SELECT min(x) AS c0, (min(x) + max(x)) // 2 AS c1, max(x) AS c2 FROM pts
    ),
    {",".join(
        _KM_ASSIGN.format(k=k, p=k - 1) + "," + _KM_STEP.format(k=k, p=k - 1)
        for k in range(1, 4)
    )},
    final AS (
      SELECT x,
             CASE
               WHEN abs(x - c0) <= abs(x - c1) AND abs(x - c0) <= abs(x - c2) THEN 0
               WHEN abs(x - c1) <= abs(x - c2) THEN 1
               ELSE 2
             END AS cluster_id
      FROM pts CROSS JOIN it3
    )
    SELECT f.cluster_id,
           count(*) AS n,
           CAST(any_value(CASE f.cluster_id WHEN 0 THEN c0 WHEN 1 THEN c1 ELSE c2 END)
             - 100000 AS BIGINT) AS centroid_cents
    FROM final f CROSS JOIN it3
    GROUP BY f.cluster_id
    """,
)
def ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D k-means (k=3, 3 Lloyd iterations) over customer account balance
    in integer cents — deterministic min/mid/max init, nearest-centroid
    assignment with a fixed low-id tie-break, truncating-division means.
    The oracle unrolls the same three iterations as chained CTEs (same
    recipe as graph_pagerank), so CENTROID VALUES are verified bit-exactly,
    not just cluster shapes.

    Spark shape: per iteration, one conditional-aggregate scan produces the
    k=3 (sum, count) pairs, which are collected (k rows, not data rows) and
    re-broadcast as literals in the next iteration's CASE — the canonical
    MLlib k-means loop. The +100000 shift keeps every value non-negative so
    Spark's truncating DIV and DuckDB's flooring // agree."""
    pts = (
        load_table(spark, sf_dir, "customer")
        .select(
            (F.round(F.col("c_acctbal") * 100).cast("long") + 100000).alias("x")
        )
        # reused every k-means round; released with the result handle
        # (caching.release_with) — no CacheManager residue (round 6)
        .persist()
    )
    row = pts.agg(F.min("x").alias("mn"), F.max("x").alias("mx")).collect()[0]
    if row.mn is None:
        # empty input: the oracle's CTE chain yields zero rows; mirror it
        # with an empty frame of the same schema instead of crashing
        pts.unpersist(False)
        return spark.createDataFrame(
            [], "cluster_id int, n bigint, centroid_cents bigint"
        )
    cents = [int(row.mn), (int(row.mn) + int(row.mx)) // 2, int(row.mx)]

    def assign(c: list[int]):
        d = [F.abs(F.col("x") - F.lit(ci)) for ci in c]
        return (
            F.when((d[0] <= d[1]) & (d[0] <= d[2]), 0)
            .when(d[1] <= d[2], 1)
            .otherwise(2)
        )

    for _ in range(3):
        stats = (
            pts.select("x", assign(cents).alias("cl"))
            .groupBy("cl")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        for r in stats:
            cents[r.cl] = int(r.s) // int(r.n)
    final = pts.select("x", assign(cents).alias("cluster_id"))
    cmap = F.when(F.col("cluster_id") == 0, F.lit(cents[0])).when(
        F.col("cluster_id") == 1, F.lit(cents[1])
    ).otherwise(F.lit(cents[2]))
    return release_with(
        final.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "cluster_id", "n", (cmap - 100000).cast("long").alias("centroid_cents")
        ),
        pts,
    )


@query(
    "ml_naive_bayes",
    oracle="""
    WITH joint AS (
      SELECT o_orderpriority AS v, o_orderstatus AS c, count(*) AS nvc
      FROM orders GROUP BY 1, 2
    ),
    wide AS (
      SELECT p.v,
             coalesce(max(CASE WHEN j.c = 'F' THEN j.nvc END), 0) AS nF,
             coalesce(max(CASE WHEN j.c = 'O' THEN j.nvc END), 0) AS nO,
             coalesce(max(CASE WHEN j.c = 'P' THEN j.nvc END), 0) AS nP
      FROM (SELECT DISTINCT v FROM joint) p
      LEFT JOIN joint j ON j.v = p.v
      GROUP BY p.v
    ),
    consts AS (
      SELECT
        count(*) FILTER (WHERE o_orderstatus = 'F') AS cF,
        count(*) FILTER (WHERE o_orderstatus = 'O') AS cO,
        count(*) FILTER (WHERE o_orderstatus = 'P') AS cP,
        count(DISTINCT o_orderpriority) AS vsz
      FROM orders
    )
    SELECT v, nF, nO, nP,
           CASE
             WHEN cF * (nF + 1) * (cO + vsz) >= cO * (nO + 1) * (cF + vsz)
              AND cF * (nF + 1) * (cP + vsz) >= cP * (nP + 1) * (cF + vsz)
               THEN 'F'
             WHEN cO * (nO + 1) * (cP + vsz) >= cP * (nP + 1) * (cO + vsz)
               THEN 'O'
             ELSE 'P'
           END AS pred_status
    FROM wide CROSS JOIN consts
    """,
)
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical naive Bayes trained by aggregation: class = order status,
    feature = order priority, Laplace smoothing. The per-feature-value
    argmax class is decided by EXACT integer cross-multiplication of the
    smoothed score fractions nc·(nvc+1)/(nc+V) — no log(), no floats, so a
    1-ulp libm divergence can never flip a prediction cross-engine
    (products bounded ≈ 2^60 at sf0.1; ties break toward 'F' then 'O' by
    the fixed CASE order).

    Scale: training is two conditional-aggregate passes (class counts +
    joint counts) with map-side partials; the 3-class constants broadcast.
    Scoring any table is then a stateless expression — the deployable
    quality-classifier shape for a curation pipeline."""
    o = load_table(spark, sf_dir, "orders")
    joint = (
        o.groupBy(F.col("o_orderpriority").alias("v"))
        .agg(
            F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("nF"),
            F.sum((F.col("o_orderstatus") == "O").cast("long")).alias("nO"),
            F.sum((F.col("o_orderstatus") == "P").cast("long")).alias("nP"),
        )
    )
    consts = o.agg(
        F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("cF"),
        F.sum((F.col("o_orderstatus") == "O").cast("long")).alias("cO"),
        F.sum((F.col("o_orderstatus") == "P").cast("long")).alias("cP"),
        F.countDistinct("o_orderpriority").alias("vsz"),
    )
    scored = joint.crossJoin(F.broadcast(consts))
    sF = F.col("cF") * (F.col("nF") + 1)
    sO = F.col("cO") * (F.col("nO") + 1)
    sP = F.col("cP") * (F.col("nP") + 1)
    dF, dO, dP = (
        F.col("cF") + F.col("vsz"),
        F.col("cO") + F.col("vsz"),
        F.col("cP") + F.col("vsz"),
    )
    pred = (
        F.when((sF * dO >= sO * dF) & (sF * dP >= sP * dF), "F")
        .when(sO * dP >= sP * dO, "O")
        .otherwise("P")
    )
    return scored.select("v", "nF", "nO", "nP", pred.alias("pred_status"))


@query(
    "ml_decision_stump",
    oracle="""
    WITH cand AS (
      SELECT 50000.0 * t AS thr FROM range(1, 10) r(t)
    ),
    split AS (
      SELECT thr,
             count(*) FILTER (WHERE o_totalprice < thr) AS n_l,
             count(*) FILTER (WHERE o_totalprice < thr AND o_orderstatus = 'F') AS pos_l,
             count(*) FILTER (WHERE o_totalprice >= thr) AS n_r,
             count(*) FILTER (WHERE o_totalprice >= thr AND o_orderstatus = 'F') AS pos_r
      FROM orders CROSS JOIN cand
      GROUP BY thr
    ),
    scored AS (
      SELECT thr, n_l, pos_l, n_r, pos_r,
             CASE WHEN n_l = 0 THEN 0
                  ELSE 1000000 - (pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l)) * 1000000 // (n_l * n_l)
             END AS g_l,
             CASE WHEN n_r = 0 THEN 0
                  ELSE 1000000 - (pos_r * pos_r + (n_r - pos_r) * (n_r - pos_r)) * 1000000 // (n_r * n_r)
             END AS g_r
      FROM split
    )
    SELECT thr, n_l, pos_l, n_r, pos_r,
           (n_l * g_l + n_r * g_r) // (n_l + n_r) AS gini_split_micro,
           row_number() OVER (
             ORDER BY (n_l * g_l + n_r * g_r) // (n_l + n_r), thr
           ) AS rnk
    FROM scored
    """,
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump learner: evaluate 9 candidate thresholds on order
    total price against the label (status = 'F') and score each split with
    weighted Gini impurity in integer MICRO-units — (pos²+neg²)·10⁶ // n²
    is pure int64 arithmetic, so the split ranking (rnk 1 = best, ties to
    the lower threshold) is bit-deterministic. This is one boosting-round /
    one tree-node of a distributed GBDT expressed as SQL.

    Scale: a constant 9-row candidate list broadcast-cross-joined onto the
    fact scan, then ONE hash aggregate keyed by threshold — the candidate
    sweep costs one pass regardless of data size (this is how Spark MLlib's
    tree learner evaluates binned splits too)."""
    o = load_table(spark, sf_dir, "orders")
    cand = spark.range(1, 10).select((F.lit(50000.0) * F.col("id")).alias("thr"))
    left = F.col("o_totalprice") < F.col("thr")
    pos = F.col("o_orderstatus") == "F"
    split = (
        o.crossJoin(F.broadcast(cand))
        .groupBy("thr")
        .agg(
            F.sum(left.cast("long")).alias("n_l"),
            F.sum((left & pos).cast("long")).alias("pos_l"),
            F.sum((~left).cast("long")).alias("n_r"),
            F.sum(((~left) & pos).cast("long")).alias("pos_r"),
        )
    )
    gini = lambda n, p: F.when(F.col(n) == 0, F.lit(0)).otherwise(  # noqa: E731
        F.lit(1000000)
        - F.expr(
            f"({p} * {p} + ({n} - {p}) * ({n} - {p})) * 1000000 DIV ({n} * {n})"
        )
    )
    scored = split.withColumn("g_l", gini("n_l", "pos_l")).withColumn(
        "g_r", gini("n_r", "pos_r")
    )
    from pyspark.sql import Window

    w = Window.orderBy("gini_split_micro", "thr")
    return (
        scored.withColumn(
            "gini_split_micro",
            F.expr("(n_l * g_l + n_r * g_r) DIV (n_l + n_r)"),
        )
        .select(
            "thr", "n_l", "pos_l", "n_r", "pos_r", "gini_split_micro",
            F.row_number().over(w).alias("rnk"),
        )
    )


@query(
    "stats_ks_test",
    oracle="""
    WITH vals AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 2 END AS s
      FROM orders WHERE o_orderstatus IN ('F', 'O')
    ),
    g AS (
      SELECT v,
             count(*) FILTER (WHERE s = 1) AS c1,
             count(*) FILTER (WHERE s = 2) AS c2
      FROM vals GROUP BY v
    ),
    c AS (
      SELECT v,
             sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r1,
             sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r2
      FROM g
    ),
    tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM g
    )
    SELECT n1, n2,
           CAST(max(abs(r1 * n2 - r2 * n1)) AS BIGINT) AS d_num,
           CAST(max(abs(r1 * n2 - r2 * n1)) * 1000000 // (n1 * n2) AS BIGINT) AS ks_ppm
    FROM c CROSS JOIN tot
    GROUP BY n1, n2
    """,
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the total-price
    distributions of finished vs open orders — the continuous-distribution
    drift test (sibling of ts_distribution_drift's categorical L1). The
    ECDF difference is computed over INTEGER cumulative counts — KS·n1·n2 =
    max |r1·n2 − r2·n1| — so the supremum and its ppm scaling are exact;
    no float ECDF division ever happens.

    Scale: group-by-value collapses the data to distinct values, then the
    ECDF cumulative counts come from TWO-PHASE bucketed prefix sums
    (operators/prefix.py) — parallelism = bucket count, never one ordered
    partition — so an unbounded value grid at 100 TB still fans out.
    Bit-identical to the windowed oracle (integer sums)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("F", "O")
    )
    g = (
        o.select(
            F.col("o_totalprice").alias("v"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(2).alias("s"),
        )
        .groupBy("v")
        .agg(
            F.sum((F.col("s") == 1).cast("long")).alias("c1"),
            F.sum((F.col("s") == 2).cast("long")).alias("c2"),
        )
    )
    # o_totalprice spans ~[1e3, 6e5] dollars; 4096-dollar buckets bound
    # the offset window at ~150 rows while phase 2 fans out per bucket.
    c = bucketed_prefix_sums(
        g, "v", ["c1", "c2"], bucket_width=4096, inclusive=True
    ).select(
        "v", F.col("cum_c1").alias("r1"), F.col("cum_c2").alias("r2")
    )
    tot = g.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    return (
        c.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(F.max(F.abs(F.col("r1") * F.col("n2") - F.col("r2") * F.col("n1"))).alias("d_num"))
        .select(
            "n1", "n2", "d_num",
            F.expr("d_num * 1000000 DIV (n1 * n2)").alias("ks_ppm"),
        )
    )


@query(
    "stat_chi_square",
    oracle="""
    WITH obs AS (
      SELECT c.c_mktsegment AS seg, o.o_orderstatus AS st, count(*) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT seg, st, n,
             sum(n) OVER (PARTITION BY seg) AS rt,
             sum(n) OVER (PARTITION BY st) AS ct,
             sum(n) OVER () AS tot
      FROM obs
    ),
    cell AS (
      SELECT seg, st, n, rt, ct, tot,
             CAST(rt AS DOUBLE) * ct / tot AS exp,
             CAST(round(
               (n - CAST(rt AS DOUBLE) * ct / tot)
               * (n - CAST(rt AS DOUBLE) * ct / tot)
               / (CAST(rt AS DOUBLE) * ct / tot) * 1000000
             ) AS BIGINT) AS contrib_micro
      FROM m
    )
    SELECT seg, st, n, round(exp, 4) AS expected_r4, contrib_micro,
           CAST(sum(contrib_micro) OVER () AS BIGINT) AS chi2_micro
    FROM cell
    """,
)
def stat_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence for market segment × order status —
    the categorical-association audit behind stratification checks. Every
    arithmetic step is an IEEE basic op (+,−,×,÷ are correctly rounded and
    therefore engine-identical; no libm), the expected counts come from
    exact integer marginals (rt·ct < 2^53, an exact double product), and
    per-cell contributions are rounded to integer micro-units BEFORE the
    order-insensitive integer total — so the full statistic is
    bit-deterministic despite being float-valued math.

    Scale: one fact-dim broadcast join + one 15-row contingency aggregate;
    the marginal windows run over 15 rows. Nothing here grows with data."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    obs = (
        o.join(F.broadcast(cst), o.o_custkey == cst.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_orderstatus").alias("st"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = obs.select(
        "seg", "st", "n",
        F.sum("n").over(Window.partitionBy("seg")).alias("rt"),
        F.sum("n").over(Window.partitionBy("st")).alias("ct"),
        F.sum("n").over(Window.partitionBy()).alias("tot"),
    )
    exp = F.col("rt").cast("double") * F.col("ct") / F.col("tot")
    contrib = F.round((F.col("n") - exp) * (F.col("n") - exp) / exp * 1000000).cast(
        "long"
    )
    cell = m.select(
        "seg", "st", "n",
        F.round(exp, 4).alias("expected_r4"),
        contrib.alias("contrib_micro"),
    )
    return cell.select(
        "*", F.sum("contrib_micro").over(Window.partitionBy()).alias("chi2_micro")
    )


# Reusable oracle CTE: the naive-Bayes per-priority prediction table (same
# construction as ml_naive_bayes, kept in sync with _nb_pred_table below).
_NB_PRED_SQL = """
    joint AS (
      SELECT o_orderpriority AS v, o_orderstatus AS c, count(*) AS nvc
      FROM orders GROUP BY 1, 2
    ),
    wide AS (
      SELECT p.v,
             coalesce(max(CASE WHEN j.c = 'F' THEN j.nvc END), 0) AS nF,
             coalesce(max(CASE WHEN j.c = 'O' THEN j.nvc END), 0) AS nO,
             coalesce(max(CASE WHEN j.c = 'P' THEN j.nvc END), 0) AS nP
      FROM (SELECT DISTINCT v FROM joint) p
      LEFT JOIN joint j ON j.v = p.v
      GROUP BY p.v
    ),
    consts AS (
      SELECT
        count(*) FILTER (WHERE o_orderstatus = 'F') AS cF,
        count(*) FILTER (WHERE o_orderstatus = 'O') AS cO,
        count(*) FILTER (WHERE o_orderstatus = 'P') AS cP,
        count(DISTINCT o_orderpriority) AS vsz
      FROM orders
    ),
    pred AS (
      SELECT v,
             CASE
               WHEN cF * (nF + 1) * (cO + vsz) >= cO * (nO + 1) * (cF + vsz)
                AND cF * (nF + 1) * (cP + vsz) >= cP * (nP + 1) * (cF + vsz)
                 THEN 'F'
               WHEN cO * (nO + 1) * (cP + vsz) >= cP * (nP + 1) * (cO + vsz)
                 THEN 'O'
               ELSE 'P'
             END AS pred_status
      FROM wide CROSS JOIN consts
    )
"""


def _nb_pred_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(priority, pred_status) — the ml_naive_bayes decision table."""
    return ml_naive_bayes(spark, sf_dir).select(
        "v", "pred_status"
    )


@query(
    "ml_confusion_matrix",
    oracle=f"""
    WITH {_NB_PRED_SQL}
    SELECT o.o_orderstatus AS actual, p.pred_status AS predicted,
           count(*) AS n
    FROM orders o JOIN pred p ON o.o_orderpriority = p.v
    GROUP BY 1, 2
    """,
)
def ml_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the naive-Bayes classifier scored over its own
    training table — the evaluation loop every model-gated curation
    pipeline closes. Pure integer counts over an exact-integer decision
    rule; broadcast of the 5-row prediction table onto the fact scan.

    Scale: scoring is a broadcast map-side join + one tiny aggregate;
    nothing shuffles but the <=9-cell matrix."""
    o = load_table(spark, sf_dir, "orders")
    pred = _nb_pred_table(spark, sf_dir)
    return (
        o.join(F.broadcast(pred), o.o_orderpriority == pred.v)
        .groupBy(
            F.col("o_orderstatus").alias("actual"),
            F.col("pred_status").alias("predicted"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "ml_auc_roc",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS v,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS cp,
             count(*) FILTER (WHERE o_orderstatus <> 'F') AS cn
      FROM orders GROUP BY 1
    ),
    c AS (
      SELECT cp, cn,
             coalesce(sum(cp + cn) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS prev
      FROM g
    ),
    s AS (
      SELECT CAST(sum(cp * (2 * prev + cp + cn + 1)) AS BIGINT) AS two_rs,
             CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cn) AS BIGINT) AS nn
      FROM c
    )
    SELECT np, nn,
           two_rs - np * (np + 1) AS two_u,
           (two_rs - np * (np + 1)) * 1000000 // (2 * np * nn) AS auc_ppm
    FROM s
    """,
)
def ml_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of total price as a score for order status 'F', via
    the Mann-Whitney rank-sum identity with tie-corrected average ranks —
    kept ENTIRELY in integers by working with 2× the rank-sum (a value
    group occupying ranks prev+1..prev+c contributes cp·(2·prev+c+1)), so
    the AUC in ppm is bit-exact; no float ranks, no sort-order sensitivity.

    Scale: one group-by-score collapse, then the rank prefix comes from
    TWO-PHASE bucketed prefix sums (operators/prefix.py) — per-bucket
    windows, never a single ordered partition — then one final aggregate.
    Bit-identical to the windowed oracle (integer sums)."""
    o = load_table(spark, sf_dir, "orders")
    g = (
        o.groupBy(F.col("o_totalprice").alias("v"))
        .agg(
            F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("cp"),
            F.sum((F.col("o_orderstatus") != "F").cast("long")).alias("cn"),
        )
    )
    c = bucketed_prefix_sums(
        g.withColumn("ce", F.col("cp") + F.col("cn")),
        "v", ["ce"], bucket_width=4096,
    ).select("cp", "cn", F.col("cum_ce").alias("prev"))
    s = c.agg(
        F.sum(F.col("cp") * (2 * F.col("prev") + F.col("cp") + F.col("cn") + 1)).alias(
            "two_rs"
        ),
        F.sum("cp").alias("np"),
        F.sum("cn").alias("nn"),
    )
    return s.select(
        "np", "nn",
        (F.col("two_rs") - F.col("np") * (F.col("np") + 1)).alias("two_u"),
        F.expr("(two_rs - np * (np + 1)) * 1000000 DIV (2 * np * nn)").alias(
            "auc_ppm"
        ),
    )


@query(
    "ml_calibration_bins",
    oracle="""
    WITH scored AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS score_cents,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    )
    SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS pos_rate_ppm,
           CAST(sum(score_cents) // count(*) AS BIGINT) AS mean_score_cents
    FROM scored GROUP BY bin
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile calibration table for the price-as-score classifier: per
    score bin, observed positive rate vs mean score — the
    reliability-diagram input.  The (score, orderkey) order is unique, so
    bin boundaries are deterministic; rates and mean scores are integer
    ppm / cents (truncating division), never float averages.

    Scale: equal-frequency binning WITHOUT the global ntile sort (the old
    form measured 5.55x per 10x data — the registry's worst).  The global
    row number decomposes as rows-before-this-score + rank-within-score:
    the first comes from two-phase bucketed prefix sums over the score
    histogram (operators/prefix.py), the second from a row_number window
    PARTITIONED BY score — every stage fans out.  The bin is then ntile's
    published fill rule applied to that row number (first n%10 bins take
    one extra row), in exact integer arithmetic — bit-identical to the
    oracle's ntile."""
    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        F.col("o_totalprice").alias("v"),
        F.col("o_orderkey").alias("okey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("score_cents"),
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
    )
    return (
        ntile_nosort(scored, "v", "okey", tiles=10, bucket_width=4096)
        .select("score_cents", "y", "bin")
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos"),
             F.sum("score_cents").alias("sc"))
        .select(
            "bin", "n", "n_pos",
            F.expr("n_pos * 1000000 DIV n").alias("pos_rate_ppm"),
            F.expr("sc DIV n").alias("mean_score_cents"),
        )
    )


@query(
    "ml_feature_stats",
    oracle="""
    WITH x AS (
      SELECT c_mktsegment AS seg,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    m AS (
      SELECT seg, count(*) AS n,
             CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents,
             min(cents) AS min_cents, max(cents) AS max_cents
      FROM x GROUP BY seg
    )
    SELECT m.seg, m.n, m.mean_cents, m.min_cents, m.max_cents,
           CAST(sum(abs(x.cents - m.mean_cents)) // m.n AS BIGINT) AS mad_cents
    FROM x JOIN m USING (seg)
    GROUP BY m.seg, m.n, m.mean_cents, m.min_cents, m.max_cents
    """,
)
def ml_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment feature-scaling statistics (mean / min / max / mean
    absolute deviation) for account balance in integer cents — the
    normalization constants a feature pipeline ships to training. MAD
    replaces stddev deliberately: Σ|x−μ| stays in exact int64 (stddev's
    Σx² would overflow, and float partial sums are reassociation-
    dependent), and it's the robust scale estimate anyway.

    Scale: two conditional-aggregate passes over the dim table (means,
    then deviations vs the 5-row broadcast means) — both map-side."""
    x = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        )
    )
    m = (
        x.groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("sum(cents) DIV count(*)").alias("mean_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )
    return (
        x.join(F.broadcast(m), "seg")
        .groupBy("seg", "n", "mean_cents", "min_cents", "max_cents")
        .agg(F.sum(F.abs(F.col("cents") - F.col("mean_cents"))).alias("sad"))
        .select(
            "seg", "n", "mean_cents", "min_cents", "max_cents",
            F.expr("sad DIV n").alias("mad_cents"),
        )
    )


@query(
    "ml_calibration_width_bucket",
    oracle="""
    WITH scored AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS score_cents,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             CASE WHEN o_totalprice < 0 THEN 0
                  WHEN o_totalprice >= 600000.0 THEN 11
                  ELSE CAST(floor(o_totalprice / 60000.0) AS INTEGER) + 1
             END AS bin
      FROM orders
    )
    SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS pos_rate_ppm,
           CAST(sum(score_cents) // count(*) AS BIGINT) AS mean_score_cents
    FROM scored GROUP BY bin
    """,
)
def ml_calibration_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variant of ml_calibration_bins: FIXED-RANGE score bins
    via width_bucket (emulated in the oracle: DuckDB 1.0 lacks it; the
    formula floor(v/width)+1 with an exact-double width reproduces Spark's
    implementation bit-for-bit) instead of equal-frequency ntile — same
    downstream
    aggregate, but binning is a stateless map expression, so the global
    sort (measured 5.55× at 10× data in SCALING.md) disappears entirely
    and the whole query is one partial-aggregable pass. This pair is the
    documented mitigation, verified as its own key."""
    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("score_cents"),
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
        F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(10)).alias("bin"),
    )
    return (
        scored.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos"),
             F.sum("score_cents").alias("sc"))
        .select(
            "bin", "n", "n_pos",
            F.expr("n_pos * 1000000 DIV n").alias("pos_rate_ppm"),
            F.expr("sc DIV n").alias("mean_score_cents"),
        )
    )


@query(
    "ml_roc_points",
    oracle="""
    WITH cand AS (
      SELECT 50000.0 * t AS thr FROM range(1, 12) r(t)
    ),
    pts AS (
      SELECT thr,
             count(*) FILTER (WHERE o_orderstatus = 'F' AND o_totalprice >= thr) AS tp,
             count(*) FILTER (WHERE o_orderstatus <> 'F' AND o_totalprice >= thr) AS fp,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS np,
             count(*) FILTER (WHERE o_orderstatus <> 'F') AS nn
      FROM orders CROSS JOIN cand
      GROUP BY thr
    )
    SELECT thr, tp, fp,
           CAST(tp * 1000000 // np AS BIGINT) AS tpr_ppm,
           CAST(fp * 1000000 // nn AS BIGINT) AS fpr_ppm
    FROM pts
    """,
)
def ml_roc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC operating points at 11 fixed score thresholds (price >= t
    predicts status 'F'): TP/FP counts and TPR/FPR in exact integer ppm —
    the curve behind ml_auc_roc's scalar, for threshold selection. Same
    single-pass shape as ml_decision_stump: a constant candidate list
    broadcast-crossed onto one scan, one hash aggregate; integer rates
    make every point bit-deterministic."""
    o = load_table(spark, sf_dir, "orders")
    cand = spark.range(1, 12).select((F.lit(50000.0) * F.col("id")).alias("thr"))
    pos = F.col("o_orderstatus") == "F"
    hit = F.col("o_totalprice") >= F.col("thr")
    pts = (
        o.crossJoin(F.broadcast(cand))
        .groupBy("thr")
        .agg(
            F.sum((pos & hit).cast("long")).alias("tp"),
            F.sum(((~pos) & hit).cast("long")).alias("fp"),
            F.sum(pos.cast("long")).alias("np"),
            F.sum((~pos).cast("long")).alias("nn"),
        )
    )
    return pts.select(
        "thr", "tp", "fp",
        F.expr("tp * 1000000 DIV np").alias("tpr_ppm"),
        F.expr("fp * 1000000 DIV nn").alias("fpr_ppm"),
    )


@query(
    "ml_lift_gains",
    oracle="""
    WITH scored AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             ntile(10) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS decile
      FROM orders
    ),
    bins AS (
      SELECT decile, count(*) AS n, sum(y) AS pos FROM scored GROUP BY decile
    ),
    tot AS (SELECT sum(n) AS nt, CAST(sum(pos) AS BIGINT) AS pt FROM bins)
    SELECT decile, n, CAST(pos AS BIGINT) AS pos,
           CAST(sum(pos) OVER w AS BIGINT) AS cum_pos,
           CAST(sum(pos) OVER w * 1000000 // pt AS BIGINT) AS cum_gain_ppm,
           CAST((sum(pos) OVER w * nt * 1000000) // (sum(n) OVER w * pt) AS BIGINT)
             AS cum_lift_ppm
    FROM bins CROSS JOIN tot
    WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def ml_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains and lift by score decile (highest scores first) —
    the targeting-efficiency readout behind campaign sizing ("the top 20%
    of scores capture X% of positives at Y× lift"). Integer end-to-end:
    counts, cumulative sums over the 10-row bin table, gains and lift in
    truncating ppm. Deterministic ntile boundaries via the (score,
    orderkey) tie-break.

    Scale: deciles come from _ntile_nosort (two-phase bucketed prefix sums
    + within-score row_number — no global sort; the DESC score order is
    the ASC order of the NEGATED price, an exact double negation), so the
    ranked-decile form now scales like ml_calibration_bins' rewrite
    (1.71x per 10x data vs 5.55x for the global ntile; SCALING.md).  The
    10-row cumulative windows downstream are bounded by construction."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
        (-F.col("o_totalprice")).alias("v"),
        F.col("o_orderkey").alias("okey"),
    )
    deciled = ntile_nosort(
        scored, "v", "okey", tiles=10, bucket_width=4096
    ).withColumnRenamed("bin", "decile")
    bins = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    tot = bins.agg(F.sum("n").alias("nt"), F.sum("pos").alias("pt"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(
            "decile", "n", "pos",
            F.sum("pos").over(w).alias("cum_pos"),
            F.sum("n").over(w).alias("cum_n"),
            "nt", "pt",
        )
        .select(
            "decile", "n", "pos", "cum_pos",
            F.expr("cum_pos * 1000000 DIV pt").alias("cum_gain_ppm"),
            F.expr("(cum_pos * nt * 1000000) DIV (cum_n * pt)").alias("cum_lift_ppm"),
        )
    )


@query(
    "ml_psi_drift",
    oracle="""
    WITH binned AS (
      SELECT CASE WHEN o_totalprice < 0 THEN 0
                  WHEN o_totalprice >= 600000.0 THEN 11
                  ELSE CAST(floor(o_totalprice / 60000.0) AS INTEGER) + 1
             END AS bin,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS c_ref,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS c_cur
      FROM orders WHERE o_orderstatus IN ('F', 'O')
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
             CAST(sum(c_cur) AS BIGINT) AS n_cur,
             count(*) AS k
      FROM binned
    ),
    cell AS (
      SELECT bin, c_ref, c_cur,
             (c_ref + 1.0) / (n_ref + k) AS p,
             (c_cur + 1.0) / (n_cur + k) AS q
      FROM binned CROSS JOIN tot
    )
    SELECT bin, CAST(c_ref AS BIGINT) AS c_ref, CAST(c_cur AS BIGINT) AS c_cur,
           CAST(round((p - q) * ln(p / q) * 1000000) AS BIGINT) AS psi_micro,
           CAST(sum(CAST(round((p - q) * ln(p / q) * 1000000) AS BIGINT)) OVER ()
                AS BIGINT) AS psi_total_micro
    FROM cell
    """,
)
def ml_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the reference (finished) and
    current (open) score distributions over fixed-range bins — THE
    deployed-model drift monitor (PSI > 0.2 = retrain alarm). Laplace
    add-one smoothing guards empty bins; per-bin contributions are
    rounded to integer micro-units BEFORE the order-insensitive window
    total (the stat_chi_square recipe). ln() is libm but feeds only a
    rounded VALUE (never a selection boundary), the same exposure as the
    established lm-score/tfidf keys.

    Scale: stateless width_bucket binning (no global sort), one 12-row
    contingency aggregate — the production shape for scheduled drift
    checks."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("F", "O")
    )
    bin_ = (
        F.when(F.col("o_totalprice") < 0, 0)
        .when(F.col("o_totalprice") >= 600000.0, 11)
        .otherwise(F.floor(F.col("o_totalprice") / 60000.0).cast("int") + 1)
    )
    binned = o.groupBy(bin_.alias("bin")).agg(
        F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("c_ref"),
        F.sum((F.col("o_orderstatus") == "O").cast("long")).alias("c_cur"),
    )
    tot = binned.agg(
        F.sum("c_ref").alias("n_ref"),
        F.sum("c_cur").alias("n_cur"),
        F.count(F.lit(1)).alias("k"),
    )
    cell = binned.crossJoin(F.broadcast(tot)).select(
        "bin", "c_ref", "c_cur",
        ((F.col("c_ref") + 1.0) / (F.col("n_ref") + F.col("k"))).alias("p"),
        ((F.col("c_cur") + 1.0) / (F.col("n_cur") + F.col("k"))).alias("q"),
    )
    contrib = F.round(
        (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")) * 1000000
    ).cast("long")
    return cell.select(
        "bin", "c_ref", "c_cur", contrib.alias("psi_micro")
    ).select(
        "*", F.sum("psi_micro").over(Window.partitionBy()).alias("psi_total_micro")
    )
