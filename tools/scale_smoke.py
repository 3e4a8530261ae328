"""Scale smoke test: regenerate the star schema at N× sf0.1 and re-run the
bench queries — the evidence that the headline plans scale linearly rather
than degrading (quadratic candidate spaces, driver materialization, broken
broadcasts all show up as a ratio >> N).

    python tools/scale_smoke.py [--mult 10] [--regen]

Tables are synthesized deterministically (hash-of-id columns, same shapes
and domains as FIXTURES.md) under spark-warehouse/scale_smoke_<mult>x/ with
the same <table>.parquet layout the loaders expect, then the six BENCH
queries run against sf0.1 and the scaled copy; the report prints per-query
times and the time ratio. Ratio ≈ mult (or below, as constant overhead
amortizes) = linear scaling; the observed numbers are recorded in
SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from backup_repo_spark import registry  # noqa: E402
from backup_repo_spark.session import get_spark  # noqa: E402
import backup_repo_spark.session as _session  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = {
    "q_agg_lineitem": "agg_tpch_q1",
    "q_join3_topk": "topk_revenue",
    "q_join5_agg": "join_star_5way",
    "q_window_rank": "win_topn_per_group",
    "q_events_window": "stream_tumbling",
    "q_distinct_users": "agg_distinct",
}

_SEGS = "HOUSEHOLD FURNITURE MACHINERY AUTOMOBILE BUILDING".split()
_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_ETYPES = "signup error click view purchase".split()


def _pick(col, options):
    """Deterministic uniform pick from a string list, keyed by an id column."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.abs(F.xxhash64(col)) % len(options) + 1).cast("int"))


def generate(spark: SparkSession, out: str, mult: int) -> None:
    n_li, n_o, n_c, n_s, n_e = (
        600_000 * mult, 150_000 * mult, 15_000 * mult, 1_000 * mult, 100_000 * mult)
    parts = max(8, mult * 4)

    def rnd(col, lo, hi, salt):
        u = (F.abs(F.xxhash64(col + F.lit(salt))) % 1_000_000) / 1_000_000.0
        return lo + u * (hi - lo)

    spark.range(5).select(
        F.col("id").cast("int").alias("r_regionkey"),
        _pick(F.col("id"), ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]).alias("rn"),
    ).withColumn("r_name", F.expr(
        "element_at(array('AFRICA','AMERICA','ASIA','EUROPE','MIDDLE EAST'), "
        "cast(r_regionkey as int) + 1)"
    )).drop("rn").coalesce(1).write.mode("overwrite").parquet(f"{out}/region.parquet")

    spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/nation.parquet")

    spark.range(n_c).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        (F.abs(F.xxhash64("id")) % 25).cast("int").alias("c_nationkey"),
        F.round(rnd(F.col("id"), -999.0, 9999.0, 1), 2).alias("c_acctbal"),
        _pick(F.col("id"), _SEGS).alias("c_mktsegment"),
    ).repartition(parts).write.mode("overwrite").parquet(f"{out}/customer.parquet")

    spark.range(n_s).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        (F.abs(F.xxhash64("id")) % 25).cast("int").alias("s_nationkey"),
        F.round(rnd(F.col("id"), -999.0, 9999.0, 2), 2).alias("s_acctbal"),
    ).repartition(8).write.mode("overwrite").parquet(f"{out}/supplier.parquet")

    _PTYPES = "STANDARD SMALL MEDIUM LARGE ECONOMY PROMO".split()
    _PNOUNS = "ring bolt washer gear cog spring plate rod".split()
    _PADJS = "large hot blue red green dim small pale".split()
    spark.range(20_000 * mult).select(
        F.col("id").alias("p_partkey"),
        F.concat_ws(" ", _pick(F.col("id") + 13, _PADJS), _pick(F.col("id") + 17, _PNOUNS)).alias("p_name"),
        F.concat(F.lit("Brand#"), (F.abs(F.xxhash64("id", F.lit(21))) % 25).cast("string")).alias("p_brand"),
        _pick(F.col("id") + 23, _PTYPES).alias("p_type"),
        ((F.abs(F.xxhash64("id", F.lit(22))) % 50) + 1).cast("int").alias("p_size"),
        F.round(rnd(F.col("id"), 900.0, 999.9, 24), 2).alias("p_retailprice"),
    ).repartition(8).write.mode("overwrite").parquet(f"{out}/part.parquet")

    day = F.expr("INTERVAL 1 DAY")
    spark.range(n_o).select(
        F.col("id").alias("o_orderkey"),
        (F.abs(F.xxhash64("id")) % n_c).alias("o_custkey"),
        _pick(F.col("id"), ["P", "O", "F"]).alias("o_orderstatus"),
        F.round(rnd(F.col("id"), 1000.0, 400000.0, 3), 2).alias("o_totalprice"),
        (F.lit("1995-01-01").cast("timestamp")
         + day * (F.abs(F.xxhash64("id", F.lit(4))) % 2400).cast("int")).alias("o_orderdate"),
        _pick(F.col("id") + 7, _PRIOS).alias("o_orderpriority"),
    ).repartition(parts).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    spark.range(n_li).select(
        (F.abs(F.xxhash64("id", F.lit(9))) % n_o).alias("l_orderkey"),
        (F.abs(F.xxhash64("id", F.lit(10))) % (20_000 * mult)).alias("l_partkey"),
        (F.abs(F.xxhash64("id", F.lit(11))) % n_s).alias("l_suppkey"),
        ((F.col("id") % 7) + 1).cast("int").alias("l_linenumber"),
        F.round(rnd(F.col("id"), 1.0, 50.0, 12)).alias("l_quantity"),
        F.round(rnd(F.col("id"), 900.0, 100000.0, 13), 2).alias("l_extendedprice"),
        F.round(rnd(F.col("id"), 0.0, 0.10, 14), 2).alias("l_discount"),
        F.round(rnd(F.col("id"), 0.0, 0.08, 15), 2).alias("l_tax"),
        _pick(F.col("id") + 3, ["R", "A", "N"]).alias("l_returnflag"),
        _pick(F.col("id") + 5, ["O", "F"]).alias("l_linestatus"),
        (F.lit("1995-01-02").cast("timestamp")
         + day * (F.abs(F.xxhash64("id", F.lit(16))) % 2490).cast("int")).alias("l_shipdate"),
    ).repartition(parts).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    sec = F.expr("INTERVAL 1 SECOND")
    spark.range(n_e).select(
        F.col("id").alias("event_id"),
        (F.lit("2024-01-01").cast("timestamp")
         + sec * (F.abs(F.xxhash64("id", F.lit(17))) % (29 * 86400)).cast("int")).alias("ts"),
        (F.abs(F.xxhash64("id", F.lit(18))) % n_c).alias("user_id"),
        _pick(F.col("id") + 11, _ETYPES).alias("event_type"),
        F.round(rnd(F.col("id"), 0.01, 490.0, 19), 2).alias("value"),
        F.format_string('{"k": %d}', (F.abs(F.xxhash64("id", F.lit(20))) % 100)).alias("props"),
    ).repartition(parts).write.mode("overwrite").parquet(f"{out}/events.parquet")


def time_queries(spark: SparkSession, sf_dir: str, queries=None) -> dict[str, float]:
    out = {}
    for metric, key in (queries or BENCH_QUERIES).items():
        fn = registry.QUERIES[key]
        fn(spark, sf_dir).collect()  # warm
        best = min(
            (lambda t0: (fn(spark, sf_dir).collect(), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(3)
        )
        out[metric] = round(best, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--regen", action="store_true")
    ap.add_argument(
        "--keys", nargs="*", default=None,
        help="registry keys to time instead of the six BENCH queries",
    )
    args = ap.parse_args()
    queries = {k: k for k in args.keys} if args.keys else None
    out = os.path.join(_REPO, "spark-warehouse", f"scale_smoke_{args.mult}x")

    # r14: aqe_probe C profile (OPTIMIZATION_r13.md AQE adjudication) —
    # overprovision partitions, let AQE coalesce to 64 MB from runtime
    # bytes; -18.1% vs pinned 32 at the 50x dedup fixture.
    spark = get_spark("scale-smoke", shuffle_partitions=256, advisory_partition_mb=64)
    if args.regen:
        shutil.rmtree(out, ignore_errors=True)
    if not os.path.exists(f"{out}/lineitem.parquet"):
        print(f"generating {args.mult}x data under {out} ...", file=sys.stderr)
        generate(spark, out, args.mult)
    _session._TABLE_CACHE.clear()

    base = time_queries(spark, "/root/testdata/sf0.1", queries)
    scaled = time_queries(spark, out, queries)
    report = {
        "mult": args.mult,
        "base_total": round(sum(base.values()), 3),
        "scaled_total": round(sum(scaled.values()), 3),
        "ratio": round(sum(scaled.values()) / sum(base.values()), 2),
        "base": base,
        "scaled": scaled,
        "per_query_ratio": {
            k: round(scaled[k] / max(base[k], 1e-9), 2) for k in base
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
