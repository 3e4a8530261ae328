"""Round-14 headline-query shape A/B (guide §1.1, §2.4, §3.1).

Hypotheses from tools/headline_probe.py --diag (r14 session):

1. ``join_star_5way`` broadcasts LINEITEM (600k rows x 4 cols — the fact
   table; plans/r13/join_star_5way_r13.txt node 13) because Catalyst's
   size estimate for the c⋈o side is join-inflated past the 32 MB
   threshold. The 0.34 s single-task hashed-relation build is the
   query's critical path. Variant: stream lineitem, broadcast
   (orders ⋈ customer) projected to (o_orderkey, c_nationkey) and the
   tiny (supplier ⋈ nation ⋈ region) dim — the canonical Q5 shape that
   also matches what any cluster-scale plan must do (lineitem can never
   be the broadcast side at scale).

2. Final ``orderBy`` on a bounded-cardinality aggregate output (q1: ≤8
   flag pairs; distinct: #event_types; tumbling: hour x type buckets;
   join5: ≤25 nations) plans Exchange rangepartitioning(8), which costs
   a separate range-sampling JOB that recomputes the final aggregate
   and doubles per-query job latency (diag: jobs=2 with a skipped-stage
   re-run). ``coalesce(1)`` before the sort makes the sort input
   SinglePartition — no exchange, no sampling job, identical rows AND
   order (guide §2.4: "an orderBy used only to make output
   deterministic").

3. ``topk_revenue`` builds a 150k-row broadcast of ALL orders; joining
   customer(BUILDING) into orders first shrinks the build ~5x.

Every variant's collected result is asserted IDENTICAL (values and row
order) to the shipped query before any timing. Timing: one bench-profile
session, arms interleaved per round, medians reported.

    python tools/headline_shapes_probe.py [--rounds 7]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from backup_repo_spark import registry  # noqa: E402
from backup_repo_spark.session import get_spark, load_table, load_events  # noqa: E402

_FMT = "yyyy-MM-dd HH:mm:ss"


# ---------------------------------------------------------------- variants
# (the shipped fns are closed over their orderBy, so each variant is
# hand-written: the shipped body with only the shape change under test)
def q1_shipped(spark, sf_dir):
    return registry.QUERIES["agg_tpch_q1"](spark, sf_dir)


def q1_c1(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .coalesce(1)
        .orderBy("l_returnflag", "l_linestatus")
    )


def distinct_shipped(spark, sf_dir):
    return registry.QUERIES["agg_distinct"](spark, sf_dir)


def distinct_c1(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("du"), F.count(F.lit(1)).alias("n"))
        .coalesce(1)
        .orderBy("event_type")
    )


def tumbling_shipped(spark, sf_dir):
    return registry.QUERIES["stream_tumbling"](spark, sf_dir)


def tumbling_c1(spark, sf_dir):
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


def join5_shipped(spark, sf_dir):
    return registry.QUERIES["join_star_5way"](spark, sf_dir)


def _join5_fact_stream(spark, sf_dir):
    """Stream lineitem; broadcast (orders⋈customer)→(o_orderkey,
    c_nationkey) and (supplier⋈nation⋈region under r_name='ASIA')."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    co = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_nationkey")
    )
    snr = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(F.broadcast(snr), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(co),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def join5_fact_stream(spark, sf_dir):
    return _join5_fact_stream(spark, sf_dir).orderBy(F.desc("revenue"), "n_name")


def join5_fact_stream_c1(spark, sf_dir):
    return (
        _join5_fact_stream(spark, sf_dir)
        .coalesce(1)
        .orderBy(F.desc("revenue"), "n_name")
    )


def topk_shipped(spark, sf_dir):
    return registry.QUERIES["topk_revenue"](spark, sf_dir)


def topk_prefiltered(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    co = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    return (
        li.join(F.broadcast(co), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"))
        .orderBy(F.desc("_rev"), "o_orderkey")
        .limit(10)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("odate"),
            F.round("_rev", 2).alias("revenue"),
        )
    )


# arm -> {metric: builder}; the "shipped" arm is the control.
ARMS: dict[str, dict] = {
    "shipped": {
        "q_agg_lineitem": q1_shipped,
        "q_join3_topk": topk_shipped,
        "q_join5_agg": join5_shipped,
        "q_events_window": tumbling_shipped,
        "q_distinct_users": distinct_shipped,
    },
    "opt": {
        "q_agg_lineitem": q1_c1,
        "q_join3_topk": topk_prefiltered,
        "q_join5_agg": join5_fact_stream_c1,
        "q_events_window": tumbling_c1,
        "q_distinct_users": distinct_c1,
    },
    # isolate the join5 rewrite without the coalesce so the two effects
    # are separable in the record
    "opt_join5_nosort": {
        "q_join5_agg": join5_fact_stream,
    },
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=7)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("headline-shapes", shuffle_partitions=8, adaptive=False)

    # Equality gate: every variant must return the identical row list
    # (values AND order) as the shipped query at sf0.1 and sf0.01.
    for gate_dir in ("/root/testdata/sf0.01", sf_dir):
        base = {
            m: [tuple(r) for r in fn(spark, gate_dir).collect()]
            for m, fn in ARMS["shipped"].items()
        }
        for arm, qs in ARMS.items():
            if arm == "shipped":
                continue
            for m, fn in qs.items():
                got = [tuple(r) for r in fn(spark, gate_dir).collect()]
                assert got == base[m], f"{arm}/{m} result mismatch at {gate_dir}"
    print("# equality gate passed (values + order, sf0.01 and sf0.1)", file=sys.stderr)

    # Warm pass per arm.
    for qs in ARMS.values():
        for fn in qs.values():
            fn(spark, sf_dir).collect()

    t: dict[str, dict[str, list[float]]] = {
        a: {m: [] for m in qs} for a, qs in ARMS.items()
    }
    for _ in range(args.rounds):
        for arm, qs in ARMS.items():
            for m, fn in qs.items():
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                t[arm][m].append(time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "metric": "headline_shapes_ab",
                "rounds": args.rounds,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "median": {
                    a: {m: round(statistics.median(v), 3) for m, v in qs.items()}
                    for a, qs in t.items()
                },
                "best": {
                    a: {m: round(min(v), 3) for m, v in qs.items()}
                    for a, qs in t.items()
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
