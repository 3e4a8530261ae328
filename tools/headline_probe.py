"""Round-14 optimization probe (guide §1.1/§2.2/§6): where do the six
headline bench queries actually spend their sub-second wall time, and is
leaf-scan split count (``spark.sql.files.minPartitionNum`` defaulting to
defaultParallelism = the core count) part of it?

Motivation (BENCH_r13 vs BENCH_r13_c8): the identical suite reads FASTER
at 8 cores (2.372 s) than at 32 (2.975 s). The data files at sf0.1 are
~1-10 MB each, far under one 128 MB split, so the only reason a scan has
more than a couple of tasks is the ``minPartitionNum`` floor — which is
``defaultParallelism`` (the core count) by default. At 32 cores every
scan fans out to 32 tiny tasks whose per-task overhead is pure loss; at
production scale the byte-derived split count dwarfs any core floor, so
pinning the floor to 1 is scale-neutral by construction (the guide §6
lever, applied in reverse: the floor exists for small-but-expensive
inputs, which these scans are not).

Two modes:

``--diag``: one bench-profile session with the UI on; runs each headline
query once warm + once measured and prints per-query job count, task
count, total task time, scheduler-delay share (REST /jobs + /stages).

A/B (default): ``spark.sql.files.*`` are runtime-settable SQL confs, so
variants interleave WITHIN one session — per round, each variant runs the
whole suite once (fresh DataFrame per query, collect sink, bench
methodology); report = per-variant suite/per-query medians.

    python tools/headline_probe.py [--rounds 5] [--diag]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from backup_repo_spark import registry  # noqa: E402

_UI_PORT = 4048

BENCH_QUERIES = {
    "q_agg_lineitem": "agg_tpch_q1",
    "q_join3_topk": "topk_revenue",
    "q_join5_agg": "join_star_5way",
    "q_window_rank": "win_topn_per_group",
    "q_events_window": "stream_tumbling",
    "q_distinct_users": "agg_distinct",
}

# Variant -> runtime conf overrides (None = session default, i.e. the
# shipped bench profile where minPartitionNum floor = defaultParallelism).
VARIANTS: dict[str, dict[str, str]] = {
    "A_default": {},
    "B_minpart1": {"spark.sql.files.minPartitionNum": "1"},
}


def _spark(ui: bool) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.appName("headline-probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", str(ui).lower())
        .config("spark.ui.port", str(_UI_PORT))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    return b.getOrCreate()


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:{_UI_PORT}/api/v1/{path}") as r:
        return json.loads(r.read())


def diag(sf_dir: str) -> None:
    spark = _spark(ui=True)
    app = _rest("applications")[0]["id"]
    for metric, key in BENCH_QUERIES.items():
        fn = registry.QUERIES[key]
        fn(spark, sf_dir).collect()  # warm
        jobs_before = {j["jobId"] for j in _rest(f"applications/{app}/jobs")}
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        jobs = [
            j for j in _rest(f"applications/{app}/jobs") if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        n_tasks = 0
        task_time = 0.0
        sched_delay = 0.0
        stages = []
        for sid in stage_ids:
            try:
                st = _rest(f"applications/{app}/stages/{sid}")[0]
            except Exception:
                continue
            n_tasks += st["numCompleteTasks"]
            task_time += st["executorRunTime"] / 1000.0
            sched_delay += st.get("schedulerDelay", 0) / 1000.0
            stages.append(
                {
                    "stage": sid,
                    "tasks": st["numCompleteTasks"],
                    "runtime_s": round(st["executorRunTime"] / 1000.0, 3),
                    "name": st["name"].split("\n")[0][:60],
                }
            )
        print(
            json.dumps(
                {
                    "query": metric,
                    "wall_s": round(wall, 3),
                    "jobs": len(jobs),
                    "tasks": n_tasks,
                    "task_time_s": round(task_time, 3),
                    "stages": stages,
                }
            )
        )
    spark.stop()


def ab(sf_dir: str, rounds: int) -> None:
    spark = _spark(ui=False)
    defaults = {
        k: spark.conf.get(k, None)
        for v in VARIANTS.values()
        for k in v
    }

    def _apply(conf: dict[str, str]) -> None:
        for k, dflt in defaults.items():
            if k in conf:
                spark.conf.set(k, conf[k])
            elif dflt is not None:
                spark.conf.set(k, dflt)
            else:
                spark.conf.unset(k)

    # Warm pass per variant (untimed).
    for conf in VARIANTS.values():
        _apply(conf)
        for key in BENCH_QUERIES.values():
            registry.QUERIES[key](spark, sf_dir).collect()

    suite: dict[str, list[float]] = {v: [] for v in VARIANTS}
    perq: dict[str, dict[str, list[float]]] = {
        v: {m: [] for m in BENCH_QUERIES} for v in VARIANTS
    }
    for _ in range(rounds):
        for variant, conf in VARIANTS.items():
            _apply(conf)
            total = 0.0
            for metric, key in BENCH_QUERIES.items():
                fn = registry.QUERIES[key]
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                perq[variant][metric].append(dt)
                total += dt
            suite[variant].append(round(total, 3))
    out = {
        "metric": "headline_scan_split_ab",
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "rounds": rounds,
        "suite_runs": suite,
        "suite_median": {v: round(statistics.median(r), 3) for v, r in suite.items()},
        "per_query_median": {
            v: {m: round(statistics.median(t), 3) for m, t in q.items()}
            for v, q in perq.items()
        },
    }
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--diag", action="store_true")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args.diag:
        diag(sf_dir)
    else:
        ab(sf_dir, args.rounds)


if __name__ == "__main__":
    main()
