"""Benchmark harness — runs the BASELINE.md headline queries through the
engine and prints ONE JSON line (driver contract).

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Protocol (VERDICT r6 #2, dispersion-stamped): after one untimed warm pass,
the whole suite runs ``PASSES`` (7) interleaved timed passes — every query
timed once per pass, fresh DataFrame each time, collection included,
session start excluded. Per-query value = best over passes (same best-of-N
family as BASELINE.md); the record additionally carries ``runs`` (all
per-pass suite totals), ``median`` and ``spread`` (max-min of the pass
totals) so a future cross-round delta is adjudicable from the record
alone: this box's measured same-code envelope is ±10-12% (SCALING.md
round 6), and any move inside the recorded spread is noise by
construction.

``--ab <commit>`` ships the SCALING.md round-6 interleaved A/B as code:
alternating fresh ``python bench.py`` subprocesses against a detached
checkout of <commit> (``.ab_<sha>/``, gitignored) and HEAD's working
tree, strictly sequential, N rounds each, comparing medians — the ONLY
protocol under which a cross-version headline-bench claim is valid on
this box.

``--suite tpch`` (VERDICT r5 #5) widens the measured surface to the full
TPC-H 22-query family at the same sf: per-query Spark best-of-3 PLUS the
same query's DuckDB oracle best-of-3 on the same parquet, so every row
carries its own engine-independent baseline (bar: spark ≤ 2× duckdb,
tracked per round as BENCH_TPCH_r{N}.json).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

PASSES = 7

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from backup_repo_spark import registry  # noqa: E402
from backup_repo_spark.session import get_spark  # noqa: E402

# BASELINE.md metric name -> registry query key
BENCH_QUERIES = {
    "q_agg_lineitem": "agg_tpch_q1",
    "q_join3_topk": "topk_revenue",
    "q_join5_agg": "join_star_5way",
    "q_window_rank": "win_topn_per_group",
    "q_events_window": "stream_tumbling",
    "q_distinct_users": "agg_distinct",
}


# TPC-H 22/22: Q1/Q3/Q5 live under their operator-contract names
# (B20/B37/B17 flagships), the rest under tpch_q*_style.
TPCH_QUERIES = {
    "q1": "agg_tpch_q1",
    "q2": "tpch_q2_style",
    "q3": "topk_revenue",
    "q4": "tpch_q4_style",
    "q5": "join_star_5way",
    "q6": "tpch_q6_style",
    "q7": "tpch_q7_style",
    "q8": "tpch_q8_style",
    "q9": "tpch_q9_style",
    "q10": "tpch_q10_style",
    "q11": "tpch_q11_style",
    "q12": "tpch_q12_style",
    "q13": "tpch_q13_style",
    "q14": "tpch_q14_style",
    "q15": "tpch_q15_style",
    "q16": "tpch_q16_style",
    "q17": "tpch_q17_style",
    "q18": "tpch_q18_style",
    "q19": "tpch_q19_style",
    "q20": "tpch_q20_style",
    "q21": "tpch_q21_style",
    "q22": "tpch_q22_style",
}


def _best3(run) -> float:
    run()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def run_tpch(sf_dir: str, sf: float) -> None:
    import duckdb

    from backup_repo_spark.session import TABLES

    spark = get_spark("bench-tpch", shuffle_partitions=8, adaptive=False)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark_secs: dict[str, float] = {}
    duck_secs: dict[str, float] = {}
    for metric, key in TPCH_QUERIES.items():
        fn, osql = registry.QUERIES[key], registry.ORACLES[key]
        spark_secs[metric] = _best3(lambda: fn(spark, sf_dir).collect())
        duck_secs[metric] = _best3(lambda: con.execute(osql).fetchall())
    print(
        json.dumps(
            {
                "metric": "bench_tpch_total_best3",
                "value": round(sum(spark_secs.values()), 3),
                "unit": "sec",
                "queries": spark_secs,
                "duckdb": duck_secs,
                "duckdb_total": round(sum(duck_secs.values()), 3),
                "sf": sf,
            }
        )
    )


def run_headline(sf_dir: str, sf: float) -> None:
    # BASELINE.md methodology: shuffle.partitions=8 at this tiny scale; AQE
    # off for the bench profile (its stage-materialization barriers cost
    # ~30% on sub-second queries and fix nothing at sf0.1 — see session.py).
    spark = get_spark("bench", shuffle_partitions=8, adaptive=False)
    # Warm-up pass: run every bench query once untimed so best-of-N measures
    # steady-state execution (JIT-compiled codegen, warm parquet footers),
    # matching BASELINE.md's best-of-N protocol intent.
    for key in BENCH_QUERIES.values():
        registry.QUERIES[key](spark, sf_dir).collect()

    # PASSES interleaved suite passes: each pass times every query once, so
    # the per-pass totals are same-moment samples of the whole suite — their
    # median and spread quantify this box's run-to-run envelope in the
    # record itself (VERDICT r6 #2).
    per_query: dict[str, list[float]] = {m: [] for m in BENCH_QUERIES}
    pass_totals: list[float] = []
    for _ in range(PASSES):
        total = 0.0
        for metric, key in BENCH_QUERIES.items():
            fn = registry.QUERIES[key]
            # Fresh DataFrame per run: re-collecting one DataFrame object lets
            # AQE reuse materialized shuffle outputs, which would measure
            # result-cache hits instead of execution. Rebuild so every run
            # pays analysis + optimization + full execution + fetch.
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            per_query[metric].append(dt)
            total += dt
        pass_totals.append(round(total, 3))

    results = {m: round(min(v), 3) for m, v in per_query.items()}
    print(
        json.dumps(
            {
                "metric": f"bench_total_best{PASSES}",
                "value": round(sum(results.values()), 3),
                "unit": "sec",
                "queries": results,
                "sf": sf,
                "passes": PASSES,
                "runs": pass_totals,
                "median": round(statistics.median(pass_totals), 3),
                "spread": round(max(pass_totals) - min(pass_totals), 3),
            }
        )
    )


def _ab_stat(recs: list) -> str:
    """Like-for-like A/B statistic: per-run medians only when EVERY record
    stamps one; otherwise fall back to `value` on both sides.  An
    old-format checkout reports best-of-3 as `value` — comparing its best
    against HEAD's median would bake a ~15-20% artifact into delta_pct
    (best-of-N sits below a median by construction; the first smoke run
    of this tool read a phantom +21.7% exactly this way)."""
    return "median" if all("median" in r for r in recs) else "value"


def _bench_record(stdout: str) -> dict:
    """Parse the JSON record from one bench subprocess's output."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in bench output: {stdout[-500:]!r}")


def run_ab(base: str, rounds: int, sf_dir: str, sf: float) -> None:
    """SCALING.md round-6 interleaved A/B protocol as code: alternating
    fresh ``python bench.py`` subprocesses (base checkout first, then HEAD
    working tree), strictly sequential, ``rounds`` rounds. Fresh process =
    fresh JVM per sample; interleaving cancels slow box-state drift. The
    medians (not single runs) carry the verdict: on this box the same-code
    envelope is ±10-12%, so only a median gap well past the recorded
    spreads is an engine regression."""
    repo = os.path.dirname(os.path.abspath(__file__))
    sha = subprocess.run(
        ["git", "rev-parse", "--short", base],
        cwd=repo, capture_output=True, text=True, check=True,
    ).stdout.strip()
    ab_dir = os.path.join(repo, f".ab_{sha}")
    if not os.path.isdir(ab_dir):
        subprocess.run(
            ["git", "worktree", "add", "--detach", ab_dir, sha],
            cwd=repo, check=True, capture_output=True,
        )
    env = {**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir}
    a_recs: list[dict] = []
    b_recs: list[dict] = []
    for i in range(rounds):
        for label, cwd, sink in (("A", ab_dir, a_recs), ("B", repo, b_recs)):
            p = subprocess.run(
                [sys.executable, "bench.py"],
                cwd=cwd, env=env, capture_output=True, text=True, check=True,
            )
            rec = _bench_record(p.stdout)
            sink.append(rec)
            print(
                f"# round {i + 1} {label} ({cwd}): value={rec['value']} "
                f"median={rec.get('median', '-')}",
                file=sys.stderr,
            )
    stat = _ab_stat(a_recs + b_recs)
    a_runs = [float(r[stat]) for r in a_recs]
    b_runs = [float(r[stat]) for r in b_recs]
    print(
        json.dumps(
            {
                "metric": "bench_ab_interleaved",
                "base": sha,
                "rounds": rounds,
                "unit": "sec",
                "stat": stat,
                "a_base": a_runs,
                "b_head": b_runs,
                "a_median": round(statistics.median(a_runs), 3),
                "b_median": round(statistics.median(b_runs), 3),
                "delta_pct": round(
                    100.0
                    * (statistics.median(b_runs) - statistics.median(a_runs))
                    / statistics.median(a_runs),
                    1,
                ),
                "sf": sf,
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=["headline", "tpch"], default="headline")
    ap.add_argument(
        "--ab",
        metavar="COMMIT",
        help="interleaved A/B: alternate fresh bench subprocesses between a "
        "checkout of COMMIT and HEAD, print both medians",
    )
    ap.add_argument("--ab-rounds", type=int, default=4)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    if args.ab:
        run_ab(args.ab, args.ab_rounds, sf_dir, sf)
        return
    if args.suite == "tpch":
        run_tpch(sf_dir, sf)
        return
    run_headline(sf_dir, sf)


if __name__ == "__main__":
    main()
