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

``--suite tpch`` (VERDICT r5 #5; dispersion-stamped per VERDICT r7 #2)
widens the measured surface to the full TPC-H 22-query family at the
same sf: ``TPCH_PASSES`` interleaved passes time every query on Spark
AND its DuckDB oracle back-to-back within each pass, so each per-query
ratio is a same-moment sample. The record stamps per-query best, median
and spread for BOTH engines — a ratio flag (the r7 q19/q11 class) is
now adjudicable from BENCH_TPCH_r{N}.json alone: a flagged best whose
median/spread show a wide same-code envelope is box state, not engine.
Bar: spark ≤ 2× duckdb per query, 22× DuckDB-anchored flag line.
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


TPCH_PASSES = 5


def _disp(times: dict[str, list[float]]) -> tuple[dict, dict, dict]:
    """(best, median, spread) per key over the interleaved pass samples."""
    best = {m: round(min(v), 3) for m, v in times.items()}
    med = {m: round(statistics.median(v), 3) for m, v in times.items()}
    spr = {m: round(max(v) - min(v), 3) for m, v in times.items()}
    return best, med, spr


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
    # Warm pass (untimed, both engines) so the timed passes measure
    # steady state — same protocol intent as the headline suite.
    for key in TPCH_QUERIES.values():
        registry.QUERIES[key](spark, sf_dir).collect()
        con.execute(registry.ORACLES[key]).fetchall()

    # TPCH_PASSES interleaved passes; within a pass each query runs Spark
    # then DuckDB back-to-back, so every per-query ratio is a same-moment
    # sample and box-state drift cancels per query, not just per suite.
    spark_t: dict[str, list[float]] = {m: [] for m in TPCH_QUERIES}
    duck_t: dict[str, list[float]] = {m: [] for m in TPCH_QUERIES}
    pass_totals: list[float] = []
    for _ in range(TPCH_PASSES):
        total = 0.0
        for metric, key in TPCH_QUERIES.items():
            fn, osql = registry.QUERIES[key], registry.ORACLES[key]
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            spark_t[metric].append(dt)
            total += dt
            t0 = time.perf_counter()
            con.execute(osql).fetchall()
            duck_t[metric].append(time.perf_counter() - t0)
        pass_totals.append(round(total, 3))

    s_best, s_med, s_spr = _disp(spark_t)
    d_best, d_med, d_spr = _disp(duck_t)
    print(
        json.dumps(
            {
                "metric": f"bench_tpch_total_best{TPCH_PASSES}",
                "value": round(sum(s_best.values()), 3),
                "unit": "sec",
                "queries": s_best,
                "duckdb": d_best,
                "duckdb_total": round(sum(d_best.values()), 3),
                "sf": sf,
                "passes": TPCH_PASSES,
                "runs": pass_totals,
                "median": round(statistics.median(pass_totals), 3),
                "spread": round(max(pass_totals) - min(pass_totals), 3),
                "spark_median": s_med,
                "spark_spread": s_spr,
                "duckdb_median": d_med,
                "duckdb_spread": d_spr,
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


def _git(repo: str, *args: str) -> str:
    return subprocess.run(
        ["git", "-C", repo, *args], capture_output=True, text=True, check=True,
    ).stdout.strip()


def _ab_worktree(repo: str, sha: str) -> str:
    """Detached worktree of <sha> at .ab_<sha>, verified usable: a cached
    dir left by an interrupted `worktree add` or carrying local edits would
    silently skew the A-side, so an existing dir is re-validated (HEAD ==
    sha AND clean) and recreated if it fails either check."""
    ab_dir = os.path.join(repo, f".ab_{sha}")
    if os.path.isdir(ab_dir):
        try:
            ok = (
                # an EMPTY stale dir is not a worktree: git walks up to the
                # parent repo, so HEAD/status alone can validate it by
                # accident (ADVICE r8) — the toplevel must be ab_dir itself
                os.path.realpath(_git(ab_dir, "rev-parse", "--show-toplevel"))
                == os.path.realpath(ab_dir)
                and _git(ab_dir, "rev-parse", "HEAD") == _git(repo, "rev-parse", sha)
                and _git(ab_dir, "status", "--porcelain") == ""
            )
        except subprocess.CalledProcessError:
            ok = False  # not a git dir at all — half-created worktree
        if ok:
            return ab_dir
        print(f"# stale/dirty {ab_dir}: recreating", file=sys.stderr)
        subprocess.run(
            ["git", "worktree", "remove", "--force", ab_dir],
            cwd=repo, capture_output=True,
        )
        subprocess.run(["rm", "-rf", ab_dir], check=True)
        subprocess.run(["git", "worktree", "prune"], cwd=repo, capture_output=True)
    subprocess.run(
        ["git", "worktree", "add", "--detach", ab_dir, sha],
        cwd=repo, check=True, capture_output=True,
    )
    return ab_dir


def run_ab(base: str, rounds: int, sf_dir: str, sf: float,
           suite: str = "headline") -> None:
    """SCALING.md round-6 interleaved A/B protocol as code: alternating
    fresh ``python bench.py`` subprocesses (base checkout first, then HEAD
    working tree), strictly sequential, ``rounds`` rounds. Fresh process =
    fresh JVM per sample; interleaving cancels slow box-state drift. The
    medians (not single runs) carry the verdict: on this box the same-code
    envelope is ±10-12%, so only a median gap well past the recorded
    spreads is an engine regression. ``--suite tpch`` runs the same
    protocol over the TPC-H record (VERDICT r7 #2) — per-query flags in
    the A/B records stay adjudicable via their own dispersion stamps."""
    repo = os.path.dirname(os.path.abspath(__file__))
    sha = _git(repo, "rev-parse", "--short", base)
    ab_dir = _ab_worktree(repo, sha)
    env = {**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir}
    cmd = [sys.executable, "bench.py"]
    if suite != "headline":
        cmd += ["--suite", suite]
    a_recs: list[dict] = []
    b_recs: list[dict] = []
    for i in range(rounds):
        for label, cwd, sink in (("A", ab_dir, a_recs), ("B", repo, b_recs)):
            p = subprocess.run(
                cmd,
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
    # Per-query adjudication (VERDICT r10 #4: a single drifting headline
    # query must be A/B-attributable without a second session): median of
    # each query's per-run best across the A and B record sets. Queries
    # present on only one side (added/renamed between the base commit and
    # HEAD — the exact situation --ab exists for) are adjudicated as
    # one-sided rather than crashing after all rounds have completed.
    per_query = {}
    q_keys = set()
    for r in a_recs + b_recs:
        q_keys |= set(r.get("queries") or {})
    for q in sorted(q_keys):
        qa_runs = [float(r["queries"][q]) for r in a_recs
                   if q in (r.get("queries") or {})]
        qb_runs = [float(r["queries"][q]) for r in b_recs
                   if q in (r.get("queries") or {})]
        qa = statistics.median(qa_runs) if qa_runs else None
        qb = statistics.median(qb_runs) if qb_runs else None
        per_query[q] = {
            "a": round(qa, 3) if qa is not None else None,
            "b": round(qb, 3) if qb is not None else None,
            "delta_pct": (
                round(100.0 * (qb - qa) / qa, 1)
                if qa and qb is not None else None
            ),
        }
    print(
        json.dumps(
            {
                "metric": "bench_ab_interleaved",
                "base": sha,
                "suite": suite,
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
                "queries": per_query or None,
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
        run_ab(args.ab, args.ab_rounds, sf_dir, sf, suite=args.suite)
        return
    if args.suite == "tpch":
        run_tpch(sf_dir, sf)
        return
    run_headline(sf_dir, sf)


if __name__ == "__main__":
    main()
