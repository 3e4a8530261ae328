"""Compare a bench.py run against the BASELINE.md bar (≤2× PySpark column).

    python bench.py > /tmp/bench.json && python tools/bench_report.py /tmp/bench.json
    python tools/bench_report.py            # runs bench.py itself

Prints one line per headline query with the measured/baseline ratio and an
overall PASS/FAIL against the 2× bar.

TPC-H mode reads a dispersion-stamped BENCH_TPCH_r{N}.json (round 8+)
and adjudicates per-query ratio flags from the record alone — optionally
against a prior round's record for cross-round moves (both the bare
positional and the --prior flag idiom work):

    python tools/bench_report.py --tpch BENCH_TPCH_r09.json [BENCH_TPCH_r08.json]
    python tools/bench_report.py --tpch BENCH_TPCH_r09.json --prior BENCH_TPCH_r08.json
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

TPCH_FLAG = 22.0   # DuckDB-anchored absolute line (BASELINE.md round 6)
MOVE_FLAG = 1.5    # cross-round ratio-move trigger (BASELINE.md round 7)
# Times are stamped rounded to 3 decimals, so a sub-ms DuckDB anchor can
# legitimately round to 0.000 (ADVICE r8) — ratios against it are
# meaningless; flag the anchor instead of dividing by it.
MIN_ANCHOR = 0.001


def tpch_report(path: str, prior_path: str | None) -> int:
    rec = json.load(open(path))
    prior = json.load(open(prior_path)) if prior_path else None
    has_disp = "spark_median" in rec
    ok = True
    hdr = f"{'query':<5} {'spark':>7} {'med':>7} {'spr':>6} {'duck':>7} {'ratio':>7}"
    if prior:
        hdr += f" {'prior':>7} {'move':>6}"
    print(hdr)
    for q, best in rec["queries"].items():
        duck = rec["duckdb"][q]
        ratio = best / max(duck, MIN_ANCHOR)
        med = rec["spark_median"][q] if has_disp else float("nan")
        spr = rec["spark_spread"][q] if has_disp else float("nan")
        line = f"{q:<5} {best:>7.3f} {med:>7.3f} {spr:>6.3f} {duck:>7.3f} {ratio:>6.1f}x"
        flags = []
        if duck < MIN_ANCHOR:
            flags.append("sub-ms DuckDB anchor — ratio not meaningful")
        if ratio > TPCH_FLAG:
            flags.append(f"over {TPCH_FLAG:.0f}x line")
            ok = False
        if prior:
            pq_spark = prior.get("queries", {}).get(q)
            pq_duck = prior.get("duckdb", {}).get(q)
            if pq_spark is None or pq_duck is None:
                line += f" {'—':>7} {'—':>6}"
                flags.append("absent from prior record — no move column")
            else:
                pratio = pq_spark / max(pq_duck, MIN_ANCHOR)
                move = ratio / max(pratio, 1e-9)
                line += f" {pratio:>6.1f}x {move:>5.2f}x"
                if move > MOVE_FLAG or move < 1 / MOVE_FLAG:
                    flags.append("moved >1.5x vs prior — probe before concluding")
        if flags:
            line += "  <-- " + "; ".join(flags)
        print(line)
    total, dtotal = rec["value"], rec["duckdb_total"]
    print(f"TOTAL {total:>7.3f}{'':>15}{dtotal:>8.3f} {total / max(dtotal, MIN_ANCHOR):>6.1f}x")
    print("PASS" if ok else "FAIL (adjudicate via spread/--ab before treating as engine)")
    return 0 if ok else 1

# PySpark column of BASELINE.md (sf0.1, best-of-3 seconds, measured on this
# container — see BASELINE.md for methodology).
BASELINE_PYSPARK = {
    "q_agg_lineitem": 0.492,
    "q_join3_topk": 0.870,
    "q_join5_agg": 0.939,
    "q_window_rank": 0.361,
    "q_events_window": 0.213,
    "q_distinct_users": 0.208,
}
BAR = 2.0


def headline_report(record_path: str | None) -> int:
    if record_path:
        payload = json.loads(open(record_path).read().strip().splitlines()[-1])
    else:
        out = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True, check=True
        ).stdout
        payload = json.loads(out.strip().splitlines()[-1])

    ok = True
    print(f"{'query':<18} {'bench':>7} {'base':>7} {'ratio':>6}")
    for name, base in BASELINE_PYSPARK.items():
        got = payload["queries"].get(name)
        if got is None:
            print(f"{name:<18} {'MISSING':>7}")
            ok = False
            continue
        ratio = got / base
        flag = "" if ratio <= BAR else "  <-- over 2x bar"
        if ratio > BAR:
            ok = False
        print(f"{name:<18} {got:>7.3f} {base:>7.3f} {ratio:>5.2f}x{flag}")
    total = payload["value"]
    base_total = sum(BASELINE_PYSPARK.values())
    print(f"{'TOTAL':<18} {total:>7.3f} {base_total:>7.3f} {total / base_total:>5.2f}x")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "records",
        nargs="*",
        help="headline mode: one bench.py output file (default: run bench.py); "
        "--tpch mode: CURRENT [PRIOR] TPC-H records",
    )
    ap.add_argument(
        "--tpch",
        action="store_true",
        help="adjudicate a dispersion-stamped BENCH_TPCH record's per-query "
        "ratio flags instead of the headline baseline bar",
    )
    ap.add_argument(
        "--prior",
        default=None,
        help="(--tpch) prior-round record for the cross-round move column — "
        "same meaning as the second positional",
    )
    args = ap.parse_args(argv)
    if args.tpch:
        if not args.records:
            ap.error("--tpch needs the current BENCH_TPCH record path")
        if len(args.records) > 2 or (args.prior and len(args.records) > 1):
            ap.error("--tpch takes CURRENT [PRIOR] (or --prior PRIOR), nothing more")
        prior = args.prior or (args.records[1] if len(args.records) > 1 else None)
        return tpch_report(args.records[0], prior)
    if args.prior:
        ap.error("--prior is a --tpch option")
    if len(args.records) > 1:
        ap.error("headline mode takes at most one record file")
    return headline_report(args.records[0] if args.records else None)


if __name__ == "__main__":
    raise SystemExit(main())
