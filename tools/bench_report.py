"""Compare a bench.py run against the BASELINE.md bar (≤2× PySpark column).

    python bench.py > /tmp/bench.json && python tools/bench_report.py /tmp/bench.json
    python tools/bench_report.py            # runs bench.py itself

Prints one line per headline query with the measured/baseline ratio and an
overall PASS/FAIL against the 2× bar.
"""

from __future__ import annotations

import json
import subprocess
import sys

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


def main() -> int:
    if len(sys.argv) > 1:
        payload = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
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


if __name__ == "__main__":
    raise SystemExit(main())
