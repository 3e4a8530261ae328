"""Dump ``explain("formatted")`` for registry keys to a directory.

Round-13 optimization tooling: the judge checks plan claims against
committed plan files, and the optimization audit greps these dumps for
anti-patterns (Exchange counts, BatchEvalPython/ArrowEvalPython nodes,
missing PushedFilters). Analysis only — nothing executes.

    python tools/plan_dump.py plans/r13 [KEY ...]   # default: all batch keys
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from backup_repo_spark import registry  # noqa: E402
from backup_repo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# Streaming keys build unbounded plans / need runtime state; the plan story
# for those lives in the streaming stress tests, not in batch explain output.
SKIP_PREFIXES = ("stream_",)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r13"
    keys = sys.argv[2:] or [
        k for k in registry.QUERIES if not k.startswith(SKIP_PREFIXES)
    ]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump", shuffle_partitions=8, adaptive=False)
    failed: list[str] = []
    for k in keys:
        try:
            df = registry.QUERIES[k](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            failed.append(k)
            print(f"FAIL {k}: {e}", file=sys.stderr)
            continue
        with open(os.path.join(out_dir, f"{k}.txt"), "w") as f:
            f.write(plan)
    print(f"dumped {len(keys) - len(failed)}/{len(keys)} plans to {out_dir}")
    if failed:
        print("failed:", ", ".join(failed))


if __name__ == "__main__":
    main()
