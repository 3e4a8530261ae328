"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, sorted column names, and
order-insensitive values. Use while iterating:

    python tools/selfcheck.py                # all queries at sf0.01
    python tools/selfcheck.py --sf sf0.001 agg_tpch_q1 join_broadcast
"""

from __future__ import annotations

import argparse
import sys
import time

import duckdb

sys.path.insert(0, ".")

from backup_repo_spark import registry
from backup_repo_spark.session import TABLES, get_spark
from backup_repo_spark.testing import compare, hard_problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query keys (default: all)")
    ap.add_argument("--sf", default="sf0.01")
    args = ap.parse_args()

    sf_dir = f"/root/testdata/{args.sf}"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark("selfcheck")
    names = args.names or sorted(registry.QUERIES)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        fn = registry.QUERIES[name]
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in registry.ORACLES:
            print(f"rows {name}: {len(spark_pdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            duck_pdf = con.execute(registry.ORACLES[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(spark_pdf, duck_pdf)
        hard = hard_problems(problems)
        if hard:
            print(f"FAIL {name} ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"   {p}")
            n_fail += 1
        else:
            warn = "; ".join(p for p in problems if "WARN" in p)
            print(
                f"ok   {name} ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]"
                f"{' ' + warn if warn else ''}"
            )
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAIL of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
