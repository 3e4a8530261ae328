"""Interactive SQL shell — SURVEY.md §2.A row A11 (Astro's `bin/hbase-sql`
CLI analog). Registers the ten testdata tables as views and REPLs SQL.

    python tools/sql_shell.py [sf_dir]        # default $SPARK_GRAFT_SF_DIR
    echo "SELECT count(*) FROM lineitem" | python tools/sql_shell.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from backup_repo_spark.session import DEFAULT_SF_DIR, get_spark, register_views


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF_DIR
    spark = get_spark("sql-shell")
    register_views(spark, sf_dir)
    interactive = sys.stdin.isatty()
    if interactive:
        print(f"backup-repo-spark SQL shell — tables from {sf_dir}")
        print("tables: region nation customer supplier part orders lineitem "
              "events documents embeddings.  Ctrl-D to exit.")
    while True:
        try:
            line = input("sql> " if interactive else "")
        except EOFError:
            break
        line = line.strip().rstrip(";")
        if not line:
            continue
        if line.lower() in {"quit", "exit"}:
            break
        try:
            spark.sql(line).show(50, truncate=False)
        except Exception as e:  # noqa: BLE001
            first_line = next((ln for ln in str(e).splitlines() if ln.strip()), str(e))
            print(f"error: {first_line.strip()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
