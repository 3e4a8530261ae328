"""Interactive SQL shell — the reference's ``bin/hbase-sql`` analog
(SURVEY.md §2.A A11, upstream ``HBaseSQLCliDriver.scala``, unverified).

Starts the engine session, registers the testdata catalog, and REPLs
statements through the Astro dialect (MAPPED BY DDL / LOAD DATA INPATH
recognized; everything else delegated to Spark SQL).

    python tools/astro_shell.py [--sf /root/testdata/sf0.01] [-e "SELECT ..."]

``-e`` executes one statement batch (semicolon-separated) and exits —
the non-interactive mode CI/scripts use.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from backup_repo_spark.session import DEFAULT_SF_DIR, get_spark, register_views
from backup_repo_spark.sources.astro_dialect import AstroDialect


def split_statements(text: str) -> list[str]:
    """Split a batch on ';' — but only OUTSIDE quoted strings, so
    ``INSERT ... VALUES ('a;b')`` stays one statement. Tracks single- and
    double-quote state; a doubled quote inside a literal ('it''s') is two
    literals back-to-back to this scanner, which still nets out closed."""
    out: list[str] = []
    buf: list[str] = []
    quote: str | None = None
    for ch in text:
        if quote:
            if ch == quote:
                quote = None
            buf.append(ch)
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == ";":
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=DEFAULT_SF_DIR)
    ap.add_argument("-e", dest="execute", default=None, help="run statements and exit")
    ap.add_argument("--rows", type=int, default=20, help="max rows to display")
    args = ap.parse_args()

    spark = get_spark("astro-shell")
    register_views(spark, args.sf)
    dialect = AstroDialect(spark)

    def run(stmt: str) -> None:
        stmt = stmt.strip()
        if not stmt:
            return
        try:
            dialect.sql(stmt).show(args.rows, truncate=False)
        except Exception as e:  # noqa: BLE001 — shell must survive bad SQL
            print(f"ERROR: {str(e).splitlines()[0]}", file=sys.stderr)

    if args.execute is not None:
        for stmt in split_statements(args.execute):
            run(stmt)
        return 0

    print(f"astro-shell — tables registered from {args.sf}; 'exit' to quit")
    buf: list[str] = []
    while True:
        try:
            line = input("... " if buf else "sql> ")
        except EOFError:
            break
        if not buf and line.strip().lower() in ("exit", "quit"):
            break
        buf.append(line)
        if line.rstrip().endswith(";"):
            for stmt in split_statements(" ".join(buf)):
                run(stmt)
            buf = []
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
