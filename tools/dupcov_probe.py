"""Optimization probe (guide §2.3/§2.4): llm_dup_coverage's join-back.

Variant A (shipped through r13): explode 5-gram shingles -> document-
frequency aggregate over ALL distinct grams -> join the full df relation
back on the gram -> per-doc groupBy over the FULL shingle mass. The
physical plan evaluates the interpreted 5-gram Generate TWICE (one scan
branch per consumer) and, past the broadcast threshold, shuffles the
exploded relation twice.

Variant B (r13, measured +169%, rejected): per-doc totals map-side,
join-back only the nd >= 2 subset — recomputes the gram array a third
time. Kept for the record.

Variant C (r14): nd as ``count(*) OVER (PARTITION BY g)`` — one Generate,
one exchange+sort of the exploded relation, no join, no second scan.
Exactly equivalent (per-row count of its g-group IS the document
frequency; every row joins in A since dpf is built from the same rows).

Equality asserted exactly across all three, then interleaved A-vs-C
timing at sf0.1 and the octave corpus. NOTE the octave corpus is
template-heavy (hit mass ~= full mass) — the organic case is sf0.1.

    python tools/dupcov_probe.py [--octave 50] [--rounds 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from backup_repo_spark.session import get_spark, load_table  # noqa: E402
import backup_repo_spark.session as _session  # noqa: E402
from tools.template_scale_probe import _gen, _OCTAVES  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sh5_arr():
    toks = F.split(F.col("text"), " ")
    return F.array_distinct(
        F.transform(
            F.slice(toks, 1, F.greatest(F.size(toks) - 4, F.lit(0))),
            lambda x, i: F.concat_ws(
                " ",
                x,
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
                F.element_at(toks, i + 4),
                F.element_at(toks, i + 5),
            ),
        )
    )


def dupcov_shipped(d: DataFrame) -> DataFrame:
    sh = d.select("doc_id", F.explode(_sh5_arr()).alias("g"))
    dpf = sh.groupBy("g").agg(F.count(F.lit(1)).alias("nd"))
    return (
        sh.join(dpf, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.round(
                F.count_if(F.col("nd") >= 2) * 1.0 / F.count(F.lit(1)), 4
            ).alias("dup_coverage"),
        )
        .orderBy("doc_id")
    )


def dupcov_hits(d: DataFrame) -> DataFrame:
    sh = d.select("doc_id", F.explode(_sh5_arr()).alias("g"))
    dup_g = (
        sh.groupBy("g")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    hits = (
        sh.join(dup_g, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nhit"))
    )
    totals = d.select(
        "doc_id", F.size(_sh5_arr()).cast("bigint").alias("n_shingles")
    ).filter(F.col("n_shingles") > 0)
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.round(
                F.coalesce(F.col("nhit"), F.lit(0)) * 1.0 / F.col("n_shingles"), 4
            ).alias("dup_coverage"),
        )
        .orderBy("doc_id")
    )


def dupcov_window(d: DataFrame) -> DataFrame:
    from pyspark.sql.window import Window

    sh = d.select("doc_id", F.explode(_sh5_arr()).alias("g"))
    nd = sh.select(
        "doc_id", F.count(F.lit(1)).over(Window.partitionBy("g")).alias("nd")
    )
    return (
        nd.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.round(
                F.count_if(F.col("nd") >= 2) * 1.0 / F.count(F.lit(1)), 4
            ).alias("dup_coverage"),
        )
        .orderBy("doc_id")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--octave", type=int, default=50, choices=[10, 50])
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    n_docs, fam = _OCTAVES[args.octave]
    corpus = os.path.join(_REPO, "spark-warehouse", f"collapse_probe_{args.octave}x")

    spark = get_spark("dupcov-probe")
    if not os.path.exists(f"{corpus}/documents.parquet"):
        _gen(spark, corpus, n_docs, fam)

    for eq_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1", corpus):
        _session._TABLE_CACHE.clear()
        d = load_table(spark, eq_dir, "documents")
        ra = [tuple(r) for r in dupcov_shipped(d).collect()]
        rb = [tuple(r) for r in dupcov_hits(d).collect()]
        rc = [tuple(r) for r in dupcov_window(d).collect()]
        assert ra == rb, f"variants A/B disagree at {eq_dir}"
        assert ra == rc, f"variants A/C disagree at {eq_dir}"
        print(f"equality OK at {eq_dir}: {len(ra)} rows", flush=True)

    for tdir in ("/root/testdata/sf0.1", corpus):
        _session._TABLE_CACHE.clear()
        d = load_table(spark, tdir, "documents")

        def run(fn):
            fn(d).write.mode("overwrite").format("noop").save()

        run(dupcov_shipped)
        run(dupcov_window)
        ta, tc = [], []
        for i in range(args.rounds):
            for label, fn, sink in (
                ("A/join", dupcov_shipped, ta),
                ("C/window", dupcov_window, tc),
            ):
                t0 = time.perf_counter()
                run(fn)
                dt = time.perf_counter() - t0
                sink.append(dt)
                print(f"[{tdir}] round {i} {label}: {dt:6.2f}s", flush=True)
        ma, mc = statistics.median(ta), statistics.median(tc)
        print(
            f"[{tdir}] A(join) median {ma:.2f}s  C(window) median {mc:.2f}s  "
            f"delta {100 * (mc - ma) / ma:+.1f}%",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
