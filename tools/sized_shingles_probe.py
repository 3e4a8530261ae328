"""Round-13 optimization probe (guide §2.3): per-doc shingle-set size
attached MAP-SIDE at explode time vs the old `sizes` groupBy + two
pair-relation join-backs, over the all-pairs exact-Jaccard diagnostics
(`_exact_pairs` — llm_dedup_ngram / llm_lsh_eval tp / llm_lsh_plan tp,
and llm_jaccard_histogram's inline twin).

Variant A — pre-r13 shape: explode -> self-join on sh -> groupBy(count)
-> join `sizes` twice on da/db.
Variant B — the SHIPPED `_exact_pairs` since r13: `_sized_shingles`
carries n on every exploded row (the array is materialized once below
the Generate), the pair aggregate takes max(n) per side, and the
join-backs disappear. Same integers -> same doubles -> identical rows.

Equality asserted (exact tuple set, unrounded doubles) at sf0.01 and
the octave corpus, then interleaved timing, medians carry the verdict.

    python tools/sized_shingles_probe.py [--octave 10] [--rounds 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from backup_repo_spark.llm import dedup as D  # noqa: E402
from backup_repo_spark.session import get_spark, load_table  # noqa: E402
import backup_repo_spark.session as _session  # noqa: E402
from tools.template_scale_probe import _gen, _OCTAVES  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def exact_pairs_joinback(d: DataFrame, tau: float) -> DataFrame:
    """The pre-r13 `_exact_pairs` (variant A), kept verbatim as the
    reference arm and equality witness."""
    shingles = D._shingles3(d)
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = shingles.alias("a"), shingles.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") * 1.0 / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
    return (
        inter.join(sizes.alias("sa"), F.col("da") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("db") == F.col("sb.doc_id"))
        .filter(jac >= tau)
        .select("da", "db", jac.alias("jaccard"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--octave", type=int, default=10, choices=[10, 50])
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    n_docs, fam = _OCTAVES[args.octave]
    corpus = os.path.join(_REPO, "spark-warehouse", f"collapse_probe_{args.octave}x")

    spark = get_spark("sized-shingles-probe")
    if not os.path.exists(f"{corpus}/documents.parquet"):
        _gen(spark, corpus, n_docs, fam)

    for eq_dir in ("/root/testdata/sf0.01", corpus):
        _session._TABLE_CACHE.clear()
        d = load_table(spark, eq_dir, "documents")
        rows_a = {(r.da, r.db, r.jaccard) for r in exact_pairs_joinback(d, 0.35).collect()}
        rows_b = {(r.da, r.db, r.jaccard) for r in D._exact_pairs(d, 0.35).collect()}
        assert rows_a == rows_b, f"variants disagree at {eq_dir}"
        print(f"equality OK at {eq_dir}: {len(rows_a)} pairs", flush=True)

    _session._TABLE_CACHE.clear()
    d = load_table(spark, corpus, "documents")

    def run_a():
        exact_pairs_joinback(d, 0.35).write.mode("overwrite").format("noop").save()

    def run_b():
        D._exact_pairs(d, 0.35).write.mode("overwrite").format("noop").save()

    run_a()
    run_b()
    ta, tb = [], []
    for i in range(args.rounds):
        for label, fn, sink in (("A/joinback", run_a, ta), ("B/sized", run_b, tb)):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            sink.append(dt)
            print(f"round {i} {label}: {dt:6.2f}s", flush=True)
    ma, mb = statistics.median(ta), statistics.median(tb)
    print(
        f"A(joinback) median {ma:.2f}s  B(sized) median {mb:.2f}s  "
        f"delta {100 * (mb - ma) / ma:+.1f}%"
    )
    spark.stop()


if __name__ == "__main__":
    main()
