"""Round-14 optimization probe (guide §2.4): llm_lm_score's count joins.

Variant A (shipped through r13): bigram explode -> unigram/bigram count
aggregates + global vocab -> two equi-joins back onto the exploded
relation -> per-doc average NLL. The physical plan evaluates the
interpreted bigram Generate FOUR times (one scan branch per consumer:
join input, bic, uni, vocab) and, past the broadcast threshold, shuffles
the exploded relation once per join.

Variant B (r14): cu and cb as window counts — ``count(*) OVER
(PARTITION BY w1)`` then ``count(*) OVER (PARTITION BY w1, w2)``.
The w1 window runs FIRST so its hash(w1) exchange also satisfies the
(w1, w2) window's clustering (subset partitioning); only vocab (a global
countDistinct) keeps its own scan branch. Two Generates, one exchange of
the exploded mass, no joins. Same integers per row -> same nll values;
round(avg, 4) absorbs the ~1e-13 float reassociation noise exactly as it
does between Spark and the DuckDB oracle.

Equality asserted exactly, then interleaved timing at sf0.1 and the
octave corpus at the noop sink.

    python tools/lmscore_probe.py [--octave 50] [--rounds 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from backup_repo_spark.session import get_spark, load_table  # noqa: E402
import backup_repo_spark.session as _session  # noqa: E402
from tools.template_scale_probe import _gen, _OCTAVES  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bigrams(d: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    pairs = F.filter(
        F.transform(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda x, i: F.struct(
                x.alias("w1"), F.element_at(toks, i + 2).alias("w2")
            ),
        ),
        lambda s: (F.length(s["w1"]) > 0) & (F.length(s["w2"]) > 0),
    )
    return d.select("doc_id", F.explode(pairs).alias("b")).select(
        "doc_id", "b.w1", "b.w2"
    )


def lmscore_joins(d: DataFrame) -> DataFrame:
    bg = _bigrams(d)
    uni = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    bic = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    vocab = bg.agg(F.countDistinct("w2").alias("vocab"))
    nll = -F.log((F.col("cb") + 1.0) / (F.col("cu") + F.col("vocab")))
    return (
        bg.join(bic, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(nll), 4).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


def lmscore_windows(d: DataFrame) -> DataFrame:
    bg = _bigrams(d)
    vocab = bg.agg(F.countDistinct("w2").alias("vocab"))
    counted = bg.select(
        "doc_id",
        F.count(F.lit(1)).over(Window.partitionBy("w1")).alias("cu"),
        F.count(F.lit(1)).over(Window.partitionBy("w1", "w2")).alias("cb"),
    )
    nll = -F.log((F.col("cb") + 1.0) / (F.col("cu") + F.col("vocab")))
    return (
        counted.crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(nll), 4).alias("avg_nll"),
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

    spark = get_spark("lmscore-probe")
    if not os.path.exists(f"{corpus}/documents.parquet"):
        _gen(spark, corpus, n_docs, fam)

    for eq_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1", corpus):
        _session._TABLE_CACHE.clear()
        d = load_table(spark, eq_dir, "documents")
        ra = [tuple(r) for r in lmscore_joins(d).collect()]
        rb = [tuple(r) for r in lmscore_windows(d).collect()]
        assert ra == rb, f"variants disagree at {eq_dir}"
        print(f"equality OK at {eq_dir}: {len(ra)} rows", flush=True)

    for tdir in ("/root/testdata/sf0.1", corpus):
        _session._TABLE_CACHE.clear()
        d = load_table(spark, tdir, "documents")

        def run(fn):
            fn(d).write.mode("overwrite").format("noop").save()

        run(lmscore_joins)
        run(lmscore_windows)
        ta, tb = [], []
        for i in range(args.rounds):
            for label, fn, sink in (
                ("A/joins", lmscore_joins, ta),
                ("B/windows", lmscore_windows, tb),
            ):
                t0 = time.perf_counter()
                run(fn)
                dt = time.perf_counter() - t0
                sink.append(dt)
                print(f"[{tdir}] round {i} {label}: {dt:6.2f}s", flush=True)
        ma, mb = statistics.median(ta), statistics.median(tb)
        print(
            f"[{tdir}] A(joins) median {ma:.2f}s  B(windows) median {mb:.2f}s  "
            f"delta {100 * (mb - ma) / ma:+.1f}%",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
