"""Round-14 optimization probe (guide §2.4): llm_novelty_score's join-back.

Variant A (shipped through r13): explode distinct bigrams -> per-bigram
first-occurrence aggregate (min doc_id) -> equi-join back on the bigram
-> per-doc novelty ratio. Two interpreted bigram Generates (one scan
branch per consumer) and, past the broadcast threshold, a second shuffle
of the exploded relation for the join.

Variant B (r14): first_doc as ``min(doc_id) OVER (PARTITION BY bg)`` —
one Generate, one exchange of the exploded mass, no join. Exactly
equivalent: the window min over a row's bg-group IS the aggregate's
min, and the inner join kept every row since first_seen was built from
the same relation.

Equality asserted exactly (order-insensitive — the key has no ORDER BY),
then interleaved timing at sf0.1 and the octave corpus at the noop sink.

    python tools/novelty_probe.py [--octave 50] [--rounds 5]
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


def _bg_arr():
    toks = F.split(F.col("text"), " ")
    return F.array_distinct(
        F.transform(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda x, i: F.concat_ws(" ", x, F.element_at(toks, i + 2)),
        )
    )


def novelty_join(d: DataFrame) -> DataFrame:
    big = d.select("doc_id", F.explode(_bg_arr()).alias("bg"))
    first_seen = big.groupBy("bg").agg(F.min("doc_id").alias("first_doc"))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("int")
    return (
        big.join(first_seen, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            (F.sum(novel) * 1.0 / F.count(F.lit(1))).alias("novelty"),
        )
    )


def novelty_window(d: DataFrame) -> DataFrame:
    big = d.select("doc_id", F.explode(_bg_arr()).alias("bg"))
    fd = big.select(
        "doc_id", F.min("doc_id").over(Window.partitionBy("bg")).alias("first_doc")
    )
    novel = (F.col("first_doc") == F.col("doc_id")).cast("int")
    return fd.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(novel).cast("bigint").alias("n_novel"),
        (F.sum(novel) * 1.0 / F.count(F.lit(1))).alias("novelty"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--octave", type=int, default=50, choices=[10, 50])
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    n_docs, fam = _OCTAVES[args.octave]
    corpus = os.path.join(_REPO, "spark-warehouse", f"collapse_probe_{args.octave}x")

    spark = get_spark("novelty-probe")
    if not os.path.exists(f"{corpus}/documents.parquet"):
        _gen(spark, corpus, n_docs, fam)

    for eq_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1", corpus):
        _session._TABLE_CACHE.clear()
        d = load_table(spark, eq_dir, "documents")
        ra = sorted(tuple(r) for r in novelty_join(d).collect())
        rb = sorted(tuple(r) for r in novelty_window(d).collect())
        assert ra == rb, f"variants disagree at {eq_dir}"
        print(f"equality OK at {eq_dir}: {len(ra)} rows", flush=True)

    for tdir in ("/root/testdata/sf0.1", corpus):
        _session._TABLE_CACHE.clear()
        d = load_table(spark, tdir, "documents")

        def run(fn):
            fn(d).write.mode("overwrite").format("noop").save()

        run(novelty_join)
        run(novelty_window)
        ta, tb = [], []
        for i in range(args.rounds):
            for label, fn, sink in (
                ("A/join", novelty_join, ta),
                ("B/window", novelty_window, tb),
            ):
                t0 = time.perf_counter()
                run(fn)
                dt = time.perf_counter() - t0
                sink.append(dt)
                print(f"[{tdir}] round {i} {label}: {dt:6.2f}s", flush=True)
        ma, mb = statistics.median(ta), statistics.median(tb)
        print(
            f"[{tdir}] A(join) median {ma:.2f}s  B(window) median {mb:.2f}s  "
            f"delta {100 * (mb - ma) / ma:+.1f}%",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
