"""Round-14 optimization probe (guide §2.4): llm_tfidf's df join-back.

Variant A (shipped through r13): token explode consumed twice — tf =
groupBy(doc_id, token) and df = groupBy(token) countDistinct(doc_id)
(internally a second (token, doc_id) aggregate, i.e. tf's work redone) —
then df equi-joined back onto tf.

Variant B (r14): tf has exactly one row per (doc_id, token), so
``count(*) OVER (PARTITION BY token)`` on tf IS countDistinct(doc_id)
per token. One Generate, one aggregate, no join.

Equality asserted exactly, then interleaved timing at sf0.1 and the
octave corpus at the noop sink.

    python tools/tfidf_probe.py [--octave 50] [--rounds 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from backup_repo_spark.session import get_spark, load_table  # noqa: E402
import backup_repo_spark.session as _session  # noqa: E402
from tools.template_scale_probe import _gen, _OCTAVES  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tfidf_join(d: DataFrame) -> DataFrame:
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.count()
    scored = tf.join(df, "token").select(
        "doc_id",
        "token",
        (F.col("tf") * (F.log((n + 1.0) / (F.col("df") + 1.0)) + 1.0)).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "token", F.round("tfidf", 4).alias("tfidf"))
    )


def tfidf_window(d: DataFrame) -> DataFrame:
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    n = d.count()
    scored = tf.select(
        "doc_id",
        "token",
        (
            F.col("tf")
            * (
                F.log(
                    (n + 1.0)
                    / (F.count(F.lit(1)).over(Window.partitionBy("token")) + 1.0)
                )
                + 1.0
            )
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "token", F.round("tfidf", 4).alias("tfidf"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--octave", type=int, default=50, choices=[10, 50])
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    n_docs, fam = _OCTAVES[args.octave]
    corpus = os.path.join(_REPO, "spark-warehouse", f"collapse_probe_{args.octave}x")

    spark = get_spark("tfidf-probe")
    if not os.path.exists(f"{corpus}/documents.parquet"):
        _gen(spark, corpus, n_docs, fam)

    for eq_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1", corpus):
        _session._TABLE_CACHE.clear()
        d = load_table(spark, eq_dir, "documents")
        ra = sorted(tuple(r) for r in tfidf_join(d).collect())
        rb = sorted(tuple(r) for r in tfidf_window(d).collect())
        assert ra == rb, f"variants disagree at {eq_dir}"
        print(f"equality OK at {eq_dir}: {len(ra)} rows", flush=True)

    for tdir in ("/root/testdata/sf0.1", corpus):
        _session._TABLE_CACHE.clear()
        d = load_table(spark, tdir, "documents")

        def run(fn):
            fn(d).write.mode("overwrite").format("noop").save()

        run(tfidf_join)
        run(tfidf_window)
        ta, tb = [], []
        for i in range(args.rounds):
            for label, fn, sink in (
                ("A/join", tfidf_join, ta),
                ("B/window", tfidf_window, tb),
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
