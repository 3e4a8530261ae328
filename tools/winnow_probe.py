"""Round-14 probe (guide §2.3/§2.4): `llm_winnowing`'s trigram-hash stage
— interpreted `F.transform` lambda (shipped through r13) vs trigram
formation on the window pass the sliding min already pays for
(posexplode once, `lead(tok, 1..2)` over the shared (doc_id, i0) window,
md5 under whole-stage codegen in the projection above it).

Same CodegenFallback mechanism as llm_dedup_simhash (simhash_probe):
higher-order functions evaluate interpreted per element. Here the win is
that the rewrite's exchange+sort is NOT an added cost — the downstream
`min OVER (PARTITION BY doc_id ORDER BY i0 ROWS 0..3)` required exactly
that partitioning and sort already, so both window groups share one
WindowExec input.

r14 measurements at the 10x template corpus (noop sink, interleaved):
  kg stage alone:  2.32 s -> 0.54 s median (-77%)
  full key:        2.65 s -> 0.88 s median (-67%)
Rows identical (sorted-tuple compare) at sf0.01 and 10x, both stages.

    python tools/winnow_probe.py [--octave 10] [--rounds 5]
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

from backup_repo_spark import registry  # noqa: E402
from backup_repo_spark.session import get_spark, load_table  # noqa: E402
import backup_repo_spark.session as _session  # noqa: E402
from tools.template_scale_probe import _gen, _OCTAVES  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def winnowing_hof(spark, sf_dir: str) -> DataFrame:
    """The pre-r14 form, verbatim (reference arm): trigram hashes built by
    an interpreted transform lambda over the token array."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    tri = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda x, i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ", x, F.element_at(toks, i + 2), F.element_at(toks, i + 3)
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
    )
    kg = d.select("doc_id", F.posexplode(tri).alias("i0", "h")).select(
        "doc_id", (F.col("i0") + 1).alias("i"), "h"
    )
    w_min = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, 3)
    w_cnt = Window.partitionBy("doc_id")
    win = kg.select(
        "doc_id",
        "i",
        F.min("h").over(w_min).alias("fp"),
        F.count(F.lit(1)).over(w_cnt).alias("n_kg"),
    )
    fps = win.filter(F.col("i") + 3 <= F.col("n_kg")).select("doc_id", "fp").distinct()
    return (
        fps.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_fp"),
            F.sum("fp").cast("bigint").alias("fp_sum"),
            F.min("fp").cast("bigint").alias("fp_min"),
        )
        .orderBy("doc_id")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--octave", type=int, default=10, choices=[10, 50])
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    n_docs, fam = _OCTAVES[args.octave]
    corpus = os.path.join(_REPO, "spark-warehouse", f"collapse_probe_{args.octave}x")

    spark = get_spark("winnow-probe")
    if not os.path.exists(f"{corpus}/documents.parquet"):
        _gen(spark, corpus, n_docs, fam)

    new_fn = registry.QUERIES["llm_winnowing"]
    for dir_ in ("/root/testdata/sf0.01", corpus):
        _session._TABLE_CACHE.clear()
        a = sorted(map(tuple, winnowing_hof(spark, dir_).collect()))
        b = sorted(map(tuple, new_fn(spark, dir_).collect()))
        assert a == b, f"winnowing variants disagree at {dir_}"
        print(f"equality OK at {dir_}: {len(a)} docs", flush=True)

    _session._TABLE_CACHE.clear()

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, corpus).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run(winnowing_hof)
    run(new_fn)  # warm
    ta, tb = [], []
    for i in range(args.rounds):
        for label, fn, sink in (("A/hof", winnowing_hof, ta), ("B/lead", new_fn, tb)):
            dt = run(fn)
            sink.append(dt)
            print(f"round {i} {label}: {dt:6.2f}s", flush=True)
    ma, mb = statistics.median(ta), statistics.median(tb)
    print(
        f"A(hof) median {ma:.2f}s  B(lead) median {mb:.2f}s  "
        f"delta {100.0 * (mb - ma) / ma:+.1f}%"
    )
    spark.stop()


if __name__ == "__main__":
    main()
