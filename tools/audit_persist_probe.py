"""Round-13 probe for the KEPT scoped persists (small-output /
expensive-lineage relations), after the shingle-mass persist was measured
a regression and rejected (tools/dedup_persist_probe.py):

- lsh_eval shape: `tp` (quadratic exact-truth pairs) and `cand` (band
  self-join output) are each consumed twice — persist vs recompute.
- incremental shape: `bands` feeds the ib/bb side filters whose differing
  pushed predicates defeat exchange reuse — persist vs recompute.

Interleaved A/B in one session; medians carry the verdict.

    python tools/audit_persist_probe.py [--sf sf0.1|/abs/dir] [--rounds 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from backup_repo_spark.llm import dedup as D  # noqa: E402
from backup_repo_spark.session import get_spark, load_table  # noqa: E402


def lsh_eval_run(d, persist: bool) -> tuple:
    shingles = D._shingles3(d)
    tp = D._exact_pairs(shingles, 0.5).select("da", "db")
    bands = D._bands42(D._sig8(shingles))
    ba, bb = bands.alias("ba"), bands.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.bkey") == F.col("bb.bkey"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(F.col("ba.doc_id").alias("da"), F.col("bb.doc_id").alias("db"))
        .distinct()
    )
    if persist:
        tp, cand = tp.persist(), cand.persist()
    n_true = tp.agg(F.count(F.lit(1)).alias("n_true"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    n_hit = cand.join(tp, ["da", "db"]).agg(F.count(F.lit(1)).alias("n_hit"))
    row = n_true.crossJoin(n_cand).crossJoin(n_hit).collect()[0]
    if persist:
        tp.unpersist(False)
        cand.unpersist(False)
    return tuple(row)


def incremental_run(d, persist: bool) -> int:
    base = d.filter(F.col("doc_id") < 400)
    inc = d.filter(F.col("doc_id") >= 400)
    _, base_reps = D._collapse(base)
    _, inc_reps = D._collapse(inc)
    repdocs = base_reps.unionByName(inc_reps)
    shingles = D._shingles3(repdocs)
    bands = D._bands42(D._sig8(shingles))
    if persist:
        bands = bands.persist()
    ib = bands.filter(F.col("doc_id") >= 400).alias("ib")
    bb = bands.filter(F.col("doc_id") < 400).alias("bb")
    cand = (
        ib.join(bb, [F.col("ib.band") == F.col("bb.band"), F.col("ib.bkey") == F.col("bb.bkey")])
        .select(F.col("ib.doc_id").alias("da"), F.col("bb.doc_id").alias("db"))
        .distinct()
    )
    n = D._jaccard_verify(cand, repdocs).count()
    if persist:
        bands.unpersist(False)
    return n


SHAPES = {"lsh_eval": lsh_eval_run, "incremental": incremental_run}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.1")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--shape", choices=[*SHAPES, "all"], default="all")
    args = ap.parse_args()
    sf_dir = args.sf if args.sf.startswith("/") else f"/root/testdata/{args.sf}"
    spark = get_spark("audit-persist-probe", shuffle_partitions=8, adaptive=False)
    d = load_table(spark, sf_dir, "documents")
    shapes = list(SHAPES) if args.shape == "all" else [args.shape]
    for shape in shapes:
        fn = SHAPES[shape]
        fn(d, False)
        fn(d, True)  # warm both
        ta, tb = [], []
        for i in range(args.rounds):
            for label, persist, sink in (("A/nop", False, ta), ("B/per", True, tb)):
                t0 = time.perf_counter()
                r = fn(d, persist)
                dt = time.perf_counter() - t0
                sink.append(dt)
                print(f"{shape} round {i} {label}: {dt:6.2f}s  ({r})", flush=True)
        ma, mb = statistics.median(ta), statistics.median(tb)
        print(
            f"== {shape}: A median {ma:.2f}s  B(persist) median {mb:.2f}s  "
            f"delta {100 * (mb - ma) / ma:+.1f}%"
        )
    spark.stop()


if __name__ == "__main__":
    main()
