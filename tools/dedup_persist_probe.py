"""Round-13 optimization probe: does a scoped persist of the shared
shingle relation (consumed 4-6x per dedup key) beat recomputation?

Interleaved A/B inside one session (the only valid protocol on a noisy
box): variant A = the shipped pipeline, variant B = same pipeline with
`shingles` persisted before the consumers and unpersisted after the
pair materialization. N alternations, medians carry the verdict.

    python tools/dedup_persist_probe.py [--sf sf0.1] [--rounds 5]
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


def banded_pairs(d, persist: bool):
    """Replicates _banded_rep_pairs + expansion trigger (localCheckpoint)."""
    mem, repdocs = D._collapse(d)
    shingles = D._shingles3(repdocs)
    if persist:
        shingles = shingles.persist()
    bands = D._bands42(D._sig8(shingles))
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, cond)
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    rep_pairs = D._jaccard_verify(cand, repdocs).select(
        "da", "db", F.round("jaccard", 4).alias("jaccard")
    )
    cp = rep_pairs.localCheckpoint()  # materializes the verify DAG
    n = cp.count()
    if persist:
        shingles.unpersist(False)
    cp.unpersist()  # drop the checkpoint blocks between rounds
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.1", help="sfX.Y name or absolute dir")
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    sf_dir = args.sf if args.sf.startswith("/") else f"/root/testdata/{args.sf}"
    spark = get_spark("dedup-persist-probe", shuffle_partitions=8, adaptive=False)
    d = load_table(spark, sf_dir, "documents")
    # warm both variants once
    banded_pairs(d, False)
    banded_pairs(d, True)
    ta, tb = [], []
    for i in range(args.rounds):
        for label, persist, sink in (("A/nop", False, ta), ("B/per", True, tb)):
            t0 = time.perf_counter()
            n = banded_pairs(d, persist)
            dt = time.perf_counter() - t0
            sink.append(dt)
            print(f"round {i} {label}: {dt:6.2f}s  (pairs={n})", flush=True)
    ma, mb = statistics.median(ta), statistics.median(tb)
    print(
        f"A(no-persist) median {ma:.2f}s  B(persist) median {mb:.2f}s  "
        f"delta {100 * (mb - ma) / ma:+.1f}%"
    )
    spark.stop()


if __name__ == "__main__":
    main()
