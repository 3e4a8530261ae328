"""Round-13 optimization probe (guide §2.4): min-label propagation's
convergence check — re-join new labels against old labels (pre-r13) vs
a change flag computed inline and counted off the checkpoint blocks
(shipped). One join and two exchanges fewer per iteration; labels are
byte-identical (the flag is `nmin < old label`, exactly the rows the
old join's `n.label < o.label` filter kept).

The pair graph is built once (banded verified pairs at the octave
corpus, localCheckpoint'ed) so the probe times ONLY the propagation
loop, interleaved A/B, medians carry the verdict.

    python tools/cc_probe.py [--octave 50] [--rounds 5]
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
from tools.template_scale_probe import _gen, _OCTAVES  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def labels_rejoin(pairs: DataFrame) -> DataFrame:
    """The pre-r13 `_component_labels` loop (variant A), verbatim."""
    pairs = pairs.select("da", "db")
    edges = (
        pairs.union(pairs.select(F.col("db"), F.col("da")))
        .toDF("u", "v")
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    while True:
        neigh_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy(edges.u)
            .agg(F.min("label").alias("nmin"))
        )
        updated = (
            labels.join(neigh_min, labels.node == neigh_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nmin", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") < F.col("o.label"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--octave", type=int, default=50, choices=[10, 50, 250])
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    n_docs, fam = _OCTAVES[args.octave]
    corpus = os.path.join(_REPO, "spark-warehouse", f"collapse_probe_{args.octave}x")

    spark = get_spark("cc-probe")
    if not os.path.exists(f"{corpus}/documents.parquet"):
        _gen(spark, corpus, n_docs, fam)

    d = load_table(spark, corpus, "documents")
    _, rep_pairs, _ = D._banded_rep_pairs(d)
    pairs = rep_pairs.select("da", "db").localCheckpoint()
    print(f"pair graph: {pairs.count()} edges", flush=True)

    rows_a = {(r.node, r.label) for r in labels_rejoin(pairs).collect()}
    rows_b = {(r.node, r.label) for r in D._component_labels(pairs).collect()}
    assert rows_a == rows_b, "label sets diverge"
    print(f"equality OK: {len(rows_a)} labeled nodes", flush=True)

    def run_a():
        labels_rejoin(pairs).write.mode("overwrite").format("noop").save()

    def run_b():
        D._component_labels(pairs).write.mode("overwrite").format("noop").save()

    run_a()
    run_b()
    ta, tb = [], []
    for i in range(args.rounds):
        for label, fn, sink in (("A/rejoin", run_a, ta), ("B/flag", run_b, tb)):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            sink.append(dt)
            print(f"round {i} {label}: {dt:6.2f}s", flush=True)
    ma, mb = statistics.median(ta), statistics.median(tb)
    print(
        f"A(rejoin) median {ma:.2f}s  B(flag) median {mb:.2f}s  "
        f"delta {100 * (mb - ma) / ma:+.1f}%"
    )
    spark.stop()


if __name__ == "__main__":
    main()
