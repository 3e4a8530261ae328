"""Round-13 optimization probe (OPTIMIZATION_r13.md "Not yet optimized"
item 2): can `_collapse`'s groupBy+join-back fold into a single
partition-only window pass?

Current shipped form (dedup.py:129): groupBy(th){min,count} + equi-join
back on th — two th-keyed exchanges (the pre-aggregated groups and the
raw (doc_id, th) rows; their subtrees differ above the exchange, so
ReusedExchange does NOT merge them). Candidate form: one window
partitionBy(th) over the narrow (doc_id, th) projection — one exchange
plus a within-partition sort, and `repdocs`' representative list falls
out of the same window output (doc_id == rep) instead of a join.

Semantics replicated exactly (NULL-text invariant, ADVICE r10):
- `mem` excludes NULL-th rows (the shipped equi-join drops them; the
  window form must filter explicitly — partitionBy groups NULLs).
- `repdocs` DOES include the NULL-th group's min-doc_id representative
  (the shipped groupBy keeps the NULL group and its rep survives the
  doc_id join). The window form keeps it by filtering doc_id == rep
  BEFORE the null filter.
The probe asserts both result sets identical before timing.

Interleaved A/B inside one session, two corpus shapes (mostly-unique =
worst case for partial aggregation; heavy-dup = where collapse matters),
two workloads (collapse sub-DAG alone at the noop sink; the full banded
pair pipeline it fronts). Medians carry the verdict.

    python tools/collapse_probe.py [--octave 50] [--rounds 4] [--dups]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from backup_repo_spark.llm import dedup as D  # noqa: E402
from backup_repo_spark.session import get_spark, load_table  # noqa: E402
from tools.template_scale_probe import _gen  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collapse_window(d: DataFrame):
    """Candidate single-window form of dedup._collapse (see module doc)."""
    w = Window.partitionBy("th")
    lab = d.select("doc_id", F.md5("text").alias("th")).select(
        "doc_id",
        "th",
        F.min("doc_id").over(w).alias("rep"),
        F.count(F.lit(1)).over(w).alias("gsize"),
    )
    mem = lab.filter(F.col("th").isNotNull()).select("doc_id", "rep", "gsize")
    repdocs = d.join(
        lab.filter(F.col("doc_id") == F.col("rep")).select("doc_id"), "doc_id"
    )
    return mem, repdocs


def assert_equivalent(d: DataFrame) -> None:
    am, ar = D._collapse(d)
    bm, br = collapse_window(d)
    ra = sorted(tuple(r) for r in am.collect())
    rb = sorted(tuple(r) for r in bm.collect())
    assert ra == rb, "mem mismatch"
    ia = sorted(r.doc_id for r in ar.select("doc_id").collect())
    ib = sorted(r.doc_id for r in br.select("doc_id").collect())
    assert ia == ib, "repdocs mismatch"


def add_exact_dups(d: DataFrame, n_docs: int) -> DataFrame:
    """Heavy-dup shape: append one exact copy of every 3rd doc and three
    copies of every 50th (group sizes 2 and 5), hash-deterministic ids."""
    dup1 = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 10 * n_docs).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    dup3 = (
        d.filter(F.col("doc_id") % 50 == 0)
        .crossJoin(F.broadcast(d.sparkSession.range(3).select(F.col("id").alias("k"))))
        .select(
            (F.col("doc_id") + (20 + F.col("k")) * n_docs).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
    )
    return d.unionByName(dup1).unionByName(dup3)


def collapse_only(d: DataFrame, fn) -> None:
    mem, repdocs = fn(d)
    mem.write.mode("overwrite").format("noop").save()
    repdocs.write.mode("overwrite").format("noop").save()


def banded_pipeline(d: DataFrame, fn) -> int:
    """The banded pair pipeline _collapse fronts (same shape as
    dedup_persist_probe.banded_pairs, collapse form injected)."""
    mem, repdocs = fn(d)
    shingles = D._shingles3(repdocs)
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
    cp = rep_pairs.localCheckpoint()
    n = cp.count() + mem.count()  # both consumers, like the shipped keys
    cp.unpersist()
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--octave", type=int, default=50, choices=[10, 50, 250])
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--dups", action="store_true", help="add exact-dup mass")
    args = ap.parse_args()

    from tools.template_scale_probe import _OCTAVES

    n_docs, fam = _OCTAVES[args.octave]
    out = os.path.join(
        _REPO, "spark-warehouse", f"collapse_probe_{args.octave}x"
    )
    spark = get_spark("collapse-probe", shuffle_partitions=8, adaptive=False)
    if not os.path.exists(f"{out}/documents.parquet"):
        _gen(spark, out, n_docs, fam)
    d = load_table(spark, out, "documents")
    if args.dups:
        d = add_exact_dups(d, n_docs + fam)

    # equivalence first, on the small testdata corpus (has NULL-free text
    # but real group structure) AND the probe corpus
    assert_equivalent(load_table(spark, "/root/testdata/sf0.01", "documents"))
    print("equivalence ok (sf0.01)", flush=True)

    for label, work in (("collapse-only", collapse_only), ("pipeline", banded_pipeline)):
        # warm both variants
        work(d, D._collapse)
        work(d, collapse_window)
        ta, tb = [], []
        for i in range(args.rounds):
            for vlabel, fn, sink in (
                ("A/grpjoin", D._collapse, ta),
                ("B/window", collapse_window, tb),
            ):
                t0 = time.perf_counter()
                work(d, fn)
                dt = time.perf_counter() - t0
                sink.append(dt)
                print(f"{label} round {i} {vlabel}: {dt:6.2f}s", flush=True)
        ma, mb = statistics.median(ta), statistics.median(tb)
        print(
            f"{label}: A(grp+join) median {ma:.2f}s  B(window) median {mb:.2f}s  "
            f"delta {100 * (mb - ma) / ma:+.1f}%",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
