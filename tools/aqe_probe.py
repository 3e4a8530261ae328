"""Round-13 optimization probe (OPTIMIZATION_r13.md "Not yet optimized"
item 1, guide §2.2/§9): does the AQE-on profile's per-exchange stage
barrier amortize at the 50x fixture, and does the scale-adaptive shape
(overprovision shuffle partitions, let AQE coalesce to the advisory
size) beat the pinned-32 sweep profile?

Three fresh-session arms, interleaved (AQE flags are session-build
confs for this purpose — the plan shape must differ from the first
exchange):

  A  adaptive=False, shuffle.partitions=32   (barrier-free control)
  B  adaptive=True,  shuffle.partitions=32   (shipped sweep profile)
  C  adaptive=True,  shuffle.partitions=256, advisory 64 MB
     (the 100 TB shape: partitions derived by AQE from bytes, not a
      hand-pinned constant)

Workload: the banded dedup pair pipeline at the 50x template corpus —
the registry's largest genuine shuffle mass (~1.2 GB lz4 shuffle
write). Medians over N rounds carry the verdict.

    python tools/aqe_probe.py [--octave 50] [--rounds 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from backup_repo_spark.llm import dedup as D  # noqa: E402
from backup_repo_spark.session import load_table  # noqa: E402
import backup_repo_spark.session as _session  # noqa: E402
from tools.template_scale_probe import _gen, _OCTAVES  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARMS = {
    "A/noaqe32": {"spark.sql.adaptive.enabled": "false",
                  "spark.sql.shuffle.partitions": "32"},
    "B/aqe32": {"spark.sql.adaptive.enabled": "true",
                "spark.sql.shuffle.partitions": "32"},
    "C/aqe256adv": {"spark.sql.adaptive.enabled": "true",
                    "spark.sql.shuffle.partitions": "256",
                    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m"},
}


def _spark(confs: dict) -> SparkSession:
    b = (
        SparkSession.builder.appName("aqe-probe")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in confs.items():
        b = b.config(k, v)
    return b.getOrCreate()


def pipeline(spark: SparkSession, sf_dir: str) -> None:
    _session._TABLE_CACHE.clear()
    d = load_table(spark, sf_dir, "documents")
    mem, repdocs = D._collapse(d)
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
    D._jaccard_verify(cand, repdocs).write.mode("overwrite").format("noop").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--octave", type=int, default=50, choices=[10, 50, 250])
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    n_docs, fam = _OCTAVES[args.octave]
    corpus = os.path.join(_REPO, "spark-warehouse", f"collapse_probe_{args.octave}x")

    times: dict[str, list[float]] = {k: [] for k in ARMS}
    for i in range(args.rounds):
        for arm, confs in ARMS.items():
            spark = _spark(confs)
            if not os.path.exists(f"{corpus}/documents.parquet"):
                _gen(spark, corpus, n_docs, fam)
            pipeline(spark, corpus)  # warm
            t0 = time.perf_counter()
            pipeline(spark, corpus)
            dt = time.perf_counter() - t0
            times[arm].append(dt)
            print(f"round {i} {arm}: {dt:6.2f}s", flush=True)
            spark.stop()

    meds = {arm: statistics.median(v) for arm, v in times.items()}
    base = meds["A/noaqe32"]
    for arm, m in meds.items():
        print(f"{arm}: median {m:.2f}s ({100 * (m - base) / base:+.1f}% vs A)",
              flush=True)


if __name__ == "__main__":
    main()
