"""Round-13 optimization probe (OPTIMIZATION_r13.md "Not yet optimized"
shuffle-codec item, guide §2.3): lz4 (Spark default) vs zstd for
``spark.io.compression.codec``, measured at the BYTE level.

Wall time cannot adjudicate a codec on this box (noise floor wider than
any plausible delta), but shuffle bytes written are deterministic for a
deterministic pipeline and executor CPU is far tighter than wall — both
come from the UI REST API (/stages), the same instrument as
skew_stress/ntile_skew_stress. The codec is a session-build conf, so
variants alternate FRESH sessions (A,B,A,B), interleaved for fairness.

Workloads: the banded dedup pair pipeline at the 50x template corpus
(the registry's biggest genuine shuffle mass — text shingles), and the
two shuffle-heaviest headline shapes at sf0.1.

    python tools/codec_probe.py [--octave 50] [--rounds 2]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from backup_repo_spark import registry  # noqa: E402
from backup_repo_spark.llm import dedup as D  # noqa: E402
from backup_repo_spark.session import load_table  # noqa: E402
import backup_repo_spark.session as _session  # noqa: E402
from tools.template_scale_probe import _gen, _OCTAVES  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_UI_PORT = 4047


def _spark(codec: str) -> SparkSession:
    return (
        SparkSession.builder.appName(f"codec-probe-{codec}")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.io.compression.codec", codec)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(_UI_PORT))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def _rest(spark: SparkSession, path: str):
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:{_UI_PORT}/api/v1/applications/{app_id}{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def _stage_watermark(spark: SparkSession) -> int:
    stages = _rest(spark, "/stages")
    return max((s["stageId"] for s in stages), default=-1)


def _metrics_since(spark: SparkSession, since: int) -> dict:
    stages = [
        s
        for s in _rest(spark, "/stages?status=complete")
        if s["stageId"] > since
    ]
    return {
        "shuffle_write_mb": sum(s["shuffleWriteBytes"] for s in stages) / 2**20,
        "shuffle_read_mb": sum(s["shuffleReadBytes"] for s in stages) / 2**20,
        "cpu_s": sum(s["executorCpuTime"] for s in stages) / 1e9,
        "stages": len(stages),
    }


def banded_pipeline(spark: SparkSession, sf_dir: str) -> None:
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
    D._jaccard_verify(cand, repdocs).write.mode("overwrite").format(
        "noop"
    ).save()


def headline(spark: SparkSession, sf_dir: str) -> None:
    for key in ("join_star_5way", "agg_distinct"):
        registry.QUERIES[key](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--octave", type=int, default=50, choices=[10, 50, 250])
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()
    n_docs, fam = _OCTAVES[args.octave]
    corpus = os.path.join(_REPO, "spark-warehouse", f"collapse_probe_{args.octave}x")

    results: dict[str, dict[str, list]] = {}
    for i in range(args.rounds):
        for codec in ("lz4", "zstd"):
            spark = _spark(codec)
            if not os.path.exists(f"{corpus}/documents.parquet"):
                _gen(spark, corpus, n_docs, fam)
            for wl, fn, sf in (
                ("dedup50x", banded_pipeline, corpus),
                ("headline", headline, "/root/testdata/sf0.1"),
            ):
                _session._TABLE_CACHE.clear()
                fn(spark, sf)  # warm (scan cache, codegen)
                _session._TABLE_CACHE.clear()
                wm = _stage_watermark(spark)
                t0 = time.perf_counter()
                fn(spark, sf)
                wall = time.perf_counter() - t0
                m = _metrics_since(spark, wm)
                m["wall_s"] = wall
                results.setdefault(wl, {}).setdefault(codec, []).append(m)
                print(
                    f"round {i} {codec:4s} {wl}: write {m['shuffle_write_mb']:8.2f} MB"
                    f"  read {m['shuffle_read_mb']:8.2f} MB  cpu {m['cpu_s']:6.1f}s"
                    f"  wall {wall:6.2f}s  ({m['stages']} stages)",
                    flush=True,
                )
            spark.stop()

    for wl, by_codec in results.items():
        la, zb = by_codec["lz4"], by_codec["zstd"]
        wa = statistics.median(x["shuffle_write_mb"] for x in la)
        wb = statistics.median(x["shuffle_write_mb"] for x in zb)
        ca = statistics.median(x["cpu_s"] for x in la)
        cb = statistics.median(x["cpu_s"] for x in zb)
        print(
            f"{wl}: shuffle-write lz4 {wa:.2f} MB -> zstd {wb:.2f} MB "
            f"({100 * (wb - wa) / wa:+.1f}%); cpu lz4 {ca:.1f}s -> zstd {cb:.1f}s "
            f"({100 * (cb - ca) / ca:+.1f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
