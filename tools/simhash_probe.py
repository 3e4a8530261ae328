"""Round-14 probe (guide §2.3/§2.4): `llm_dedup_simhash`'s 16-bit
fingerprint — map-only higher-order-function form (shipped through r13)
vs explode → two-phase groupBy (the form `llm_dedup_simhash_hamming`
already uses for its 64-bit fingerprint, with an in-repo measurement:
"the map-only form costs 64 array scans per doc — measured 27 s at
sf0.1").

Why the HOF form loses despite zero shuffles (the r13 sig_probe lesson,
same mechanism): `transform`/`aggregate` are CodegenFallback — evaluated
interpreted, per element, per bit — so the 16 `F.aggregate` calls
re-walk the md5-transform array 16 times per document. The exploded form
hashes each token ONCE inside whole-stage codegen and the 16 bit-count
sums partial-aggregate map-side, so the exchange carries one 17-int row
per doc (linear at 100 TB; a doc's exploded tokens never span
partitions, so partial aggregation collapses them before the wire).

Equality gate: fingerprints identical doc-for-doc on sf0.01, sf0.1, the
template-octave corpus AND a hand-built edge corpus (NULL text, empty
string, single token, repeated tokens, long doc) — explode_outer keeps
the NULL-text doc on a NULL token so the majority vote degrades to
fingerprint 0 exactly like the HOF form (aggregate over a NULL array).

    python tools/simhash_probe.py [--octave 10] [--rounds 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from backup_repo_spark.session import get_spark, load_table  # noqa: E402
import backup_repo_spark.session as _session  # noqa: E402
from tools.template_scale_probe import _gen, _OCTAVES  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def simhash16_hof(d: DataFrame) -> DataFrame:
    """The pre-r14 map-only form, verbatim (reference arm): 16 interpreted
    F.aggregate passes over the per-token md5 transform array."""
    toks = F.split(F.col("text"), " ")
    hashes = F.transform(
        toks,
        lambda x: F.conv(F.substring(F.md5(x), 1, 4), 16, 10).cast("int"),
    )
    bits = [
        F.when(
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("int"),
            )
            * 2
            > F.size(toks),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        for b in range(16)
    ]
    fp = sum((bits[b] * F.lit(1 << b) for b in range(16)), start=F.lit(0))
    return d.select("doc_id", fp.alias("simhash16"))


def simhash16_exploded(d: DataFrame) -> DataFrame:
    """The r14 exploded two-phase form (shipped), inlined here so the
    probe measures the mechanism even if the engine moves on."""
    toks = F.split(F.col("text"), " ")
    ex = d.select(
        "doc_id", F.size(toks).alias("_nt"), F.explode_outer(toks).alias("_tok")
    )
    h = F.conv(F.substring(F.md5("_tok"), 1, 4), 16, 10).cast("int")
    ones = ex.groupBy("doc_id").agg(
        F.max("_nt").alias("_nt"),
        *[
            F.sum(F.shiftright(h, b).bitwiseAND(F.lit(1))).alias(f"_o{b}")
            for b in range(16)
        ],
    )
    fp = sum(
        (
            F.when(F.col(f"_o{b}") * 2 > F.col("_nt"), F.lit(1 << b))
            .otherwise(F.lit(0))
            .cast("long")
            for b in range(16)
        ),
        start=F.lit(0),
    )
    return ones.select("doc_id", fp.alias("simhash16"))


def _edge_corpus(spark) -> DataFrame:
    rows = [
        (1, None),                       # NULL text
        (2, ""),                         # empty string -> one empty token
        (3, "solo"),                     # single token
        (4, "a a a b"),                  # repeated tokens (majority weight)
        (5, " leading  double  spaces"),  # empty tokens inside
        (6, "x " * 500 + "y"),           # long doc
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--octave", type=int, default=10, choices=[10, 50])
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    n_docs, fam = _OCTAVES[args.octave]
    corpus = os.path.join(_REPO, "spark-warehouse", f"collapse_probe_{args.octave}x")

    spark = get_spark("simhash-probe")
    if not os.path.exists(f"{corpus}/documents.parquet"):
        _gen(spark, corpus, n_docs, fam)

    # --- equality gates -----------------------------------------------------
    for label, d in [
        ("edge corpus", _edge_corpus(spark)),
        ("sf0.01", load_table(spark, "/root/testdata/sf0.01", "documents")),
        ("sf0.1", load_table(spark, "/root/testdata/sf0.1", "documents")),
        (f"{args.octave}x", load_table(spark, corpus, "documents")),
    ]:
        a = dict(simhash16_hof(d).collect())
        b = dict(simhash16_exploded(d).collect())
        assert a == b, (
            f"fingerprints disagree on {label}: "
            f"{[(k, a[k], b.get(k)) for k in a if a[k] != b.get(k)][:5]}"
        )
        print(f"equality OK on {label}: {len(a)} docs", flush=True)
        _session._TABLE_CACHE.clear()

    # --- interleaved timing (noop sink, full key shape: fp -> group) --------
    d = load_table(spark, corpus, "documents")

    def run(form) -> float:
        q = (
            form(d)
            .groupBy("simhash16")
            .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
        )
        t0 = time.perf_counter()
        q.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run(simhash16_hof)
    run(simhash16_exploded)  # warm
    ta, tb = [], []
    for i in range(args.rounds):
        for label, form, sink in (
            ("A/hof", simhash16_hof, ta),
            ("B/exploded", simhash16_exploded, tb),
        ):
            dt = run(form)
            sink.append(dt)
            print(f"round {i} {label}: {dt:6.2f}s", flush=True)
    ma, mb = statistics.median(ta), statistics.median(tb)
    print(
        f"A(hof) median {ma:.2f}s  B(exploded) median {mb:.2f}s  "
        f"delta {100.0 * (mb - ma) / ma:+.1f}%"
    )
    spark.stop()


if __name__ == "__main__":
    main()
