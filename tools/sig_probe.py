"""Round-13 optimization probe (guide §2.4): the 8-hash MinHash signature
stage — exploded-groupBy form (SHIPPED) vs a map-side array form
(measured and REJECTED; this file keeps the rejected variant as the
standing A/B harness and equality witness).

Variant A — the shipped `_sig8(_shingles3(docs))`: explode every doc into
its DISTINCT 3-shingle rows, hash-aggregate 8 min(md5(...)) per doc.
Whole-stage-codegen'd; partial aggregation reduces the exploded mass to
one row per doc per map partition before the doc-cardinality Exchange.

Variant B — map-side `sig8_arr(docs)`: the distinct shingle set already
exists map-side as `_shingle3_arr`, so each signature column is
array_min(transform(arr, s -> md5(salt || s))) inside one projection.
No explode, no Exchange, no aggregate — superficially the guide-§2.4
ideal ("the per-doc minimum never leaves its row").

Measured verdict (50x template octave, interleaved, noop sink, r13):

- full banded pipeline (collapse -> sig -> bands -> candidate self-join
  -> array verify): A median 24.70 s, B median 28.47 s — B **+15.3%**.
  The sig aggregation's Exchange is the ReusedExchange point that lets
  the band self-join read the hashes ONCE; with a map-side sig each
  join side recomputes every md5.
- sig stage alone: A 17.28 s, B 17.77 s (+2.8%); single-consumer keys
  llm_minhash_signature +5.0%, llm_lsh_bucket_stats +13.8% — even with
  no second reader, B loses: higher-order functions (transform /
  array_min / aggregate) are CodegenFallback, interpreted per element,
  while explode + min-aggregate runs whole-stage-codegen'd and its
  Exchange carries only one partially-aggregated row per doc.

Transferable lesson recorded in OPTIMIZATION_r13.md: removing an
Exchange is only a win when the Exchange carries real bytes relative to
the map work above it AND nothing downstream was reusing it; the verify
rewrite (tools/verify_probe.py, -24.7%) removed exchanges of corpus
shingle MASS, this one would remove an exchange of one thin row per doc
at the price of de-codegen-ing the hash loop and de-duplicating nothing.

    python tools/sig_probe.py [--octave 50] [--rounds 5]
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
import backup_repo_spark.session as _session  # noqa: E402
from tools.template_scale_probe import _gen, _OCTAVES  # noqa: E402
from tools.verify_probe import pair_summary  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sig_arr(docs: DataFrame, fams: list[tuple[str, str]]) -> DataFrame:
    """Variant B: map-side MinHash signatures — for each (out_col,
    salt_prefix) in `fams`, out_col = array_min(transform(shingle_arr,
    s -> md5(salt_prefix || s))). Row- and value-identical to the shipped
    groupBy form (same md5 strings, same binary string ordering; the
    >= 3-token pre-filter drops exactly the docs explode() drops — the
    `sig_reps` cutoff proven in `_banded_rep_pairs`). The shingle array
    is aliased in its own projection so CollapseProject keeps it a single
    evaluation; the per-family lambda comes from a closure factory (a
    defaulted second parameter would make F.transform bind it as the
    element INDEX — caught by this probe's equality gate)."""

    def _minhash(pfx: str):
        return lambda s: F.md5(F.concat(F.lit(pfx), s))

    pruned = docs.filter(F.size(F.split("text", " ")) >= 3)
    arred = pruned.select("doc_id", D._shingle3_arr().alias("_sharr"))
    return arred.select(
        "doc_id",
        *[
            F.array_min(F.transform("_sharr", _minhash(pfx))).alias(name)
            for name, pfx in fams
        ],
    )


def sig8_arr(docs: DataFrame) -> DataFrame:
    """Map-side `_sig8` (same b1..b8 salted-md5 family, same rows/values)."""
    return sig_arr(docs, [(f"h{i}", f"b{i}-") for i in range(1, 9)])


def sig8_shipped(docs: DataFrame) -> DataFrame:
    """Variant A: the shipped exploded-groupBy signature."""
    return D._sig8(D._shingles3(docs))


def build(spark, sf_dir: str, variant: str) -> DataFrame:
    """Verified (da, db, jaccard) rep pairs with the signature stage from
    `variant` ('a' = shipped exploded groupBy, 'b' = map-side arrays)."""
    _session._TABLE_CACHE.clear()
    d = load_table(spark, sf_dir, "documents")
    _, repdocs = D._collapse(d)
    sig = sig8_shipped(repdocs) if variant == "a" else sig8_arr(repdocs)
    bands = D._bands42(sig)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    return D._jaccard_verify(cand, repdocs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--octave", type=int, default=50, choices=[10, 50, 250])
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    n_docs, fam = _OCTAVES[args.octave]
    corpus = os.path.join(_REPO, "spark-warehouse", f"collapse_probe_{args.octave}x")

    spark = get_spark("sig-probe")  # scale profile: AQE on, partitions 32
    if not os.path.exists(f"{corpus}/documents.parquet"):
        _gen(spark, corpus, n_docs, fam)

    # --- equality gates (sf0.01 and the octave corpus) ---------------------
    for eq_dir in ("/root/testdata/sf0.01", corpus):
        _session._TABLE_CACHE.clear()
        d = load_table(spark, eq_dir, "documents")
        rows_a = set(map(tuple, sig8_shipped(d).collect()))
        rows_b = set(map(tuple, sig8_arr(d).collect()))
        assert rows_a == rows_b, (
            f"sig variants disagree at {eq_dir}: "
            f"only-A={sorted(rows_a - rows_b)[:3]} only-B={sorted(rows_b - rows_a)[:3]}"
        )
        print(f"sig equality OK at {eq_dir}: {len(rows_a)} docs", flush=True)
        if eq_dir != "/root/testdata/sf0.01":
            # Octave corpora: the verified pair set can exceed
            # spark.driver.maxResultSize (~28M pairs at 250x — ADVICE r13),
            # so the witness is verify_probe's order-insensitive
            # dual-checksum aggregate (count + two unrelated hash sums),
            # which is collect-safe at any pair count.
            sa = pair_summary(build(spark, eq_dir, "a"))
            sb = pair_summary(build(spark, eq_dir, "b"))
            assert sa == sb, f"pipeline pair sets disagree at {eq_dir}: {sa} vs {sb}"
            print(f"pipeline equality (checksum) OK at {eq_dir}: {sa[0]} pairs", flush=True)
            continue
        pairs_a = {
            (r.da, r.db, round(r.jaccard, 4))
            for r in build(spark, eq_dir, "a").collect()
        }
        pairs_b = {
            (r.da, r.db, round(r.jaccard, 4))
            for r in build(spark, eq_dir, "b").collect()
        }
        assert pairs_a == pairs_b, (
            f"pipeline pair sets disagree at {eq_dir}: "
            f"only-A={sorted(pairs_a - pairs_b)[:5]} only-B={sorted(pairs_b - pairs_a)[:5]}"
        )
        print(f"pipeline equality OK at {eq_dir}: {len(pairs_a)} pairs", flush=True)

    # --- interleaved timing at the octave corpus ---------------------------
    _session._TABLE_CACHE.clear()
    d = load_table(spark, corpus, "documents")
    _, repdocs = D._collapse(d)

    def sig_only(variant: str):
        sig = sig8_shipped(repdocs) if variant == "a" else sig8_arr(repdocs)
        sig.write.mode("overwrite").format("noop").save()

    def pipeline(variant: str):
        build(spark, corpus, variant).write.mode("overwrite").format("noop").save()

    for name, fn in (("sig stage alone", sig_only), ("full banded pipeline", pipeline)):
        fn("a")
        fn("b")  # warm both
        ta, tb = [], []
        for i in range(args.rounds):
            for label, sink in (("a", ta), ("b", tb)):
                t0 = time.perf_counter()
                fn(label)
                dt = time.perf_counter() - t0
                sink.append(dt)
                print(f"{name} round {i} {label.upper()}: {dt:6.2f}s", flush=True)
        ma, mb = statistics.median(ta), statistics.median(tb)
        print(
            f"{name}: A(shipped exploded groupBy) median {ma:.2f}s  "
            f"B(map-side arrays) median {mb:.2f}s  delta {100 * (mb - ma) / ma:+.1f}%",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
