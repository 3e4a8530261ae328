"""Round-13 optimization probe (guide §2.3/§2.4): the exact-Jaccard
verification of banded candidates, exploded-join form vs array form.

Variant A — the pre-r13 `_jaccard_verify`: candidates join the exploded
shingle relation twice (the second keyed on (doc_id, sh)), a groupBy
over the pair x shared-shingle mass counts |A∩B|, and two join-backs to
a `sizes` groupBy supply |A| and |B|. ~5 exchanges; the widest relation
is |cand| x avg-shared-shingles rows of ~30-byte strings. (This is also
the form the DuckDB oracles spell — the oracle pins VALUES, not method.)

Variant B — the SHIPPED array verify (dedup._jaccard_verify since r13):
per-doc DISTINCT shingle ARRAYS exist map-side, so |A∩B| =
size(array_intersect(a, b)), |A| = size(a). Two doc_id-keyed joins of
the candidate list against one array relation (ReusedExchange shares
the exchange), zero groupBys, no pair-mass intermediate. Same integers
-> bit-identical doubles -> identical rows.

The probe asserts result equality (exact set of (da, db, jaccard)
tuples; at the 250x octave an order-insensitive dual-checksum witness,
because the ~28M-pair set is past maxResultSize) before timing, then
interleaves A/B within one session at the template-octave corpus.
Medians carry the verdict. r13 records:

- 50x corpus, 5 rounds, noop sink, full banded pipeline per arm:
  A median 37.53 s, B median 28.28 s — B wins **-24.7%**.
- 250x corpus (OCTAVE_r13_verify250.json): at the default 8g profile
  arm A CANNOT COMPLETE (Java heap space in the ~2e9-row pair x
  shared-shingle aggregation) while B runs in 257.7 s median; with
  SPARK_DRIVER_MEM=48g, interleaved A 935.6 s vs B 324.2 s — **-65%**.
  The gap WIDENS with scale (-24.7% -> -65%), as the shuffle-mass
  analysis predicts. Running --octave 250 unsalted needs
  SPARK_DRIVER_MEM>=48g for the A arm.

    python tools/verify_probe.py [--octave 50] [--rounds 5] [--salted]
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

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Above this many candidate pairs the equality witness switches from a
# driver collect to the checksum aggregate: the verified set is a subset
# of the candidates, and 2M 3-tuples is comfortably inside the default
# 1g spark.driver.maxResultSize while 28M (the 250x unsalted set) is not
# (ADVICE r13: gate on measured size, not on the octave/salt combination).
COLLECT_WITNESS_MAX_PAIRS = 2_000_000


def pair_summary(df: DataFrame):
    """Order-insensitive equality witness for a (da, db, jaccard) relation:
    row count plus two checksum sums over the rounded tuple. The two hash
    constructions are deliberately DIFFERENT at the byte level — h1 hashes
    the three typed columns, h2 hashes one concat_ws STRING rendering
    (different input encoding, not just a permuted column order), so a
    collision would have to survive two unrelated preimage structures as
    well as the row count (ADVICE r13: the previous h2 was the same
    xxhash64 family over permuted columns — a correlated construction)."""
    j4 = F.round("jaccard", 4)
    h1 = F.xxhash64("da", "db", j4)
    h2 = F.xxhash64(F.concat_ws("|", F.col("db"), j4.cast("string"), F.col("da")))
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(h1.cast("decimal(38,0)")).alias("s1"),
        F.sum(h2.cast("decimal(38,0)")).alias("s2"),
    ).collect()[0]
    return (r.n, r.s1, r.s2)


def verify_exploded(cand: DataFrame, shingles: DataFrame, tau: float = 0.5) -> DataFrame:
    """The pre-r13 exploded-join `_jaccard_verify` (variant A), kept here
    verbatim as the A/B harness's reference arm and the probe's equality
    witness against the shipped array form."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cand.join(shingles.alias("sa"), F.col("da") == F.col("sa.doc_id"))
        .join(
            shingles.alias("sb"),
            (F.col("db") == F.col("sb.doc_id")) & (F.col("sa.sh") == F.col("sb.sh")),
        )
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") * 1.0 / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
    return (
        inter.join(sizes.alias("sa"), F.col("da") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("db") == F.col("sb.doc_id"))
        .filter(jac >= tau)
        .select("da", "db", jac.alias("jaccard"))
    )


def build(spark, sf_dir: str, salted: bool):
    """(cand, shingles, repdocs) for the banded pipeline at sf_dir."""
    _session._TABLE_CACHE.clear()
    d = load_table(spark, sf_dir, "documents")
    _, repdocs = D._collapse(d)
    shingles = D._shingles3(repdocs)
    bands = D._bands42(D._sig8(shingles))
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    if salted:
        bands = D._salt_bands(bands, repdocs, 8)
        cond = (F.col("a.sub") == F.col("b.sub")) & cond
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, cond)
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    return cand, shingles, repdocs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--octave", type=int, default=50, choices=[10, 50, 250])
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--salted", action="store_true")
    args = ap.parse_args()
    n_docs, fam = _OCTAVES[args.octave]
    corpus = os.path.join(_REPO, "spark-warehouse", f"collapse_probe_{args.octave}x")

    spark = get_spark("verify-probe")  # scale profile: AQE on, partitions 32
    if not os.path.exists(f"{corpus}/documents.parquet"):
        _gen(spark, corpus, n_docs, fam)

    # --- equality gate (sf0.01 and the octave corpus) ----------------------
    # At the 250x octave the unsalted verified-pair set is ~28M rows (every
    # pair of the 7,500-doc template family is a true near-dup), far past
    # spark.driver.maxResultSize — the witness switches from a driver
    # collect to the order-insensitive dual-checksum aggregate whenever the
    # MEASURED candidate count exceeds COLLECT_WITNESS_MAX_PAIRS (the
    # verified set is a subset of the candidates, so the cheap pre-verify
    # count bounds the collect; ADVICE r13: a hotter corpus or a future
    # octave must not fail with a maxResultSize error just because the
    # old octave/salt gate didn't anticipate it). OCTAVE_r13_verify250.json
    # was produced with the checksum witness (earlier h2 construction).
    for eq_dir in ("/root/testdata/sf0.01", corpus):
        cand, shingles, repdocs = build(spark, eq_dir, args.salted)
        va = verify_exploded(cand, shingles)
        vb = D._jaccard_verify(cand, repdocs)
        if eq_dir == corpus and cand.count() > COLLECT_WITNESS_MAX_PAIRS:
            sa, sb = pair_summary(va), pair_summary(vb)
            assert sa == sb, f"verify variants disagree at {eq_dir}: {sa} vs {sb}"
            print(f"equality (checksum) OK at {eq_dir}: {sa[0]} pairs", flush=True)
            continue
        rows_a = {(r.da, r.db, round(r.jaccard, 4)) for r in va.collect()}
        rows_b = {(r.da, r.db, round(r.jaccard, 4)) for r in vb.collect()}
        assert rows_a == rows_b, (
            f"verify variants disagree at {eq_dir}: "
            f"only-A={sorted(rows_a - rows_b)[:5]} only-B={sorted(rows_b - rows_a)[:5]}"
        )
        print(f"equality OK at {eq_dir}: {len(rows_a)} pairs", flush=True)

    # --- interleaved timing at the octave corpus ---------------------------
    cand, shingles, repdocs = build(spark, corpus, args.salted)

    def run_a():
        verify_exploded(cand, shingles).write.mode("overwrite").format(
            "noop"
        ).save()

    def run_b():
        D._jaccard_verify(cand, repdocs).write.mode("overwrite").format(
            "noop"
        ).save()

    run_a()
    run_b()  # warm both
    ta, tb = [], []
    for i in range(args.rounds):
        for label, fn, sink in (("A/exploded", run_a, ta), ("B/arrays", run_b, tb)):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            sink.append(dt)
            print(f"round {i} {label}: {dt:6.2f}s", flush=True)
    ma, mb = statistics.median(ta), statistics.median(tb)
    print(
        f"A(exploded) median {ma:.2f}s  B(arrays) median {mb:.2f}s  "
        f"delta {100 * (mb - ma) / ma:+.1f}%"
    )
    spark.stop()


if __name__ == "__main__":
    main()
