"""FULL-REGISTRY scale sweep: time EVERY batch key at sf0.1 and at a
deterministic 10x copy, record per-key ratios, list the worst scalers.

The per-family scale_smoke runs cover the headline queries and known
hot spots; this sweep is the dragnet — every registry key gets a
measured 10x ratio on record (SCALESWEEP_r{N}.json), so a quadratic
candidate space, lost broadcast, or driver materialization introduced
by ANY future change shows up as a ratio outlier instead of hiding in
an unmeasured corner. Streaming keys are excluded (their scale story is
the state-store stress + watermark tests; availableNow replays make
wall-time ratios meaningless).

Extends the scale_smoke generator with 10x documents (hash-deterministic
vocab text, same source/lang mix as FIXTURES.md) and embeddings (64-dim
hash-derived floats, labels 0..9, vec_id 0 = the query vector) so the
LLM/ANN keys run at scale too.

    python tools/scale_sweep.py [--mult 10] [--report SCALESWEEP.json]
        [--no-reprobe-regressions] [--prior SCALESWEEP_r07.json]

Any key whose in-sweep ratio is >= 2x its prior-round record is re-probed
once at the END of the sweep before the record is written (default on,
VERDICT r7 #6): the in-sweep numbers stay under the key's `insweep` field,
the re-probe becomes the headline ratio, and the record's `reprobe` stamp
lists the adjudicated keys — back-to-back-sweep contention flags resolve
inside the record instead of in SCALING.md prose.

Two further self-adjudication modes (VERDICT r8 #2/#4):

- Noop-sink exoneration (default on, collect sweeps only): any key whose
  headline collect ratio exceeds 8x is re-measured through the noop sink
  and the numbers stamped under its `noop` field — output-volume-bound
  keys (big collect transfer, flat engine cost) adjudicate themselves in
  the record's worst-20.
- `--octave KEY [KEY...]`: same-session 50x-octave protocol as a record —
  each KEY and its declared candidate generator (OCTAVE_GENERATORS) is
  timed at 10x and 50x in one session; steps land in --octave-report
  (OCTAVE_r{N}.json) instead of SCALING.md prose.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from backup_repo_spark import registry  # noqa: E402
from backup_repo_spark.session import get_spark  # noqa: E402
import backup_repo_spark.session as _session  # noqa: E402
from scale_smoke import generate  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# 256-word vocabulary with per-doc TOPIC slices: each doc draws from a
# 64-word window of the vocab keyed by its topic, so word-frequency
# profiles (and therefore simhash/minhash signatures) are DIVERSE across
# docs. A flat shared vocab made every simhash land within Hamming 3 of
# every other (91M pairs from 50k docs — the first sweep's driver-OOM).
_VOCAB = [
    f"{a}{b}"
    for a in (
        "batch part spark line column order small sort fast value scan "
        "hash slow group agg filter query big key window row table stream "
        "merge data vector shuffle plan join scale read write"
    ).split()
    for b in ("", "er", "ing", "ed", "ly", "est", "ware", "set")
]
_LANGS = ["en", "en", "en", "de", "es", "fr", "zh"]  # en-heavy like testdata


def generate_docs_embeddings(spark: SparkSession, out: str, mult: int) -> None:
    n_docs, n_vecs = 5_000 * mult, 2_000 * mult
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    n_words = (F.abs(F.xxhash64("id", F.lit(1))) % 50 + 10).cast("int")
    topic = (F.abs(F.xxhash64("id", F.lit(7))) % (len(_VOCAB) - 64)).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(
                vocab,
                topic
                + (F.abs(F.xxhash64(F.col("id") * 1000 + i)) % 64 + 1).cast("int"),
            ),
        ),
        " ",
    )
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.element_at(
                F.array(*[F.lit(x) for x in _LANGS]),
                (F.abs(F.xxhash64("id", F.lit(2))) % len(_LANGS) + 1).cast("int"),
            ).alias("lang"),
            F.concat(
                F.lit("src"), (F.abs(F.xxhash64("id", F.lit(3))) % 12).cast("string")
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
        .toPandas()
    )
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: (
            ((F.abs(F.xxhash64(F.col("id") * 100 + i)) % 2001) - 1000) / 1000.0
        ).cast("float"),
    )
    vecs = (
        spark.range(n_vecs)
        .select(
            F.col("id").alias("vec_id"),
            emb.alias("embedding"),
            (F.abs(F.xxhash64("id", F.lit(5))) % 10).cast("int").alias("label"),
        )
        .toPandas()
    )
    # single FILES (not directories), matching the testdata layout the
    # DSv2 connector keys expect
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(docs), f"{out}/documents.parquet")
    tbl = pa.table(
        {
            "vec_id": pa.array(vecs["vec_id"], pa.int64()),
            "embedding": pa.array(
                [list(v) for v in vecs["embedding"]], pa.list_(pa.float32())
            ),
            "label": pa.array(vecs["label"], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")


def _time_key(fn, spark, sf_dir, sink: str = "collect") -> float:
    """Time a key end-to-end.  sink='collect' matches the driver protocol
    (includes driver-side result transfer); sink='noop' materializes every
    row distributed-side with zero driver transfer — use it to separate
    plan cost from collect volume for keys whose OUTPUT is proportional
    to the input (reshape_unpivot returned 18M rows at 10×: 15.5× by
    collect, 0.59× by noop — SCALING.md round 5)."""

    def run():
        df = fn(spark, sf_dir)
        if sink == "noop":
            df.write.mode("overwrite").format("noop").save()
        else:
            df.collect()

    run()  # warm
    best = min(
        (lambda t0: (run(), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(2)
    )
    return round(best, 3)


def _regressed_keys(
    results: dict[str, dict], prior: dict[str, dict], factor: float = 2.0
) -> list[str]:
    """Keys whose in-sweep ratio at least `factor`-ed vs the prior-round
    record — the candidates for an end-of-sweep quiet re-probe. Round 7
    adjudicated exactly this class by hand (udf_map_in_pandas 14.65x and
    fn_null 9.06x in-sweep, both back at prior-round levels on a same-day
    re-probe: back-to-back-sweep contention, not engine); this automates
    that adjudication before the record is written (VERDICT r7 #6)."""
    out = []
    for name, entry in results.items():
        pr = prior.get(name, {}).get("ratio")
        r = entry.get("ratio")
        if pr and r and r >= factor * pr:
            out.append(name)
    return sorted(out)


def _octave_verdict(entry: dict, gen_entry: dict, gap_tol_pct: float = 10.0) -> dict:
    """Adjudication rule for an octave dependent vs its generator
    (round 9, OCTAVE_r09_reprobe.json): the STEP ratio is noisy when the
    10x base is overhead-dominated (<~20 s runs land under or over the
    generator's base on fixed stage costs, not data volume), so a
    dependent whose step exceeds the generator's is judged on the
    ABSOLUTE gap at the larger octave — real growth above the generator
    would widen that gap with scale; a flat gap means the added stage
    contributes no growth of its own. Returns the stamps to merge into
    the dependent's record entry."""
    gap = round(
        100.0
        * (entry["scaled"] - gen_entry["scaled"])
        / max(gen_entry["scaled"], 1e-9),
        1,
    )
    out = {"gap50_pct": gap}
    if entry["step"] <= gen_entry["step"]:
        # ADVICE r9: a passing step can be minted by a contention-inflated
        # 10x base (the docstring above calls step the noisy statistic), so
        # a wide absolute gap must stay visible in the record rather than
        # be adjudicated silently — stamp the ambiguity as its own verdict.
        out["verdict"] = (
            "at-or-below-generator"
            if gap <= gap_tol_pct
            else "step-pass-gap-wide"
        )
    elif gap <= gap_tol_pct:
        out["verdict"] = "flat-absolute-gap"
    else:
        out["verdict"] = "above-generator"
    return out


def _merge_stamps(
    prior_report: dict,
    reprobe_stamp: dict | None,
    noop_stamp: list | None,
    remeasured: set | None = None,
) -> tuple[dict | None, list | None]:
    """Stamp rule for --merge-into: a partial re-measure must not ERASE
    the full run's adjudication. Carry the prior record's reprobe/noop
    stamps forward — MINUS any key this merge run itself re-measured
    (its entry was just overwritten, so the old adjudication no longer
    describes it) — and keep the merge run's own stamps attributed to
    the merge run's own prior anchor, never the old record's. Without
    this, a --keys merge rewrote the record with an empty reprobe and no
    noop_exonerated list (round 9); the naive union then mis-attributed
    merge-run reprobes to the old anchor and kept stamps for overwritten
    entries."""
    rem = remeasured or set()
    prior_reprobe = prior_report.get("reprobe")
    if prior_reprobe:
        carried = dict(prior_reprobe)
        if "keys" in carried:
            carried["keys"] = sorted(set(carried["keys"]) - rem)
        carried_alive = carried.get("keys") or "skipped" in carried
        if reprobe_stamp is None or not reprobe_stamp.get("keys"):
            reprobe_stamp = carried if carried_alive else reprobe_stamp
        elif carried_alive:
            # both contribute: keep each attributed to its own anchor
            reprobe_stamp = {**reprobe_stamp, "carried": carried}
    prior_noop = prior_report.get("noop_exonerated")
    if prior_noop:
        noop_stamp = sorted(
            (set(prior_noop) - rem) | set(noop_stamp or [])
        )
    return reprobe_stamp, noop_stamp


def _noop_candidates(results: dict[str, dict], threshold: float = 8.0) -> list[str]:
    """Keys whose headline collect-sink ratio exceeds `threshold` — the
    candidates for the end-of-sweep noop-sink exoneration pass. Rounds 5-8
    adjudicated this class by hand in SCALING.md prose (every >8x collect
    ratio so far has been driver-transfer volume, not plan shape:
    reshape_unpivot 18.4x by collect, 1.09x engine-side); this stamps the
    noop re-measure into the record itself (VERDICT r8 #2) so the worst-20
    is self-adjudicating. Entries already carrying a noop stamp or an
    error are skipped."""
    return sorted(
        name
        for name, entry in results.items()
        if entry.get("ratio", 0.0) > threshold
        and "err" not in entry
        and "noop" not in entry
    )


def _noop_exonerate(results, spark, out, mult) -> list[str]:
    """Re-measure every >8x collect-ratio key under the noop sink (pure
    distributed materialization, zero driver transfer) and stamp the
    numbers into the entry: `noop` = {base, scaled, ratio}. A noop ratio
    at/near the data-growth line exonerates the headline number as
    collect-volume; a noop ratio that STAYS high is a real plan-shape
    scaler and keeps the flag."""
    flagged = _noop_candidates(results)
    stamped = []
    for name in flagged:
        entry = results[name]
        try:
            _session._TABLE_CACHE.clear()
            base = _time_key(
                registry.QUERIES[name], spark, "/root/testdata/sf0.1", "noop"
            )
            _session._TABLE_CACHE.clear()
            scaled = _time_key(registry.QUERIES[name], spark, out, "noop")
        except Exception as e:  # noqa: BLE001
            entry["noop_err"] = f"{type(e).__name__}: {str(e)[:160]}"
            continue
        entry["noop"] = {
            "base": base,
            "scaled": scaled,
            "ratio": round(scaled / max(base, 1e-9), 2),
        }
        stamped.append(name)
        print(
            f"noop-exonerate {name}: collect {entry['ratio']} -> "
            f"noop {entry['noop']['ratio']}",
            file=sys.stderr,
        )
    return stamped


# Same-session 50x-octave protocol (VERDICT r8 #4): each dependent key is
# measured against its declared candidate GENERATOR — the key whose growth
# bounds it by construction — at 10x and 50x in ONE session (cross-session
# octave ratios drift ~20% with machine state, SCALING.md round 4). The
# dependent's step at/below the generator's step means the added stage
# contributes no super-linear growth of its own.
OCTAVE_GENERATORS = {
    "llm_dup_source_matrix": "llm_dedup_minhash_banded",
    "llm_dedup_drop_rate": "llm_dedup_minhash_banded",
    "llm_dup_cluster_profile": "llm_dedup_minhash_banded",
    "llm_dedup_cluster_banded": "llm_dedup_minhash_banded",
    "llm_dedup_survivorship_banded": "llm_dedup_minhash_banded",
    "llm_dedup_cluster": "llm_dedup_ngram",
    "llm_dedup_survivorship": "llm_dedup_ngram",
    # round 10 rotation (VERDICT r9 #6): the PQ serving chain — search
    # wholly contains codebook training; recall and refine wholly contain
    # the ADC search. llm_ann_partitioned has no generator: it is
    # self-bounded (bucket-pruned scan) and is measured alone.
    "llm_pq_search": "llm_pq_codebook",
    "llm_pq_recall": "llm_pq_search",
    "llm_pq_refine": "llm_pq_search",
    # round 11 rotation (VERDICT r10 #5): BPE encode replays the merge
    # table llm_bpe_merges trains (it collects that key's output), so
    # merges bounds it; the salt arm and its eval both contain the
    # collapsed banded join (salted candidates are a subset of unsalted;
    # the eval computes both joins), so the unsalted banded key is their
    # generator. llm_sim_search / llm_semdedup are self-bounded
    # (brute-force top-k; adaptive-cluster cosine) and measured alone.
    "llm_bpe_encode": "llm_bpe_merges",
    "llm_dedup_salted_band": "llm_dedup_minhash_banded",
    "llm_lsh_salt_eval": "llm_dedup_minhash_banded",
    # the cap planner contains the unsalted co-bucket join + one-shot
    # verification; its per-cap arithmetic is map-side conditional aggs
    "llm_lsh_salt_plan": "llm_dedup_minhash_banded",
}


def _octave_plan(keys: list[str]) -> tuple[list[str], dict[str, str]]:
    """(generators to measure once, dependent->generator map) for an
    --octave run. Unknown keys raise; a key with no declared generator is
    measured alone (it IS a generator or a self-bounded key)."""
    unknown = [k for k in keys if k not in registry.QUERIES]
    if unknown:
        raise SystemExit(f"--octave: unknown registry keys: {unknown}")
    dep_to_gen = {k: OCTAVE_GENERATORS[k] for k in keys if k in OCTAVE_GENERATORS}
    gens = sorted(set(dep_to_gen.values()) - set(keys))
    return gens, dep_to_gen


def _latest_prior_record(exclude: str | None = None) -> str | None:
    """Newest prior-round SCALESWEEP record by PARSED round number —
    lexicographic sort mis-orders unpadded rounds (r9 vs r10), and the
    record currently being (re)written must not serve as its own prior
    (ADVICE r8)."""
    import glob
    import re

    recs = []
    for p in glob.glob(os.path.join(_REPO, "SCALESWEEP_r*.json")):
        name = os.path.basename(p)
        if exclude and name == os.path.basename(exclude):
            continue
        m = re.fullmatch(r"SCALESWEEP_r(\d+)\.json", name)
        if m:
            recs.append((int(m.group(1)), p))
    return max(recs)[1] if recs else None


def _reprobe(results, spark, out, sink, prior_path, mult) -> dict:
    """Re-measure every regressed key once more at the END of the sweep
    (after the back-to-back burst has passed), keeping the in-sweep
    numbers under `insweep` and promoting the re-probe to the key's
    headline base/scaled/ratio. Returns the report stamp."""
    try:
        with open(prior_path) as fh:
            prior_report = json.load(fh)
    except (OSError, json.JSONDecodeError, TypeError) as e:
        print(f"reprobe: no usable prior record ({e}); skipped", file=sys.stderr)
        return {"prior": prior_path, "skipped": "unreadable prior record"}
    if (
        prior_report.get("mult") != mult
        or prior_report.get("sink", "collect") != sink
    ):
        print("reprobe: prior record protocol differs; skipped", file=sys.stderr)
        return {"prior": prior_path, "skipped": "prior mult/sink differ"}
    flagged = _regressed_keys(results, prior_report["results"])
    reprobed = []
    for name in flagged:
        entry = results[name]
        try:
            _session._TABLE_CACHE.clear()
            base = _time_key(registry.QUERIES[name], spark, "/root/testdata/sf0.1", sink)
            _session._TABLE_CACHE.clear()
            scaled = _time_key(registry.QUERIES[name], spark, out, sink)
        except Exception as e:  # noqa: BLE001
            entry["reprobe_err"] = f"{type(e).__name__}: {str(e)[:160]}"
            continue
        entry["insweep"] = {
            "base": entry["base"], "scaled": entry["scaled"], "ratio": entry["ratio"],
        }
        entry["base"], entry["scaled"] = base, scaled
        entry["ratio"] = round(scaled / max(base, 1e-9), 2)
        reprobed.append(name)
        print(
            f"reprobe {name}: prior {prior_report['results'][name]['ratio']} "
            f"-> insweep {entry['insweep']['ratio']} -> {entry['ratio']}",
            file=sys.stderr,
        )
    return {"prior": os.path.basename(prior_path), "keys": reprobed}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--report", default="SCALESWEEP.json")
    ap.add_argument(
        "--reprobe-regressions",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="re-measure any key whose ratio >= 2x its prior-round record "
        "at the end of the sweep, before the record is written (default on)",
    )
    ap.add_argument(
        "--prior",
        default=None,
        help="prior-round SCALESWEEP record to compare against "
        "(default: newest SCALESWEEP_r*.json in the repo root)",
    )
    ap.add_argument(
        "--sink",
        choices=["collect", "noop"],
        default="collect",
        help="collect = driver protocol (default); noop = distributed "
        "materialization only, for diagnosing output-volume-bound keys",
    )
    ap.add_argument(
        "--noop-exonerate",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="re-measure any key whose collect ratio exceeds 8x under the "
        "noop sink at the end of the sweep and stamp `noop` into its "
        "record entry (default on; only applies to --sink collect)",
    )
    ap.add_argument(
        "--octave",
        nargs="+",
        default=None,
        metavar="KEY",
        help="same-session 50x-octave mode: measure each KEY and its "
        "declared generator (OCTAVE_GENERATORS) at 10x and 50x, write "
        "--octave-report, and exit (no full sweep)",
    )
    ap.add_argument(
        "--octave-report",
        default="OCTAVE.json",
        help="report path for --octave mode",
    )
    ap.add_argument(
        "--keys",
        nargs="*",
        default=None,
        help="measure only these registry keys (default: all batch keys)",
    )
    ap.add_argument(
        "--merge-into",
        default=None,
        help="update an existing report in place with the re-measured "
        "--keys entries (keeps every other key's numbers), recomputing "
        "the summary fields — for re-recording keys whose code changed "
        "after a full sweep",
    )
    args = ap.parse_args()
    # r14: aqe_probe C profile (OPTIMIZATION_r13.md AQE adjudication) —
    # overprovision partitions, let AQE coalesce to 64 MB from runtime
    # bytes; -18.1% vs pinned 32 at the 50x dedup fixture.
    spark = get_spark("scale-sweep", shuffle_partitions=256, advisory_partition_mb=64)

    def fixture_dir(mult: int) -> str:
        d = os.path.join(_REPO, "spark-warehouse", f"scale_smoke_{mult}x")
        if not os.path.exists(f"{d}/lineitem.parquet"):
            generate(spark, d, mult)
        if not os.path.exists(f"{d}/documents.parquet"):
            print(f"generating {mult}x documents/embeddings ...", file=sys.stderr)
            generate_docs_embeddings(spark, d, mult)
        return d

    if args.octave:
        gens, dep_to_gen = _octave_plan(args.octave)
        dirs = {m: fixture_dir(m) for m in (10, 50)}

        def measure(name: str) -> dict:
            _session._TABLE_CACHE.clear()
            t10 = _time_key(registry.QUERIES[name], spark, dirs[10], args.sink)
            _session._TABLE_CACHE.clear()
            t50 = _time_key(registry.QUERIES[name], spark, dirs[50], args.sink)
            e = {"base": t10, "scaled": t50,
                 "step": round(t50 / max(t10, 1e-9), 2)}
            print(f"octave {name}: {e}", file=sys.stderr)
            return e

        record = {"mults": [10, 50], "sink": args.sink,
                  "generators": {}, "keys": {}}
        for g in gens:
            record["generators"][g] = measure(g)
        for k in args.octave:
            record["keys"][k] = measure(k)
        for k, g in dep_to_gen.items():
            gen_entry = record["generators"].get(g) or record["keys"][g]
            record["keys"][k]["generator"] = g
            record["keys"][k]["generator_step"] = gen_entry["step"]
            record["keys"][k].update(_octave_verdict(record["keys"][k], gen_entry))
        # Self-adjudication (the sweep's round-8 reprobe pattern applied
        # to octaves): a dependent still above its generator on BOTH
        # statistics (step AND absolute gap) gets one same-session
        # re-probe — fresh key + generator pair — stamped into the
        # record before it lands, so the reader never needs a second
        # session to tell growth from box state.
        gen_cache: dict[str, dict] = {}
        for k, g in dep_to_gen.items():
            # step-pass-gap-wide reprobes too (ADVICE r9): the step pass
            # may have been minted by a contention-inflated base, and a
            # fresh same-session pairing is exactly what resolves it.
            if record["keys"][k].get("verdict") not in (
                "above-generator",
                "step-pass-gap-wide",
            ):
                continue
            # One FRESH generator measure per reprobe pass, shared by its
            # flagged dependents: still a same-session pairing, without
            # re-paying ~4 min of generator timings per extra dependent.
            # A failed measure must not discard 30+ minutes of collected
            # first-pass data — stamp the error and still write the record
            # (the full sweep's _reprobe/_noop_exonerate do the same).
            try:
                gen2 = gen_cache.setdefault(g, measure(g))
                key2 = measure(k)
            except Exception as e:  # noqa: BLE001
                record["keys"][k]["reprobe_err"] = (
                    f"{type(e).__name__}: {str(e)[:160]}"
                )
                continue
            record["keys"][k]["reprobe"] = {
                "generator": gen2,
                "key": key2,
                **_octave_verdict(key2, gen2),
            }
            record["keys"][k]["verdict"] = (
                "reprobe:" + record["keys"][k]["reprobe"]["verdict"]
            )
        with open(args.octave_report, "w") as fh:
            json.dump(record, fh, indent=1)
        print(json.dumps({
            "octave": {k: (v["step"], v.get("generator_step"))
                       for k, v in record["keys"].items()}
        }))
        return

    # mirror _octave_plan's unknown-key guard: a typo'd --keys otherwise
    # measures nothing and still rewrites the report. Guard BEFORE fixture
    # generation (ADVICE r9: a typo used to pay the ~4 min fixture build
    # first), and reject an empty --keys list, which would also measure
    # nothing and still re-stamp the report.
    if args.keys is not None:
        if not args.keys:
            sys.exit("--keys: empty key list (nothing to measure)")
        unknown = sorted(set(args.keys) - set(registry.QUERIES))
        if unknown:
            sys.exit(f"--keys: unknown registry keys: {unknown}")

    out = fixture_dir(args.mult)

    results: dict[str, dict] = {}
    for name in sorted(registry.QUERIES):
        if name.startswith("stream_"):
            continue
        if args.keys is not None and name not in args.keys:
            continue
        fn = registry.QUERIES[name]
        entry: dict = {}
        try:
            _session._TABLE_CACHE.clear()
            entry["base"] = _time_key(fn, spark, "/root/testdata/sf0.1", args.sink)
            _session._TABLE_CACHE.clear()
            entry["scaled"] = _time_key(fn, spark, out, args.sink)
            entry["ratio"] = round(entry["scaled"] / max(entry["base"], 1e-9), 2)
        except Exception as e:  # noqa: BLE001
            entry["err"] = f"{type(e).__name__}: {str(e)[:160]}"
        results[name] = entry
        print(f"{name}: {entry}", file=sys.stderr)

    reprobe_stamp = None
    if args.reprobe_regressions:
        # a --merge-into run must not compare against (or later overwrite
        # the stamps of) the very record it is merging into
        prior_path = args.prior or _latest_prior_record(
            exclude=args.merge_into or args.report
        )
        reprobe_stamp = _reprobe(results, spark, out, args.sink, prior_path, args.mult)

    noop_stamp = None
    if args.noop_exonerate and args.sink == "collect":
        noop_stamp = _noop_exonerate(results, spark, out, args.mult)

    if args.merge_into:
        with open(args.merge_into) as fh:
            prior_report = json.load(fh)
        # Refuse incomparable merges (ADVICE r5): a re-measure at a
        # different multiplier or through a different sink would silently
        # corrupt the record's comparability.
        prior_mult = prior_report.get("mult")
        if prior_mult != args.mult:
            sys.exit(
                f"--merge-into refused: prior report mult={prior_mult} "
                f"!= --mult {args.mult}"
            )
        prior_sink = prior_report.get("sink", "collect")
        if prior_sink != args.sink:
            sys.exit(
                f"--merge-into refused: prior report sink={prior_sink} "
                f"!= --sink {args.sink} (re-measure with the same sink, "
                "or write a separate report)"
            )
        prior = prior_report["results"]
        remeasured = set(results)
        prior.update(results)
        results = prior
        args.report = args.merge_into
        reprobe_stamp, noop_stamp = _merge_stamps(
            prior_report, reprobe_stamp, noop_stamp, remeasured
        )

    ok = {k: v for k, v in results.items() if "ratio" in v}
    worst = sorted(ok.items(), key=lambda kv: -kv[1]["ratio"])[:20]
    report = {
        "mult": args.mult,
        # measurement protocol stamp (ADVICE r5): lets readers and future
        # --merge-into runs tell collect-protocol records from noop ones
        "sink": args.sink,
        "keys_timed": len(ok),
        "keys_errored": len(results) - len(ok),
        "errors": {k: v["err"] for k, v in results.items() if "err" in v},
        "worst20": [{"key": k, **v} for k, v in worst],
        "results": results,
    }
    if reprobe_stamp is not None:
        report["reprobe"] = reprobe_stamp
    if noop_stamp is not None:
        report["noop_exonerated"] = noop_stamp
    with open(args.report, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"keys_timed": len(ok), "errored": report["keys_errored"],
                      "worst": [(k, v["ratio"]) for k, v in worst[:8]]}))


if __name__ == "__main__":
    main()
