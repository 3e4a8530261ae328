"""Per-stage 50x-octave probe for llm_pq_search (VERDICT r10 #2).

OCTAVE_r10 twice stamped llm_pq_search `above-generator` (step 5.17 vs
the codebook generator's 3.47 at the 50x octave) and the exoneration —
"the codebook key amortizes fixed Lloyd scaffolding that the search key's
extra stages dilute" — rested on prose, not a measured probe. This tool
measures it: in ONE session (same-session pairing, the SCALING.md round-4
rule) it times the search key's constituent stages separately at 10x and
50x on the standard scale_smoke fixtures:

- train:  `_train_codebook` (subv cache + 2 Lloyd iterations; the
          localCheckpoints make it eager) — the generator's entire work.
- encode: corpus -> (vec_id, sub, cid) codes over the cached subv and the
          broadcast trained codebook (one join+agg+window). Materialized
          via localCheckpoint so the next stage can't re-evaluate it.
- lut:    the query row's 64-entry centroid LUT (vec_id = 0 filter —
          pushes down through the aggregate to the subv scan; cheap by
          construction, timed to prove it).
- adc:    LUT-sum ranking over the checkpointed codes + top-10 collect.
- e2e:    the registered key, untouched, for cross-reference against the
          stage sum and the OCTAVE_r1x records.

Verdict logic: the above-generator stamp is EXONERATED as fixed-cost
amortization iff every stage's own 50x/10x step is at or below the train
stage's step + tolerance — i.e. no stage grows faster than the generator
itself; the aggregate key's higher step is then arithmetic (smaller fixed
share), not super-linear growth. If encode's or adc's step materially
exceeds train's, that stage is real super-linear growth and needs a fix.

Usage:  python tools/pq_stage_probe.py [--report OCTAVE_r11_pqstages.json]
Reuses the cached spark-warehouse/scale_smoke_{10,50}x fixtures (built on
first use by tools/scale_sweep.py's generators).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

sys.path.insert(0, os.path.join(_REPO, "tools"))

from backup_repo_spark import registry, session as _session  # noqa: E402
from backup_repo_spark.llm import pq  # noqa: E402
from backup_repo_spark.session import get_spark  # noqa: E402
from scale_smoke import generate  # noqa: E402
from scale_sweep import generate_docs_embeddings  # noqa: E402


def _fixture_dir(spark, mult: int) -> str:
    d = os.path.join(_REPO, "spark-warehouse", f"scale_smoke_{mult}x")
    if not os.path.exists(f"{d}/lineitem.parquet"):
        generate(spark, d, mult)
    if not os.path.exists(f"{d}/documents.parquet"):
        print(f"generating {mult}x documents/embeddings ...", file=sys.stderr)
        generate_docs_embeddings(spark, d, mult)
    return d


def _stages_once(spark, sf_dir: str) -> dict[str, float]:
    """One timed pass of the search key's stages, composing the SAME
    stage builders the registered key ships (pq.pq_dist/pq_codes/pq_lut/
    pq_adc_topk — factored per ADVICE r11 so the probe cannot drift from
    the shipped expressions), with localCheckpoint stage barriers."""
    _session._TABLE_CACHE.clear()
    out: dict[str, float] = {}

    t0 = time.perf_counter()
    subv, cent = pq._train_codebook(spark, sf_dir)
    cent.count()  # checkpointed (eager); count is a barrier formality
    out["train"] = time.perf_counter() - t0

    dist = pq.pq_dist(subv, cent)

    t0 = time.perf_counter()
    codes = pq.pq_codes(dist).localCheckpoint()  # the encode barrier
    out["encode"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    lut = pq.pq_lut(dist).localCheckpoint()
    out["lut"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    pq.pq_adc_topk(codes, lut, k=10).collect()
    out["adc"] = time.perf_counter() - t0
    subv.unpersist(False)

    t0 = time.perf_counter()
    registry.QUERIES["llm_pq_search"](spark, sf_dir).collect()
    out["e2e"] = time.perf_counter() - t0
    return {k: round(v, 3) for k, v in out.items()}


def _stages_best2(spark, sf_dir: str) -> dict[str, float]:
    """Warm pass + per-stage best of 2 timed passes (the sweep's
    _time_key protocol applied stage-wise)."""
    _stages_once(spark, sf_dir)  # warm (JIT, shuffle dirs, fixture cache)
    a, b = _stages_once(spark, sf_dir), _stages_once(spark, sf_dir)
    return {k: min(a[k], b[k]) for k in a}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--report", default=os.path.join(_REPO, "OCTAVE_r11_pqstages.json"))
    ap.add_argument("--tol", type=float, default=0.75,
                    help="stage step may exceed train step by this much "
                    "before it is flagged as real super-linear growth")
    args = ap.parse_args()
    spark = get_spark("pq-stage-probe", shuffle_partitions=32)
    dirs = {m: _fixture_dir(spark, m) for m in (10, 50)}

    base = _stages_best2(spark, dirs[10])
    scaled = _stages_best2(spark, dirs[50])
    steps = {
        k: round(scaled[k] / max(base[k], 1e-9), 2) for k in base
    }
    flagged = [
        k for k in ("encode", "lut", "adc")
        if steps[k] > steps["train"] + args.tol
    ]
    record = {
        "key": "llm_pq_search",
        "mults": [10, 50],
        "stages_base": base,
        "stages_scaled": scaled,
        "steps": steps,
        "train_step": steps["train"],
        "flagged_stages": flagged,
        "verdict": (
            "exonerated:fixed-cost-amortization" if not flagged
            else "super-linear-stage"
        ),
    }
    with open(args.report, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
