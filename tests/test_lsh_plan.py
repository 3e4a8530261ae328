"""llm_lsh_plan frontier assertions at sf0.1 (VERDICT r6 #6).

The planner sweeps the (b, r) banding grid under the SAME salted-md5 hash
family the shipped banded dedup key uses, so the 4x2 row is the shipped
configuration itself. What "on the frontier" means here, precisely:

- The fixture's true near-dup pairs are high-Jaccard (planted dups), so
  EMPIRICAL recall saturates at 1.0 for every config with enough OR
  amplification — the fixture cannot distinguish (3,2) from (4,2) on
  recall alone. The quantity the operator actually buys with the extra
  band is the THEORETICAL detection probability for a worst-case pair at
  the design threshold J=0.5: 1-(1-0.5^r)^b (0.684 for 4x2 vs 0.578 for
  3x2). That S-curve value is exact math, not a fixture property.
- So the frontier is Pareto over (empirical recall, p_detect_t05,
  candidate volume): a config dominates the shipped one only if it is at
  least as good on BOTH recall axes and strictly cheaper (or better on an
  axis at equal cost). Measured at sf0.1: nothing dominates 4x2 —
  configs with more detection margin (8x1: p=0.996) pay ~120x the
  candidates; configs that are cheaper (3x2, 2x3, 2x4, 1x4) give up
  detection margin or empirical recall.
"""

from __future__ import annotations

import os

import pytest

from backup_repo_spark.registry import QUERIES

# The frontier assertions are calibrated to the 10x fixture: at smaller
# scales the planted-dup counts are too small for the r=1-pays->10x-
# candidates margin to hold robustly (so SPARK_GRAFT_SF_DIR, which may
# point at any sf, is deliberately NOT honored here). Skip cleanly when
# the fixture is absent rather than failing on an implicit environment
# dependency (ADVICE r7: the suite's only hard-coded sf0.1 path).
SF01 = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01), reason=f"10x fixture dir {SF01} not present"
)


def _plan_rows(spark):
    return {r.cfg: r for r in QUERIES["llm_lsh_plan"](spark, SF01).collect()}


def test_shipped_banding_is_pareto_optimal(spark):
    rows = _plan_rows(spark)
    ship = rows["4x2"]
    # the shipped config must catch every true pair on the fixture
    assert ship.recall == 1.0, ship
    for other in rows.values():
        if other.cfg == "4x2":
            continue
        at_least_as_good = (
            (other.recall or 0.0) >= ship.recall
            and other.p_detect_t05 >= ship.p_detect_t05
            and other.n_cand <= ship.n_cand
        )
        strictly_better = (
            (other.recall or 0.0) > ship.recall
            or other.p_detect_t05 > ship.p_detect_t05
            or other.n_cand < ship.n_cand
        )
        assert not (at_least_as_good and strictly_better), (
            f"{other.cfg} dominates shipped 4x2: {other}"
        )


def test_r1_or_amplification_is_the_expensive_axis(spark):
    """The round-6 minhash demotion's mechanism, now pinned by the planner:
    pure-OR r=1 banding (pyspark.ml's numHashTables shape) pays an order
    of magnitude more candidates than r=2 at the same band count, because
    single-hash buckets grow linearly with the corpus."""
    rows = _plan_rows(spark)
    assert rows["4x1"].n_cand > 10 * rows["4x2"].n_cand, (
        rows["4x1"].n_cand,
        rows["4x2"].n_cand,
    )
    assert rows["8x1"].n_cand > rows["4x1"].n_cand > rows["2x1"].n_cand
    # detection margin is monotone in b at fixed r (exact S-curve math)
    assert (
        rows["8x1"].p_detect_t05
        > rows["4x1"].p_detect_t05
        > rows["2x1"].p_detect_t05
    )
