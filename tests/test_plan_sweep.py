"""CI gate for the registry-wide quadratic-join sweep: any NEW
CartesianProduct or non-whitelisted BroadcastNestedLoopJoin in any batch
key's physical plan fails this test (tools/plan_sweep.py is the same
logic as a reportable CLI; PLAN_AUDIT.md is its committed artifact).
Marked slow (~2-3 min: builds all 328 batch plans, executes nothing).
"""

from __future__ import annotations

import pytest

from backup_repo_spark import registry
from tools.plan_sweep import SKIP_PREFIXES, WHITELIST, plan_of
from tests.conftest import SF_DIR


@pytest.mark.slow
def test_no_unexplained_quadratic_joins(spark):
    flagged = {}
    for name in sorted(registry.QUERIES):
        if name.startswith(SKIP_PREFIXES) or name in WHITELIST:
            continue
        plan = plan_of(registry.QUERIES[name](spark, SF_DIR))
        hits = []
        if "CartesianProduct" in plan:
            hits.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and not (
            "Keys: []" in plan or "Keys []" in plan
        ):
            hits.append("BroadcastNestedLoopJoin")
        if hits:
            flagged[name] = hits
    assert not flagged, f"quadratic join plans without whitelist entry: {flagged}"
