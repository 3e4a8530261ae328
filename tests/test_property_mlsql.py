"""Self-consistency property tests for the ML-on-SQL family: invariants
that must hold REGARDLESS of the data, checked on the real testdata tables
plus pure-python references on hypothesis-generated inputs for the two
all-integer statistics (AUC, KS) — edge shapes (all-tied scores, one-class
labels, singleton samples) the fixed tables cannot produce.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from backup_repo_spark import registry
from tests.conftest import SF_DIR


# ---- engine-level invariants on the real tables ---------------------------


def test_auc_matches_pairwise_definition(spark, duck):
    """AUC·(np·nn) from the rank-sum identity must equal the direct
    pairwise count: #(pos>neg) + 0.5·#(pos==neg) — computed independently
    in DuckDB from the raw table."""
    row = registry.QUERIES["ml_auc_roc"](spark, SF_DIR).collect()[0]
    got = duck.execute(
        """
        WITH p AS (SELECT o_totalprice v FROM orders WHERE o_orderstatus = 'F'),
             n AS (SELECT o_totalprice v FROM orders WHERE o_orderstatus <> 'F')
        SELECT 2 * count(*) FILTER (WHERE p.v > n.v)
               + count(*) FILTER (WHERE p.v = n.v)
        FROM p CROSS JOIN n
        """
    ).fetchone()[0]
    assert row.two_u == got


def test_kmeans_partitions_all_points(spark):
    rows = registry.QUERIES["ml_kmeans"](spark, SF_DIR).collect()
    from backup_repo_spark.session import load_table

    total = load_table(spark, SF_DIR, "customer").count()
    assert sum(r.n for r in rows) == total
    # centroids must be ordered (init was min/mid/max; Lloyd preserves
    # the 1-D ordering of non-empty clusters)
    cents = [r.centroid_cents for r in sorted(rows, key=lambda r: r.cluster_id)]
    assert cents == sorted(cents)


def test_stump_best_split_beats_all_candidates(spark):
    rows = registry.QUERIES["ml_decision_stump"](spark, SF_DIR).collect()
    best = min(rows, key=lambda r: (r.gini_split_micro, r.thr))
    assert best.rnk == 1
    assert all(0 <= r.gini_split_micro <= 500000 for r in rows)  # Gini ≤ 0.5


def test_confusion_matrix_totals_match_orders(spark):
    rows = registry.QUERIES["ml_confusion_matrix"](spark, SF_DIR).collect()
    from backup_repo_spark.session import load_table

    assert sum(r.n for r in rows) == load_table(spark, SF_DIR, "orders").count()


def test_jaccard_bounds_and_symmetric_construction(spark):
    rows = registry.QUERIES["graph_jaccard_similarity"](spark, SF_DIR).collect()
    for r in rows:
        assert r.a < r.b
        assert 1 <= r.inter <= r.uni
        assert 0 < r.jacc_ppm <= 1_000_000


def test_sssp_distances_respect_triangle_relaxation(spark):
    """No edge may offer a shorter path than recorded (within the 8-hop
    horizon): for every edge (u,v), dist[v] <= dist[u] + cost unless v's
    best path needs more hops than the horizon allowed."""
    from backup_repo_spark.operators.graph import _sparse_cost_edges

    dist = {
        r.node: r.dist
        for r in registry.QUERIES["graph_sssp_weighted"](spark, SF_DIR).collect()
    }
    edges = _sparse_cost_edges(spark, SF_DIR).collect()
    # nodes whose dist was found with < 8 hops have fully-relaxed neighbors;
    # the global horizon makes exact hop counts unavailable here, so assert
    # the weaker sound property: recorded distances never beat edge math.
    for e in edges:
        if e.src in dist and e.dst in dist:
            assert dist[e.dst] <= dist[e.src] + e.cost or dist[e.src] + e.cost > max(
                dist.values()
            )


# ---- hypothesis vs pure-python references ----------------------------------


def _auc_ref(pos, neg):
    """two_u = 2·#(p>n) + #(p==n) — the pairwise definition."""
    return sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)


@given(
    pos=st.lists(st.integers(0, 8), min_size=1, max_size=30),
    neg=st.lists(st.integers(0, 8), min_size=1, max_size=30),
)
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_rank_sum_identity_equals_pairwise(pos, neg):
    """The doubled tie-corrected rank-sum identity used by ml_auc_roc,
    re-implemented in plain python, must equal the O(n²) pairwise count on
    arbitrary integer score multisets."""
    from collections import Counter

    cp, cn = Counter(pos), Counter(neg)
    prev = 0
    two_rs = 0
    for v in sorted(set(pos) | set(neg)):
        c = cp[v] + cn[v]
        two_rs += cp[v] * (2 * prev + c + 1)
        prev += c
    np = len(pos)
    two_u = two_rs - np * (np + 1)
    assert two_u == _auc_ref(pos, neg)


@given(
    s1=st.lists(st.integers(0, 6), min_size=1, max_size=25),
    s2=st.lists(st.integers(0, 6), min_size=1, max_size=25),
)
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_ks_integer_supremum_equals_float_ecdf(s1, s2):
    """stats_ks_test's integer form max|r1·n2 − r2·n1| must equal the
    textbook float ECDF supremum scaled by n1·n2 (exact, since the values
    are small integers)."""
    n1, n2 = len(s1), len(s2)
    vals = sorted(set(s1) | set(s2))
    r1 = r2 = 0
    best = 0
    from fractions import Fraction

    best_frac = Fraction(0)
    for v in vals:
        r1 += s1.count(v)
        r2 += s2.count(v)
        best = max(best, abs(r1 * n2 - r2 * n1))
        best_frac = max(best_frac, abs(Fraction(r1, n1) - Fraction(r2, n2)))
    assert Fraction(best, n1 * n2) == best_frac
