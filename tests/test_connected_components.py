"""Connected-components clustering — transitive-closure semantics the
natural test corpus barely exercises (its near-dup clusters are mostly
pairs), pinned on synthetic graphs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark.plans.llm_ops import (
    connected_components,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def _clusters(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["cluster_id"], set()).add(r["doc"])
    return out


def test_chain_collapses_to_one_component(spark):
    # A-B, B-C, C-D, D-E: diameter 4 — needs real propagation, not one hop
    comp = connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    assert _clusters(comp) == {1: {1, 2, 3, 4, 5}}


def test_disjoint_components_stay_disjoint(spark):
    comp = connected_components(
        _pairs(spark, [(10, 11), (11, 12), (20, 21), (30, 31), (31, 32)])
    )
    assert _clusters(comp) == {10: {10, 11, 12}, 20: {20, 21}, 30: {30, 31, 32}}


def test_labels_are_component_minimum_regardless_of_edge_orientation(spark):
    # min id arrives via the "wrong" side of every edge
    comp = connected_components(_pairs(spark, [(9, 1), (9, 5), (5, 3)]))
    assert _clusters(comp) == {1: {1, 3, 5, 9}}


def test_long_path_within_max_iter(spark):
    # a 20-node path: worst-case diameter for plain min-propagation;
    # max_iter must comfortably cover the corpus-realistic regime and
    # the early-exit must stop the loop at the fixpoint, not run dry
    edges = [(i, i + 1) for i in range(1, 20)]
    comp = connected_components(_pairs(spark, edges), max_iter=25)
    assert _clusters(comp) == {1: set(range(1, 21))}


# ---------------------------------------------------------------------------
# Large-star/small-star variant (the O(log n) adversarial-graph path)
# ---------------------------------------------------------------------------


def test_star_variant_agrees_on_chain_and_forest(spark):
    from smart_contract_database_builder_spark.plans.llm_ops import (
        connected_components_star,
    )

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22)]
    a = _clusters(connected_components(_pairs(spark, edges)))
    b = {}
    for r in connected_components_star(_pairs(spark, edges)).collect():
        b.setdefault(r["cluster_id"], set()).add(r["doc"])
    assert a == b == {1: {1, 2, 3, 4, 5}, 10: {10, 11}, 20: {20, 21, 22}}


def test_star_variant_beats_diameter_on_a_long_path(spark):
    """The point of star contraction: a 64-node path has diameter 63 —
    min-label would need ~63 rounds, star contraction must finish
    within O(log n) alternations (each loop iteration is one
    large+small pair; 10 ≫ log2(64) leaves slack for the tail)."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        connected_components_star,
    )

    edges = [(i, i + 1) for i in range(1, 64)]
    comp = connected_components_star(_pairs(spark, edges), max_iter=10)
    clusters = {}
    for r in comp.collect():
        clusters.setdefault(r["cluster_id"], set()).add(r["doc"])
    assert clusters == {1: set(range(1, 65))}


def test_hybrid_escalates_and_solves_a_10k_path_with_bounded_rounds(spark):
    """r7 VERDICT item #4 gate: a 10,000-node path has diameter 9,999 —
    pure min-label would need ~10k shuffle rounds. The hybrid
    ``connected_components`` must (a) give the exact same answer (one
    component labeled by its min id) and (b) do it within
    a few (decay-gated, floor ``_CC_ESCALATE_MIN_CHANGED``) min-label
    rounds plus O(log n) star alternations
    (log2(10k) ≈ 13.3; 18 alternations leaves slack for the tail)."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _CC_ESCALATE_MIN_CHANGED,
        connected_components,
        connected_components_star,
    )

    n = 10_000
    edges = [(i, i + 1) for i in range(1, n)]
    df = _pairs(spark, edges)

    comp = connected_components(df, max_iter=40)
    agg = comp.groupBy("cluster_id").count().collect()
    assert len(agg) == 1
    assert agg[0]["cluster_id"] == 1 and agg[0]["count"] == n

    # the star stage alone must stay within O(log n) alternations
    rounds: list = []
    star = connected_components_star(df, max_iter=40, rounds_out=rounds)
    star_agg = star.groupBy("cluster_id").count().collect()
    assert len(star_agg) == 1 and star_agg[0]["count"] == n
    assert len(rounds) <= 18, f"star contraction took {len(rounds)} alternations"
    # the escalation floor must sit far below the path size, so the
    # failed-to-halve signature (9999, 9998, …) actually triggers
    assert _CC_ESCALATE_MIN_CHANGED < n / 10


def test_hybrid_escalates_on_budget_exhaustion_below_the_decay_floor(spark):
    """r8 ADVICE (medium): a ~40-node path decays arithmetically
    (39, 38, …) but every per-round changed count stays UNDER
    ``_CC_ESCALATE_MIN_CHANGED`` (64), so the in-loop decay test never
    fires; with a small ``max_iter`` the loop exhausts its budget
    unconverged. The post-loop escalation must then hand the solve to
    star contraction rather than returning wrong labels silently."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _CC_ESCALATE_MIN_CHANGED,
        connected_components,
    )

    n = 40
    assert n < _CC_ESCALATE_MIN_CHANGED  # precondition of the scenario
    edges = [(i, i + 1) for i in range(1, n)]
    comp = connected_components(_pairs(spark, edges), max_iter=4)
    clusters = {}
    for r in comp.collect():
        clusters.setdefault(r["cluster_id"], set()).add(r["doc"])
    assert clusters == {1: set(range(1, n + 1))}
