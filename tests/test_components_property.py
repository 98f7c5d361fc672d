"""Property test: connected_components agrees with a pure-Python
union-find on arbitrary small graphs — hypothesis explores edge shapes
(self-ish duplicate edges, dense cliques, stars, disconnected nodes in
unsorted id spaces) that the fixed synthetic tests don't."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from smart_contract_database_builder_spark.plans.llm_ops import (
    connected_components,
)

_ids = st.integers(min_value=0, max_value=60)
_edges = st.lists(
    st.tuples(_ids, _ids).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comps: dict[int, set[int]] = {}
    for x in parent:
        comps.setdefault(find(x), set()).add(x)
    return {min(members): members for members in comps.values()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_edges)
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a long, doc_b long"
    )
    got: dict[int, set[int]] = {}
    for r in connected_components(df).collect():
        got.setdefault(r["cluster_id"], set()).add(r["doc"])
    assert got == _union_find(edges)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_edges)
def test_star_components_match_union_find(spark, edges):
    from smart_contract_database_builder_spark.plans.llm_ops import (
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a long, doc_b long"
    )
    got: dict[int, set[int]] = {}
    for r in connected_components_star(df).collect():
        got.setdefault(r["cluster_id"], set()).add(r["doc"])
    assert got == _union_find(edges)
