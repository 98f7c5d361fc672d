"""Leakage-aware train/val/test split (llm_train_split_leakage_aware):
the property the aggregate oracle cannot see — NO candidate pair
straddles two splits — plus assignment sanity at doc granularity.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark import plans
from smart_contract_database_builder_spark.plans.llm_ops import (
    leakage_aware_split_docs,
)

from conftest import SF_ORACLE


def test_no_candidate_pair_straddles_splits(spark):
    """The whole point of the operator: for EVERY near-dup candidate
    pair, both ends land in the same split (split is a pure function
    of the shared cluster key)."""
    split = {
        r["doc_id"]: r["split"]
        for r in leakage_aware_split_docs(spark, SF_ORACLE).collect()
    }
    pairs = plans.QUERIES["llm_minhash_lsh_pairs"].fn(spark, SF_ORACLE).collect()
    assert len(pairs) > 0
    straddlers = [
        (r["doc_a"], r["doc_b"])
        for r in pairs
        if split[r["doc_a"]] != split[r["doc_b"]]
    ]
    assert straddlers == []


def test_every_doc_assigned_exactly_once_and_splits_nonempty(spark):
    """Total function over the corpus: every document appears once,
    and at the test corpus size all three splits are populated (the
    thresholds are ~80/10/10 over a uniform hash)."""
    rows = leakage_aware_split_docs(spark, SF_ORACLE).collect()
    docs = plans.QUERIES["llm_exact_dedup_documents"]  # registry sanity only
    assert docs is not None
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    by_split: dict[str, int] = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + 1
    assert set(by_split) == {"train", "val", "test"}
    # train must dominate: the thresholds carve ~80/10/10
    assert by_split["train"] > by_split["val"]
    assert by_split["train"] > by_split["test"]


def test_split_is_stable_under_recomputation(spark):
    """Hash assignment, not RNG: two independent computations must
    agree doc-for-doc."""
    a = sorted(
        (r["doc_id"], r["split"])
        for r in leakage_aware_split_docs(spark, SF_ORACLE).collect()
    )
    b = sorted(
        (r["doc_id"], r["split"])
        for r in leakage_aware_split_docs(spark, SF_ORACLE).collect()
    )
    assert a == b
