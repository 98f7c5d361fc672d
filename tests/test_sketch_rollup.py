"""HLL sketch-algebra rollup (agg_sketch_rollup_users, rows-only):
mergeability and accuracy are the whole contract — pin both."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark import plans

from conftest import SF_ORACLE


def test_sketch_merge_equals_direct_and_tracks_exact(spark):
    rows = (
        plans.QUERIES["agg_sketch_rollup_users"]
        .fn(spark, SF_ORACLE)
        .collect()
    )
    assert rows
    for r in rows:
        # mergeability: union of daily sketches == one-pass weekly
        # sketch (register-wise max is associative; identical inputs
        # ⇒ identical registers ⇒ identical estimate)
        assert r["est_merged"] == r["est_direct"], r
        # accuracy: default lgK=12 ⇒ ~1.6% rse; allow 5%
        assert abs(r["est_direct"] - r["exact_users"]) <= max(
            3, 0.05 * r["exact_users"]
        ), r
