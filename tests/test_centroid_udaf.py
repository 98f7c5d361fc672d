"""U5: the applyInPandas centroid UDAF agrees with the fixed-point
expression twin (within float tolerance — the UDAF is the fast path,
the expression form is the oracle-checkable path)."""

from __future__ import annotations

import pytest

from smart_contract_database_builder_spark.plans.reference_ext import (
    centroid_udaf,
)
from smart_contract_database_builder_spark.sources.tables import load_table

from conftest import SF_ORACLE


def test_centroid_udaf_matches_expression_form(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    udaf = {r["label"]: r for r in centroid_udaf(emb).collect()}
    assert len(udaf) > 1
    from smart_contract_database_builder_spark import plans

    expr = plans.QUERIES["llm_centroid_by_label"].fn(spark, SF_ORACLE).collect()
    for r in expr:
        got = udaf[r["label"]]["centroid"][r["dim"] - 1]
        # UDAF: float mean; expression: 1e-6 fixed point — agree to ~1e-6
        assert got == pytest.approx(r["centroid"], abs=2e-6)
    n_total = emb.count()
    assert sum(r["n_vectors"] for r in udaf.values()) == n_total


def test_ivf_topk_probes_single_cell(spark):
    from smart_contract_database_builder_spark import plans

    rows = plans.QUERIES["llm_ivf_topk"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 10
    # IVF contract: every candidate comes from the query's own cell
    assert len({r["cell"] for r in rows}) == 1
    # scores are valid cosines, descending
    scores = [r["cosine"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in scores)
