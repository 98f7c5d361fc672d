"""Arrow-batched pandas-UDF twins must agree with their expression-based
oracle-checked references — the documented "swap the kernel, keep the
dataflow" scale path for vector scoring."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark.plans import llm_ops
from smart_contract_database_builder_spark.sources.tables import load_table

from conftest import SF_ORACLE


def test_pandas_cosine_topk_matches_expression_version(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    qrow = emb.filter(F.col("vec_id") == llm_ops._QUERY_VEC_ID).collect()[0]
    query_vec = [float(x) for x in qrow["embedding"]]

    expr = llm_ops.llm_cosine_topk_bruteforce(spark, SF_ORACLE).collect()
    pand = llm_ops.cosine_topk_pandas(
        emb.filter(F.col("vec_id") != llm_ops._QUERY_VEC_ID), query_vec, k=10
    ).collect()

    # identical ranking (ids in order) ...
    assert [r["vec_id"] for r in expr] == [r["vec_id"] for r in pand]
    # ... and numerically-equal scores: the expression path quantizes to
    # fixed point (1e-6 per component), the numpy path is raw float64 —
    # agreement is to quantization tolerance, not bitwise
    for e, p in zip(expr, pand):
        assert p["cosine"] == pytest.approx(e["cosine"], abs=1e-5)
