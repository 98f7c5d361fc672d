"""Write-time MinHash band store (sources/minhash_store.py +
llm_minhash_lsh_pairs_stored): the layout claims — exchange-free
bucket assembly from the bucketed catalog table, no query-time
signature pass — must be visible in the plan, and the read path must
agree exactly with the query-time twin.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark import plans
from smart_contract_database_builder_spark.plans.llm_ops import _minhash_store

from conftest import SF_ORACLE


def _plan(df, mode: str = "formatted") -> str:
    # "formatted" lists every operator twice (tree + details) — use
    # "simple" when COUNTING operator occurrences.
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def _pairs(name):
    def run(spark):
        return sorted(
            (r["doc_a"], r["doc_b"], r["n_shared_bands"])
            for r in plans.QUERIES[name].fn(spark, SF_ORACLE).collect()
        )

    return run


def test_stored_pairs_match_query_time_twin_exactly(spark):
    """Write-time banding is a physical-layout change, not a semantic
    one: the stored read path must return bit-identical candidate
    pairs (ids AND shared-band counts) to llm_minhash_lsh_pairs."""
    a = _pairs("llm_minhash_lsh_pairs_stored")(spark)
    b = _pairs("llm_minhash_lsh_pairs")(spark)
    assert a == b and len(a) > 0


def test_stored_plan_never_rereads_documents_and_preps_no_signature(spark):
    """After the store exists, the read path must scan the band store
    only: no documents.parquet relation, no tokenizer/shingle
    expressions (the signature pass must not appear at query time)."""
    plans.QUERIES["llm_minhash_lsh_pairs_stored"].fn(spark, SF_ORACLE)
    df = plans.QUERIES["llm_minhash_lsh_pairs_stored"].fn(spark, SF_ORACLE)
    plan = _plan(df)
    assert "documents.parquet" not in plan, "query path re-reads the corpus"
    assert "regexp" not in plan and "split" not in plan, (
        "query path re-tokenizes"
    )
    assert "md5" not in plan, "query path re-hashes signatures"


def test_stored_plan_bucket_assembly_is_exchange_free(spark):
    """The bucketed layout pre-paid the (band_idx, key) shuffle: the
    only Exchange allowed in the whole read plan is the final
    pair-count aggregate over the expanded candidate pairs."""
    plans.QUERIES["llm_minhash_lsh_pairs_stored"].fn(spark, SF_ORACLE)
    df = plans.QUERIES["llm_minhash_lsh_pairs_stored"].fn(spark, SF_ORACLE)
    plan = _plan(df, "simple")
    assert plan.count("Exchange") == 1, plan


def test_store_reused_across_invocations(spark):
    """Second invocation for the same corpus must reuse the store —
    the band files' mtime does not change."""
    base, _tag = _minhash_store(SF_ORACLE)
    plans.QUERIES["llm_minhash_lsh_pairs_stored"].fn(spark, SF_ORACLE)
    marker = os.path.join(base, "_SUCCESS")
    t0 = os.path.getmtime(marker)
    plans.QUERIES["llm_minhash_lsh_pairs_stored"].fn(spark, SF_ORACLE)
    assert os.path.getmtime(marker) == t0


def test_store_reattaches_in_fresh_catalog(spark):
    """The files survive the session, the catalog entry does not: with
    the table dropped (a fresh session's state) but valid files on
    disk, the query must re-attach — with bucket metadata intact, so
    the exchange-free plan survives re-attachment — instead of
    rewriting."""
    base, tag = _minhash_store(SF_ORACLE)
    table = f"mh_bands_{tag}"
    plans.QUERIES["llm_minhash_lsh_pairs_stored"].fn(spark, SF_ORACLE)
    marker = os.path.join(base, "_SUCCESS")
    t0 = os.path.getmtime(marker)
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    df = plans.QUERIES["llm_minhash_lsh_pairs_stored"].fn(spark, SF_ORACLE)
    assert os.path.getmtime(marker) == t0, "re-attach rewrote the store"
    assert _plan(df, "simple").count("Exchange") == 1
