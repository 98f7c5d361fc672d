"""LSH bucket caps — the 100 TB mega-bucket guard.

A mass-duplicate cluster (boilerplate pages, identical embeddings) lands
every member in ONE LSH bucket; pair expansion there is quadratic in the
cluster size and materializes as a single executor row holding the whole
cluster and its pair array — the classic LSH OOM. Both pair generators
cap bucket size before pairing; these tests pin the bound with a
synthetic mass-duplicate cluster and prove normal corpora are unchanged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_contract_database_builder_spark.plans.llm_ops import (
    ann_cosine_pairs,
    minhash_candidate_pairs,
    _tokens,
)

from conftest import SF_SMOKE


def _mass_dup_tokens(spark, n_docs: int):
    """n_docs identical documents → every band bucket holds all of them."""
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate page body repeated verbatim for every "
              "single document in this synthetic mass duplicate cluster")
        .alias("text"),
    )
    return docs.select("doc_id", _tokens().alias("t"))


def test_minhash_mass_dup_cluster_is_dropped_by_the_cap(spark):
    toked = _mass_dup_tokens(spark, 200)
    # uncapped, 200 identical docs would emit C(200,2) = 19900 pairs per
    # band; with the cap the overflowing buckets drop whole
    assert minhash_candidate_pairs(toked, bucket_cap=64).count() == 0


def test_minhash_cap_bounds_pairs_not_semantics(spark):
    toked = _mass_dup_tokens(spark, 20)
    capped = minhash_candidate_pairs(toked, bucket_cap=64)
    # 20 < cap: the full clique survives, sharing all 4 bands
    rows = capped.collect()
    assert len(rows) == 20 * 19 // 2
    assert all(r["n_shared_bands"] == 4 for r in rows)


def test_minhash_cap_leaves_normal_corpus_unchanged(spark):
    from smart_contract_database_builder_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    toked = docs.select("doc_id", _tokens().alias("t"))
    capped = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in minhash_candidate_pairs(toked, bucket_cap=64).collect()
    }
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in minhash_candidate_pairs(toked, bucket_cap=1 << 30).collect()
    }
    assert capped == uncapped


def test_ann_mass_dup_cluster_is_dropped_by_the_cap(spark):
    vec = [float((i % 7) - 3) / 4.0 for i in range(64)]
    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.lit(vec).cast("array<float>").alias("embedding"),
    )
    # 50 identical vectors share one sign bucket → capped out entirely
    assert ann_cosine_pairs(emb, bucket_cap=16).count() == 0
    # a cap above the cluster admits the full clique at cosine 1.0
    clique = ann_cosine_pairs(emb, bucket_cap=64)
    assert clique.count() == 50 * 49 // 2
