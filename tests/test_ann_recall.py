"""Analytic recall check for the hyperplane-LSH ANN candidate stage.

A single 8-plane sign bucket recovers a pair with cosine c with
probability p(c) = (1 - acos(c)/π)^8 — the standard SimHash/LSH
collision bound for random hyperplanes. The deterministic md5-derived
planes are data-independent, so over the ~10^3 true pairs of the test
corpus the number of recovered pairs must match the analytic
expectation Σ p(c_i) within a few binomial standard deviations
(measured at sf0.01: observed 19 vs E = 19.1, σ = 4.3).

This is a distribution-level correctness check of the bucket function
itself: a broken plane dot (all-same bucket) recovers ~ALL pairs, a
scrambled hash recovers ~990/256 ≈ 4 — both far outside the band. It
also documents honestly that ONE table at 8 planes is a low-recall
configuration at cosine 0.3; production recall comes from running R
independent tables (1-(1-p)^R) or fewer planes, both linear cost knobs
on the same plan shape.
"""

from __future__ import annotations

import math

from smart_contract_database_builder_spark import plans

from conftest import SF_ORACLE

_THRESHOLD = 0.3
_PLANES = 8

_EXACT_PAIRS_SQL = f"""
WITH n AS (
  SELECT vec_id, embedding,
         sqrt(list_aggregate(
           list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
           'sum')) AS nrm
  FROM embeddings
),
p AS (
  SELECT x.vec_id a, y.vec_id b,
         list_aggregate(list_transform(list_zip(x.embedding, y.embedding),
            z -> CAST(z[1] AS DOUBLE) * z[2]), 'sum') / (x.nrm * y.nrm) AS c
  FROM n x JOIN n y ON x.vec_id < y.vec_id
)
SELECT a, b, c FROM p WHERE c >= {_THRESHOLD}
"""


def _collision_prob(cosine: float) -> float:
    return (1.0 - math.acos(min(1.0, cosine)) / math.pi) ** _PLANES


def test_ann_candidate_recall_matches_lsh_theory(spark, oracle):
    truth = oracle.execute(_EXACT_PAIRS_SQL).fetchall()
    assert len(truth) >= 100, "ground truth too small to quantify recall"
    probs = [_collision_prob(c) for _, _, c in truth]
    expect = sum(probs)
    sigma = math.sqrt(sum(p * (1 - p) for p in probs))

    got = plans.QUERIES["llm_ann_bucketed_cosine_pairs"].fn(
        spark, SF_ORACLE
    ).collect()
    got_pairs = {(int(r.vec_a), int(r.vec_b)) for r in got}
    true_pairs = {(int(a), int(b)) for a, b, _ in truth}
    observed = len(got_pairs & true_pairs)

    assert abs(observed - expect) <= 4 * sigma + 2, (
        f"ANN recovered {observed} of {len(truth)} true pairs; analytic "
        f"expectation {expect:.1f} ± {sigma:.1f} — the bucket function "
        "does not behave like {0}-plane hyperplane LSH".format(_PLANES)
    )
    # and every emitted pair must be a true pair (precision 1.0: exact
    # cosine is computed within the bucket before the threshold filter)
    assert got_pairs <= true_pairs


def test_multitable_ann_recall_matches_lsh_theory(spark, oracle):
    """R independent tables lift per-pair recall to 1-(1-p)^R; the
    measured recovery must sit in the analytic band AND strictly beat
    the single table's expectation (the whole point of the variant)."""
    truth = oracle.execute(_EXACT_PAIRS_SQL).fetchall()
    r_tables = 4
    probs = [
        1.0 - (1.0 - _collision_prob(c)) ** r_tables for _, _, c in truth
    ]
    expect = sum(probs)
    sigma = math.sqrt(sum(p * (1 - p) for p in probs))

    got = plans.QUERIES["llm_ann_multitable_pairs"].fn(
        spark, SF_ORACLE
    ).collect()
    got_pairs = {(int(r.vec_a), int(r.vec_b)) for r in got}
    true_pairs = {(int(a), int(b)) for a, b, _ in truth}
    observed = len(got_pairs & true_pairs)

    single_expect = sum(_collision_prob(c) for _, _, c in truth)
    assert expect > 2 * single_expect  # the analytic lift is real
    assert abs(observed - expect) <= 4 * sigma + 2, (
        f"multi-table ANN recovered {observed}; expectation "
        f"{expect:.1f} ± {sigma:.1f} (single-table {single_expect:.1f})"
    )
    assert got_pairs <= true_pairs  # precision still 1.0
