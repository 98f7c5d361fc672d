"""Mathematical invariants of the round-12 operators.

The oracle-parity sweep proves Spark == DuckDB; these pin that both
are RIGHT — each operator's defining inequality/identity holds on the
real corpus, so a same-bug-both-engines regression cannot hide behind
parity.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark import plans

from conftest import SF_ORACLE


def _rows(spark, name):
    return plans.QUERIES[name].fn(spark, SF_ORACLE).collect()


def test_bloom_rejections_decompose_exactly(spark):
    """A true duplicate ALWAYS rejects (its key's positions were set by
    the existing copy), so n_rejected = n_true_dup + n_false_positive
    per source — the accounting identity of the audit."""
    for r in _rows(spark, "llm_bloom_dedup_audit"):
        assert r.n_rejected == r.n_true_dup + r.n_false_positive, r
        assert 0.0 <= r.fp_rate <= 1.0


def test_hhi_bounded_by_floor_and_one(spark):
    """Cauchy-Schwarz: Σshare² ≥ 1/n for any shares summing to 1; and
    ≤ 1 always."""
    for r in _rows(spark, "agg_supplier_concentration_hhi"):
        assert r.hhi_floor - 1e-12 <= r.hhi <= 1.0 + 1e-12, r


def test_pareto_bands_are_monotone(spark):
    rows = {r.band: r for r in _rows(spark, "agg_customer_pareto_share")}
    assert rows["1%"].revenue_share <= rows["10%"].revenue_share
    assert rows["10%"].revenue_share <= rows["20%"].revenue_share
    assert rows["20%"].revenue_share <= 1.0 + 1e-12
    assert rows["1%"].n_customers <= rows["10%"].n_customers
    assert rows["10%"].n_customers <= rows["20%"].n_customers
    # the whole point of the report: the top slice is outsized
    assert rows["1%"].revenue_share > 0.01


def test_js_divergence_bounded(spark):
    """JS ∈ [0, ln 2]; the micro-nat floor may undershoot by ≤1e-6 per
    term-mass unit, never overshoot."""
    for r in _rows(spark, "llm_js_divergence_source_pairs"):
        assert -1e-5 <= r.js_nats <= math.log(2) + 1e-12, r


def test_heaps_beta_in_unit_interval(spark):
    """V ≤ N ⇒ β = lnV/lnN ≤ 1; a nonempty vocabulary ⇒ β > 0."""
    for r in _rows(spark, "llm_heaps_law_by_source"):
        assert 0.0 < r.heaps_beta <= 1.0, r
        assert 0.0 <= r.hapax_frac <= 1.0
        assert r.n_hapax <= r.n_types <= r.n_tokens


def test_variance_spectrum_cum_share_monotone_to_one(spark):
    rows = sorted(
        _rows(spark, "llm_embedding_variance_spectrum"),
        key=lambda r: r.rnk,
    )
    prev = 0.0
    for r in rows:
        assert r.cum_share >= prev - 1e-15, r
        prev = r.cum_share
    assert rows[-1].cum_share == 1.0  # total_q/total_q is exactly 1.0


def test_shard_balance_shares_partition_unity(spark):
    rows = _rows(spark, "llm_shard_balance_report")
    assert 0 < len(rows) <= 16
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r.balance_ratio > 0


def test_char_classes_partition_the_text(spark):
    for r in _rows(spark, "llm_char_class_profile"):
        total = r.n_letters + r.n_digits + r.n_spaces + r.n_other
        assert total > 0
        assert abs(r.other_frac - r.n_other / total) < 1e-12


def test_reorder_gap_percentiles_ordered(spark):
    (r,) = _rows(spark, "agg_reorder_gap_distribution")
    assert r.n_gaps > 0 and r.n_repeat_customers > 0
    assert 0 <= r.median_gap_days <= r.p90_gap_days


def test_embedding_admission_flag_matches_neighbor_count(spark):
    rows = _rows(spark, "llm_incremental_embedding_admission")
    assert len(rows) > 0
    for r in rows:
        assert r.admitted == (r.n_corpus_neighbors == 0), r


def test_bbit_match_dominates_full_match(spark):
    """Equal full components ⇒ equal low nibbles, never the reverse —
    so n_match_b4 ≥ n_match_full on every pair, and the debiased
    estimate stays ≤ 1."""
    rows = _rows(spark, "llm_minhash_bbit_audit")
    assert len(rows) > 0
    for r in rows:
        assert r.n_match_b4 >= r.n_match_full, r
        assert r.est_b4 <= 1.0 + 1e-12
        assert 0.0 <= r.est_full <= 1.0


def test_daily_anomaly_flag_matches_cutoff(spark):
    for r in _rows(spark, "agg_event_daily_anomaly"):
        if r.robust_z is None:
            assert not r.is_anomaly
        else:
            assert r.is_anomaly == (abs(r.robust_z) > 3.5), r


def test_ltv_identity_revenue_equals_share_times_size(spark):
    for r in _rows(spark, "agg_customer_ltv_cohorts"):
        assert r.month_offset >= 0
        assert abs(r.ltv_per_customer * r.cohort_size - r.revenue) < 1e-6


def test_centroid_shift_geometry_bounded(spark):
    for r in _rows(spark, "llm_centroid_shift_by_label"):
        assert -1.0 - 1e-12 <= r.cosine_to_global <= 1.0 + 1e-12
        assert r.norm_ratio > 0


def test_window_topk_keeps_at_most_three_per_window(spark):
    import collections

    per = collections.Counter()
    for r in _rows(spark, "stream_window_topk_events"):
        assert 1 <= r.rnk <= 3
        per[r.window_start] += 1
    assert per and max(per.values()) <= 3


def test_norm_outlier_share_consistent(spark):
    for r in _rows(spark, "llm_embedding_norm_outliers"):
        assert 0 <= r.n_outliers <= r.n_vecs
        assert abs(r.outlier_share - r.n_outliers / r.n_vecs) < 1e-12
        assert r.mad_norm >= 0


def test_unique_ngram_ratio_bounded(spark):
    for r in _rows(spark, "llm_unique_ngram_ratio"):
        assert 0 < r.n_unique <= r.n_grams
        assert abs(r.unique_ratio - r.n_unique / r.n_grams) < 1e-12
