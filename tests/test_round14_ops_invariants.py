"""Mathematical invariants of the round-14 operators.

The oracle-parity sweep proves Spark == DuckDB; these pin that both
are RIGHT — each operator's defining inequality/identity holds on the
real corpus, so a same-bug-both-engines regression cannot hide behind
parity.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark import plans
from smart_contract_database_builder_spark.sources.tables import load_table

from conftest import SF_ORACLE


def _rows(spark, name):
    return plans.QUERIES[name].fn(spark, SF_ORACLE).collect()


def test_truncation_curve_is_monotone(spark):
    """A larger cap can only truncate fewer docs and drop fewer
    tokens; every row's totals agree; drop_share is the exact ratio."""
    rows = sorted(_rows(spark, "llm_truncation_loss_curve"),
                  key=lambda r: r.cap)
    totals = {r.tokens_total for r in rows}
    n_docs = {r.n_docs for r in rows}
    assert len(totals) == 1 and len(n_docs) == 1
    for a, b in zip(rows, rows[1:]):
        assert a.n_docs_truncated >= b.n_docs_truncated
        assert a.tokens_dropped >= b.tokens_dropped
    for r in rows:
        assert 0 <= r.tokens_dropped <= r.tokens_total
        assert abs(r.drop_share - r.tokens_dropped / r.tokens_total) < 1e-15
    # non-vacuous: the smallest cap must actually truncate something
    assert rows[0].n_docs_truncated > 0


def test_upsample_plan_respects_cap_and_shares_sum_to_one(spark):
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _UPSAMPLE_CAP,
    )

    rows = _rows(spark, "llm_upsample_plan_integer")
    assert rows
    t_max = max(r.n_tokens for r in rows)
    for r in rows:
        assert 1 <= r.repeats <= _UPSAMPLE_CAP
        assert r.upsampled_tokens == r.repeats * r.n_tokens
        # the largest source is never upsampled
        if r.n_tokens == t_max:
            assert r.repeats == 1
        # integer plan: repeats = min(cap, max(1, t_max // n_tokens))
        assert r.repeats == min(_UPSAMPLE_CAP, max(1, t_max // r.n_tokens))
    assert abs(sum(r.achieved_share for r in rows) - 1.0) < 1e-12
    assert abs(sum(r.target_share for r in rows) - 1.0) < 1e-12


def test_ablation_matrix_counts_are_consistent(spark):
    """Pairs are symmetric-complete (all 6 unordered), each cell's
    counts bound each other, and the per-filter violation totals are
    consistent across every pair that mentions the filter."""
    rows = _rows(spark, "llm_filter_ablation_matrix")
    assert len(rows) == 6
    totals = {}
    for r in rows:
        assert r.n_both >= 0 and r.n_only_a >= 0 and r.n_only_b >= 0
        union = r.n_both + r.n_only_a + r.n_only_b
        if union:
            assert abs(r.overlap_jaccard - r.n_both / union) < 1e-15
        else:
            assert r.overlap_jaccard == 0.0
        for name, n in ((r.filter_a, r.n_both + r.n_only_a),
                        (r.filter_b, r.n_both + r.n_only_b)):
            assert totals.setdefault(name, n) == n, (
                f"{name}: inconsistent violation total across pairs"
            )
    assert set(totals) == {"len_rule", "mwl_rule", "rep_rule", "stop_rule"}
    # non-vacuous: at least one filter rejects something on the corpus
    assert any(n > 0 for n in totals.values())


def test_kmv_estimate_brackets_exact_count(spark):
    """KMV with k=64 has relative standard error ~1/sqrt(k-2) ≈ 13%;
    assert the estimate lands within 5 RSE of exact (a same-bug
    regression like hashing the doc instead of the shingle lands
    orders of magnitude away), and rel_err is the exact ratio."""
    rows = _rows(spark, "llm_kmv_distinct_audit")
    assert rows
    for r in rows:
        assert r.n_exact > 0
        assert abs(r.rel_err - (r.est_kmv - r.n_exact) / r.n_exact) < 1e-12
        if r.n_exact >= 64:
            assert abs(r.rel_err) < 5 / (64 - 2) ** 0.5, r
        else:
            assert r.est_kmv == float(r.n_exact)


def test_media_length_histogram_covers_the_corpus(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    n_docs = docs.count()
    rows = _rows(spark, "llm_media_length_integrity")
    assert sum(r.n for r in rows) == n_docs
    for r in rows:
        assert 8 <= r.n_blocks <= 12
        assert r.bytes_each == 16 * r.n_blocks
        assert r.bytes_total == r.n * r.bytes_each
    # all three kinds and all five block counts appear
    assert {r.kind for r in rows} == {"image", "audio", "video"}
    assert {r.n_blocks for r in rows} == {8, 9, 10, 11, 12}


def test_ann_sweep_is_monotone_in_plane_count(spark):
    """Fewer planes merge buckets: bucket count rises with nbits while
    max bucket size and candidate volume fall; the 8-bit row must
    agree with the standing hyperplane-bucket query."""
    rows = sorted(_rows(spark, "llm_ann_bucket_width_sweep"),
                  key=lambda r: r.nbits)
    assert [r.nbits for r in rows] == [4, 6, 8]
    for a, b in zip(rows, rows[1:]):
        assert a.n_buckets <= b.n_buckets
        assert a.max_bucket >= b.max_bucket
        assert (a.candidate_pairs + a.pairs_suppressed
                >= b.candidate_pairs + b.pairs_suppressed)
    full = {r.bucket: r.n_vecs
            for r in _rows(spark, "llm_ann_hyperplane_buckets")}
    r8 = rows[-1]
    assert r8.n_buckets == len(full)
    assert r8.max_bucket == max(full.values())
    expected_pairs = sum(v * (v - 1) // 2 for v in full.values()
                         if 1 < v <= 1024)
    assert r8.candidate_pairs == expected_pairs


def test_decon_sweep_flags_shrink_with_gram_size(spark):
    """Longer grams can only flag fewer docs (an n+1-gram hit implies
    two n-gram hits), and the sweep's n=4 row must equal the standing
    decontaminate operator's flagged-doc count."""
    rows = sorted(_rows(spark, "llm_decontaminate_ngram_sweep"),
                  key=lambda r: r.n)
    assert [r.n for r in rows] == [3, 4, 5]
    for a, b in zip(rows, rows[1:]):
        assert a.n_flagged_docs >= b.n_flagged_docs
        assert a.n_hit_occurrences >= b.n_hit_occurrences
    assert rows[0].n_flagged_docs > 0  # non-vacuous
    standing = len(_rows(spark, "llm_decontaminate_overlap"))
    assert rows[1].n_flagged_docs == standing


def test_state_audit_open_windows_shrink_with_delay(spark):
    """A longer watermark delay keeps MORE windows open (state is
    evicted later); totals agree across rows; the open set is never
    empty (the newest window is always open) nor the whole corpus."""
    rows = sorted(_rows(spark, "stream_watermark_state_audit"),
                  key=lambda r: r.w_hours)
    assert [r.w_hours for r in rows] == [1, 6, 24]
    totals = {r.n_windows_total for r in rows}
    assert len(totals) == 1
    for a, b in zip(rows, rows[1:]):
        assert a.n_windows_open <= b.n_windows_open
        assert a.n_events_open <= b.n_events_open
    for r in rows:
        assert 1 <= r.n_windows_open <= r.n_windows_total
        assert abs(r.open_share
                   - r.n_windows_open / r.n_windows_total) < 1e-15


def test_rare_tail_mass_is_monotone_and_zipf_shaped(spark):
    """Larger k can only include more types/mass; shares are exact
    ratios; and the Zipf signature holds: the k=1 type share far
    exceeds its mass share (most types are rare, most mass is not)."""
    rows = _rows(spark, "llm_rare_token_tail_mass")
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert by_lang
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.k)
        assert [r.k for r in rs] == [1, 2, 5]
        for a, b in zip(rs, rs[1:]):
            assert a.n_rare_types <= b.n_rare_types
            assert a.n_rare_tokens <= b.n_rare_tokens
        for r in rs:
            assert r.n_rare_tokens >= r.n_rare_types  # each type occurs >= 1
            assert 0.0 <= r.mass_share <= r.type_share <= 1.0, (lang, r)


def test_bigram_entropy_bounds(spark):
    """Conditioning never hurts: 0 <= H(next|prev), and H(W1,W2) <=
    H(W1) + H(W2) gives cond <= log(vocab); also cond entropy is
    bounded by log of bigram types and prev entropy is positive on a
    diverse corpus."""
    import math

    rows = _rows(spark, "llm_bigram_entropy_rate")
    assert rows
    for r in rows:
        assert r.n_bigrams >= r.n_bigram_types > 0
        # micro-nat flooring can push a degenerate-group value a hair
        # below zero; one micro-nat is the guard band
        assert r.cond_entropy_nats >= -1e-6, r
        assert r.prev_entropy_nats >= -1e-6, r
        assert r.cond_entropy_nats <= math.log(r.n_bigram_types) + 1e-6
        # joint entropy = prev + cond <= log(n_bigram_types)
        assert (r.prev_entropy_nats + r.cond_entropy_nats
                <= math.log(r.n_bigram_types) + 1e-6)


def test_shard_merge_lateness_is_ordered_and_nonvacuous(spark):
    """Under the hash-shuffled arrival model roughly half the events
    arrive behind the high-water mark; percentiles are ordered and the
    share is the exact ratio. (The NATIVE arrival order is perfectly
    time-sorted in this corpus — T15 reports zero late — which is
    exactly why the sizing operator needs the disorder model.)"""
    (r,) = _rows(spark, "stream_shard_merge_lateness")
    assert 0 < r.n_late < r.n_events
    # a full hash shuffle leaves nearly everything behind the HWM (the
    # max arrives early in expectation) — but never literally all: the
    # first arrival has no predecessor, and each new running max is
    # on time by definition
    assert 0.5 < r.late_share < 1.0
    assert abs(r.late_share - r.n_late / r.n_events) < 1e-15
    assert 0 < r.p50_late_us <= r.p90_late_us <= r.p99_late_us <= r.max_late_us


def test_burstiness_is_bounded_and_consistent(spark):
    """B = (σ−μ)/(σ+μ) ∈ [−1, 1); recompute per customer from the raw
    order dates in Python and compare bitwise-ish."""
    import math

    rows = _rows(spark, "agg_customer_interarrival_burstiness")
    assert rows
    orders = load_table(spark, SF_ORACLE, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    ).collect()
    by_cust = {}
    for r in orders:
        by_cust.setdefault(r.o_custkey, []).append(
            (r.o_orderdate, r.o_orderkey)
        )
    got = {r.custkey: r for r in rows}
    n_checked = 0
    for cust, seq in by_cust.items():
        seq.sort()
        gaps = [(b[0] - a[0]).days for a, b in zip(seq, seq[1:])]
        if len(gaps) < 4:
            assert cust not in got
            continue
        r = got[cust]
        assert r.n_orders == len(gaps) + 1
        n, sg, sg2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
        sig_n = math.sqrt(n * sg2 - sg * sg)
        assert abs(r.mean_gap_days - sg / n) < 1e-12
        assert abs(r.burstiness - (sig_n - sg) / (sig_n + sg)) < 1e-12
        assert -1.0 <= r.burstiness < 1.0
        n_checked += 1
    assert n_checked == len(got) > 0


def test_norm_length_correlation_bounded(spark):
    (r,) = _rows(spark, "llm_norm_length_correlation")
    assert r.n_pairs > 0
    assert -1.0 <= r.pearson_r <= 1.0


def test_shard_curve_imbalance_grows_as_shards_shrink_docs(spark):
    """More shards → fewer docs per shard → worse balls-in-bins
    imbalance: max/mean must not decrease with shard count; totals
    conserved; all shards used at these corpus sizes."""
    rows = sorted(_rows(spark, "llm_shard_count_balance_curve"),
                  key=lambda r: r.n_shards)
    assert [r.n_shards for r in rows] == [16, 64, 256]
    totals = {r.tokens_total for r in rows}
    assert len(totals) == 1
    for r in rows:
        # balls-in-bins: at small SF the 256-shard row legitimately
        # leaves some shards empty; most must still be hit
        assert r.n_shards // 2 < r.shards_used <= r.n_shards
        assert r.min_over_mean <= 1.0 <= r.max_over_mean
    assert rows[0].max_over_mean <= rows[-1].max_over_mean


def test_media_budget_matches_python_recompute(spark):
    from smart_contract_database_builder_spark.sources.multimodal import (
        media_from_documents,
    )

    rows = {r.kind: r for r in _rows(spark, "llm_media_sampling_budget")}
    media = media_from_documents(spark, SF_ORACLE).select(
        "media_id", "kind", "meta"
    ).collect()
    want = {}
    for m in media:
        if m.kind == "image":
            u = m.meta.width * m.meta.height
        elif m.kind == "audio":
            u = m.meta.duration_ms // 40
        else:
            u = (m.meta.duration_ms + 999) // 1000
        n, t = want.get(m.kind, (0, 0))
        want[m.kind] = (n + 1, t + u)
    assert set(rows) == set(want) == {"image", "audio", "video"}
    for kind, (n, t) in want.items():
        assert rows[kind].n_items == n
        assert rows[kind].total_units == t
        assert abs(rows[kind].mean_units - t / n) < 1e-12


def test_fingerprint_agreement_is_count_consistent(spark):
    """The agreement cell counts must reconcile with the two standing
    pair queries, and the recalls are the exact ratios."""
    (r,) = _rows(spark, "llm_fingerprint_method_agreement")
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _XSRC_J,
        _ngram_jaccard_pairs_stored,
    )

    n_j = (
        _ngram_jaccard_pairs_stored(spark, SF_ORACLE)
        .filter(f"jaccard >= {_XSRC_J}")
        .count()
    )
    n_s = len(_rows(spark, "llm_simhash_hamming_pairs"))
    assert r.n_both + r.n_jaccard_only == n_j
    assert r.n_both + r.n_simhash_only == n_s
    assert r.n_both > 0  # the two geometries agree on SOMETHING here
    if n_j:
        assert abs(r.simhash_recall_of_jaccard - r.n_both / n_j) < 1e-15
    if n_s:
        assert abs(r.jaccard_recall_of_simhash - r.n_both / n_s) < 1e-15


def test_fim_spans_form_a_partition(spark):
    """prefix >= 1, suffix >= 1, middle >= 0, lengths sum to n_tok,
    the plan is deterministic across runs, and the middle hash
    matches a Python recompute on a sample."""
    import hashlib

    rows = _rows(spark, "llm_fim_split_plan")
    assert rows
    for r in rows:
        assert r.prefix_len >= 1 and r.suffix_len >= 1 and r.middle_len >= 0
        assert r.prefix_len + r.middle_len + r.suffix_len == r.n_tok
    again = {r.doc_id: (r.prefix_len, r.middle_len, r.middle_hash)
             for r in _rows(spark, "llm_fim_split_plan")}
    for r in rows:
        assert again[r.doc_id] == (r.prefix_len, r.middle_len, r.middle_hash)
    # content check on a sample: re-slice the tokenized text in Python
    docs = {d.doc_id: d.text
            for d in load_table(spark, SF_ORACLE, "documents")
            .select("doc_id", "text").limit(4000).collect()}
    checked = 0
    for r in rows:
        if r.doc_id not in docs or checked >= 25:
            continue
        toks = docs[r.doc_id].strip().lower().split()
        middle = " ".join(toks[r.prefix_len:r.prefix_len + r.middle_len])
        assert hashlib.md5(middle.encode()).hexdigest() == r.middle_hash, r
        checked += 1
    assert checked >= 10


def test_trade_matrix_is_canonical_and_antisymmetric(spark):
    """Pairs are canonical (a < b), the net is exactly vol_ab - vol_ba,
    and the matrix reconciles with the standing Q7 query's bilateral
    pair summed over years."""
    rows = _rows(spark, "join_nation_trade_matrix")
    assert rows
    for r in rows:
        assert r.nation_a < r.nation_b
        assert abs(r.net_ab - (r.vol_ab - r.vol_ba)) < 1e-6
        assert r.n_lines_ab > 0
    q7 = _rows(spark, "agg_cross_nation_volume")
    vol = {}
    for q in q7:
        key = (q.supp_nation, q.cust_nation)
        vol[key] = vol.get(key, 0.0) + q.volume
    (pair_ab,) = [r for r in rows
                  if {r.nation_a, r.nation_b} == {"NATION_1", "NATION_2"}]
    assert abs(pair_ab.vol_ab - vol[("NATION_1", "NATION_2")]) < 1e-6
    assert abs(pair_ab.vol_ba - vol[("NATION_2", "NATION_1")]) < 1e-6


def test_padding_and_truncation_curves_partition_the_budget(spark):
    """For every ctx: tokens_used + tokens_dropped(F98) = corpus total,
    utilization rises as ctx shrinks, pad volume rises as ctx grows."""
    pad = {r.ctx: r for r in _rows(spark, "llm_padding_waste_curve")}
    trunc = {r.cap: r for r in _rows(spark, "llm_truncation_loss_curve")}
    assert set(pad) == set(trunc)
    for ctx, p in pad.items():
        t = trunc[ctx]
        assert p.tokens_used + t.tokens_dropped == t.tokens_total
        assert p.tokens_used + p.pad_tokens == p.n_docs * ctx
        assert abs(p.utilization
                   - p.tokens_used / (p.n_docs * ctx)) < 1e-15
    ordered = sorted(pad.values(), key=lambda r: r.ctx)
    for a, b in zip(ordered, ordered[1:]):
        assert a.utilization >= b.utilization
        assert a.pad_tokens <= b.pad_tokens


def test_token_mass_ledger_reconciles_with_doc_counts(spark):
    """Per-source flagged doc counts must sum to the standing J9
    query's flagged-doc total; token shares are exact ratios and
    bounded by the flag coverage."""
    rows = _rows(spark, "llm_decontaminate_token_mass")
    assert rows
    flagged_total = sum(r.n_docs_flagged for r in rows)
    standing = len(_rows(spark, "llm_decontaminate_overlap"))
    assert flagged_total == standing > 0
    for r in rows:
        assert 0 <= r.n_docs_flagged <= r.n_docs
        assert 0 <= r.tokens_flagged <= r.tokens_total
        assert abs(r.token_share_flagged
                   - r.tokens_flagged / r.tokens_total) < 1e-15


def test_shard_merge_lateness_approx_tracks_the_exact_anchor(spark):
    """The production (percentile_approx / t-digest) twin must agree
    with the exact anchor on the exact fields (counts, max) and land
    its approximate percentiles within the sketch's rank-error bound
    translated to value space (checked loosely: within 5% relative,
    far tighter than any sizing decision needs)."""
    (e,) = _rows(spark, "stream_shard_merge_lateness")
    (a,) = _rows(spark, "stream_shard_merge_lateness_approx")
    assert (a.n_events, a.n_late, a.max_late_us) == (
        e.n_events, e.n_late, e.max_late_us
    )
    assert a.late_share == e.late_share
    for f in ("p50_late_us", "p90_late_us", "p99_late_us"):
        exact, approx = getattr(e, f), getattr(a, f)
        assert abs(approx - exact) <= 0.05 * exact, (f, exact, approx)
