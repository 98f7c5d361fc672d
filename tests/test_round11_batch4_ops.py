"""Operator-level invariants for the round-11 batch-4/5 operators:
Matryoshka truncation audit, temperature mixture planner, blocklist
policy filter, Benford first-digit audit, LSH band-coverage curve and
the Gini concentration audit. Cross-engine value
parity lives in test_oracle_parity; these pin the properties the
oracle equality can't express (monotonicity, flattening, policy
consistency, distribution mass).
"""

import math

import pytest

from smart_contract_database_builder_spark.plans.llm_ops import (
    _BLOCK_DROP_DENOM,
    _BLOCK_REVIEW_DENOM,
    _MATRYOSHKA_KS,
    _MIX_ALPHAS,
    llm_blocklist_policy_filter,
    llm_domain_mix_temperature,
    llm_matryoshka_audit,
)
from smart_contract_database_builder_spark.plans.relational_ext import (
    agg_benford_first_digit,
)

SF = "/root/testdata/sf0.01"


def test_matryoshka_retained_is_monotone_and_bounded(spark):
    """Prefix distances are partial sums of nonneg terms, so
    d2_k8 <= d2_k16 <= d2_k32 <= orig_d2 and every retained_k sits in
    [0, 1] — the property that makes the audit readable as 'fraction
    of distance carried by the prefix'."""
    rows = llm_matryoshka_audit(spark, SF).collect()
    assert rows
    for r in rows:
        ks = list(_MATRYOSHKA_KS)
        seq = [r[f"d2_k{k}"] for k in ks] + [r.orig_d2]
        assert seq == sorted(seq), r
        for k in ks:
            assert 0.0 <= r[f"retained_k{k}"] <= 1.0, r


def test_matryoshka_leading_dims_carry_signal(spark):
    """On any non-degenerate corpus the 32-dim prefix of a 64-dim
    vector retains a nontrivial distance fraction on average (if this
    fails the slicing is off-by-one or reading the wrong end)."""
    import pyspark.sql.functions as F

    avg32 = (
        llm_matryoshka_audit(spark, SF)
        .agg(F.avg("retained_k32"))
        .collect()[0][0]
    )
    assert 0.2 < avg32 < 1.0


def test_mix_temperature_probabilities_normalize(spark):
    """Per alpha, the sampling probabilities sum to 1 (up to fp dust)
    and every source appears exactly once."""
    rows = llm_domain_mix_temperature(spark, SF).collect()
    for alpha in _MIX_ALPHAS:
        arm = [r for r in rows if r.alpha == alpha]
        srcs = [r.source for r in arm]
        assert len(srcs) == len(set(srcs))
        assert math.isclose(sum(r.p for r in arm), 1.0, rel_tol=1e-9)


def test_mix_temperature_flattens_with_lower_alpha(spark):
    """Lower temperature flattens the mixture: the max source
    probability is nonincreasing and the min is nondecreasing as alpha
    drops 1 -> 0.5 -> 0.25 — the reason the knob exists."""
    rows = llm_domain_mix_temperature(spark, SF).collect()
    maxes, mins = [], []
    for alpha in sorted(_MIX_ALPHAS, reverse=True):
        ps = [r.p for r in rows if r.alpha == alpha]
        maxes.append(max(ps))
        mins.append(min(ps))
    assert maxes == sorted(maxes, reverse=True)
    assert mins == sorted(mins)


def test_blocklist_policy_matches_ratio_gates(spark):
    """The policy bucket is exactly the integer cross-multiplied gate
    applied to (n_flagged, n_tok) — no float threshold drift — and the
    sf0.01 corpus exercises all three buckets."""
    rows = llm_blocklist_policy_filter(spark, SF).collect()
    seen = set()
    for r in rows:
        if r.n_flagged * _BLOCK_DROP_DENOM >= r.n_tok:
            want = "drop"
        elif r.n_flagged * _BLOCK_REVIEW_DENOM >= r.n_tok:
            want = "review"
        else:
            want = "keep"
        assert r.policy == want, r
        assert abs(r.flag_ratio - r.n_flagged / r.n_tok) < 1e-15
        seen.add(r.policy)
    assert seen == {"drop", "review", "keep"}


def test_benford_fractions_are_distributions(spark):
    """Observed and expected first-digit fractions each sum to 1 over
    the nine digits, and the expectation matches log10(1+1/d)."""
    rows = agg_benford_first_digit(spark, SF).collect()
    assert {r.digit for r in rows} == {str(d) for d in range(1, 10)}
    assert math.isclose(sum(r.obs_frac for r in rows), 1.0, rel_tol=1e-12)
    assert math.isclose(sum(r.exp_frac for r in rows), 1.0, rel_tol=1e-12)
    for r in rows:
        assert math.isclose(
            r.exp_frac, math.log10(1 + 1 / int(r.digit)), rel_tol=1e-12
        )
        assert math.isclose(r.deviation, r.obs_frac - r.exp_frac, abs_tol=1e-15)


def test_band_coverage_curve_is_cumulative_and_complete(spark):
    """cum_pairs is the running sum of new_pairs, the final coverage
    fraction is exactly 1.0, and the curve's total equals the
    production pair generator's candidate-pair count (same bands, same
    bucket cap — the curve is a decomposition of that set, not a
    different one)."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        llm_lsh_band_coverage,
        llm_minhash_lsh_pairs,
    )

    rows = sorted(
        llm_lsh_band_coverage(spark, SF).collect(),
        key=lambda r: r.first_band,
    )
    assert rows and all(0 <= r.first_band <= 3 for r in rows)
    run = 0
    for r in rows:
        assert r.new_pairs >= 1
        run += r.new_pairs
        assert r.cum_pairs == run
    assert rows[-1].coverage_frac == 1.0
    n_pairs = llm_minhash_lsh_pairs(spark, SF).count()
    assert rows[-1].cum_pairs == n_pairs


def test_gini_matches_pure_python_recompute(spark):
    """Per-nation Gini equals the textbook formula recomputed in pure
    Python from the same spend relation, and sits in [0, 1)."""
    import pyspark.sql.functions as F

    from smart_contract_database_builder_spark.functions.numeric import dec
    from smart_contract_database_builder_spark.plans.relational_ext import (
        agg_revenue_gini_by_nation,
    )
    from smart_contract_database_builder_spark.sources.tables import load_table

    got = {r.nation: r for r in agg_revenue_gini_by_nation(spark, SF).collect()}
    assert got and all(0.0 <= r.gini < 1.0 for r in got.values())

    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    n = load_table(spark, SF, "nation")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg((F.sum(dec("o_totalprice")) * 100).cast("long").alias("cents"))
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .select("n_name", "o_custkey", "cents")
        .collect()
    )
    by_nation = {}
    for r in spend:
        by_nation.setdefault(r.n_name, []).append((r.cents, r.o_custkey))
    for nation, xs in by_nation.items():
        xs.sort()
        nn = len(xs)
        sum_x = sum(x for x, _ in xs)
        sum_ix = sum((i + 1) * x for i, (x, _) in enumerate(xs))
        want = (2 * sum_ix - (nn + 1) * sum_x) / (nn * sum_x)
        assert got[nation].n_customers == nn
        assert abs(got[nation].gini - want) < 1e-12, nation


def test_survivorship_ledger_is_internally_consistent(spark):
    """Per source: kept <= exact <= entering (docs AND tokens), the
    fractions are the exact ratios, and the global exact-survivor
    count equals the content-key relation's distinct-key count (the
    two formulations of exact dedup must agree)."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        llm_dedup_survivorship,
        llm_exact_dedup_documents,
    )

    rows = llm_dedup_survivorship(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.kept_docs <= r.exact_docs <= r.n_docs, r
        assert 0 < r.kept_tokens <= r.exact_tokens <= r.n_tokens, r
        assert abs(r.kept_doc_frac - r.kept_docs / r.n_docs) < 1e-15
        assert abs(r.kept_token_frac - r.kept_tokens / r.n_tokens) < 1e-15
    n_keys = llm_exact_dedup_documents(spark, SF).count()
    assert sum(r.exact_docs for r in rows) == n_keys


def test_fd_profile_flags_real_violations(spark):
    """partkey->suppkey and suppkey->partkey must violate on TPC-H-ish
    data (multi-sourced parts / multi-part suppliers), the violation
    fraction is the exact ratio, and max_dep_per_det >= 2 whenever any
    determinant violates."""
    from smart_contract_database_builder_spark.plans.relational_ext import (
        agg_functional_dependencies,
    )

    rows = {r.fd: r for r in agg_functional_dependencies(spark, SF).collect()}
    assert set(rows) == {
        "l_orderkey -> l_suppkey",
        "l_partkey -> l_suppkey",
        "l_suppkey -> l_partkey",
    }
    for r in rows.values():
        assert 0 <= r.n_violating <= r.n_det_values
        assert abs(r.violation_frac - r.n_violating / r.n_det_values) < 1e-15
        if r.n_violating:
            assert r.max_dep_per_det >= 2
    assert rows["l_partkey -> l_suppkey"].n_violating > 0
    assert rows["l_suppkey -> l_partkey"].n_violating > 0


def test_event_drift_shares_are_distributions(spark):
    """Early and late shares each sum to 1, the drift column is their
    exact difference, and early+late counts cover every event."""
    from smart_contract_database_builder_spark.plans.relational_ext import (
        agg_event_drift_report,
    )
    from smart_contract_database_builder_spark.sources.tables import load_table

    rows = agg_event_drift_report(spark, SF).collect()
    assert rows
    assert abs(sum(r.share_early for r in rows) - 1.0) < 1e-12
    assert abs(sum(r.share_late for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert abs(r.share_drift - (r.share_late - r.share_early)) < 1e-15
        assert abs(
            r.smoothed_ratio - (r.n_late + 1) / (r.n_early + 1)
        ) < 1e-12
    total = sum(r.n_early + r.n_late for r in rows)
    assert total == load_table(spark, SF, "events").count()


def test_incremental_simhash_admission_is_radius_consistent(spark):
    """Admitted iff zero corpus neighbors within the Hamming radius;
    the batch slice is exactly doc_id % MOD == REM; both decisions
    appear on the sf0.01 corpus."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _INC_ND_MOD,
        _INC_ND_REM,
        llm_incremental_simhash,
    )

    rows = llm_incremental_simhash(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.doc_id % _INC_ND_MOD == _INC_ND_REM
        assert r.admitted == (r.n_corpus_within_radius == 0)
    decisions = {r.admitted for r in rows}
    assert decisions == {True, False}


def test_topic_assignment_matches_recount(spark):
    """The argmax topic, winner hit count and coverage agree with a
    pure-Python recount over the same tokenization."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _TOPICS,
        llm_topic_keyword_assignment,
    )
    from smart_contract_database_builder_spark.sources.tables import load_table

    got = {
        r.doc_id: r
        for r in llm_topic_keyword_assignment(spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    kw = {name: set(kws) for name, kws in _TOPICS}
    names = [name for name, _ in _TOPICS]
    seen_topics = set()
    for d in docs:
        toks = d.text.strip().lower().split()
        if not toks:
            continue
        hits = {n: sum(1 for t in toks if t in kw[n]) for n in names}
        if all(v == 0 for v in hits.values()):
            want = "unassigned"
        else:
            want = max(names, key=lambda n: (hits[n], -names.index(n)))
        r = got[d.doc_id]
        assert r.topic == want, (d.doc_id, r.topic, want, hits)
        assert r.n_topic_tokens == sum(hits.values())
        if want != "unassigned":
            assert r.n_hits == hits[want]
        seen_topics.add(r.topic)
    assert len(seen_topics) >= 3


def test_source_lang_entropy_bounds(spark):
    """0 <= H <= ln(n_langs) per source (within micro-nat quantization
    slack), and a single-language source has exactly H = 0."""
    import math

    from smart_contract_database_builder_spark.plans.llm_ops import (
        llm_source_lang_entropy,
    )

    rows = llm_source_lang_entropy(spark, SF).collect()
    assert rows
    for r in rows:
        assert -1e-5 <= r.lang_entropy_nats <= math.log(r.n_langs) + 1e-5, r
        if r.n_langs == 1:
            assert abs(r.lang_entropy_nats) < 1e-5
        assert 0 < r.majority_share <= 1.0


def test_setsim_exact_join_is_complete_vs_bruteforce(spark, oracle):
    """Prefix filtering must lose NOTHING: the join's pair set equals
    the brute-force all-pairs Jaccard >= 3/5 set (the property that
    separates it from the LSH family)."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        llm_setsim_join_exact,
    )

    got = {
        (r.doc_a, r.doc_b)
        for r in llm_setsim_join_exact(spark, SF).collect()
    }
    want = {
        (a, b)
        for a, b in oracle.execute(r"""
            WITH sh AS (SELECT DISTINCT doc_id, s FROM (
              SELECT doc_id, unnest(CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t)-1),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE [] END) AS s
              FROM (SELECT doc_id,
                           string_split_regex(trim(lower(text)), '\s+') AS t
                    FROM documents))),
            sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
            p AS (SELECT x.doc_id a, y.doc_id b, COUNT(*) o
                  FROM sh x JOIN sh y ON y.s = x.s AND x.doc_id < y.doc_id
                  GROUP BY 1, 2)
            SELECT a, b FROM p
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE 5 * o >= 3 * (sa.n + sb.n - o)
        """).fetchall()
    }
    assert got == want and len(got) > 0
