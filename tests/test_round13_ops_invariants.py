"""Mathematical invariants of the round-13 operators.

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


def test_backlog_is_conserved(spark):
    """The sweep line conserves flow: backlog_t = Σ opened - Σ closed
    up to t, never negative, and the final day's backlog is total
    opened minus total closed (= 0 when every span closes in range)."""
    rows = sorted(_rows(spark, "agg_orders_backlog_timeseries"),
                  key=lambda r: r.day)
    run = 0
    for r in rows:
        run += r.n_opened - r.n_closed
        assert r.backlog == run, (r.day, r.backlog, run)
        assert r.backlog >= 0, r
    assert sum(r.n_opened for r in rows) == sum(r.n_closed for r in rows)


def test_referential_integrity_edges_complete_and_bounded(spark):
    rows = {r.edge: r for r in _rows(spark, "agg_referential_integrity_audit")}
    assert len(rows) == 7
    for r in rows.values():
        assert 0 <= r.n_orphans <= r.n_child, r
        assert abs(r.orphan_rate - r.n_orphans / r.n_child) < 1e-15
    # child counts must equal the raw table sizes (no rows lost to the join)
    li = load_table(spark, SF_ORACLE, "lineitem").count()
    assert rows["lineitem.l_orderkey->orders"].n_child == li
    assert rows["lineitem.l_partkey->part"].n_child == li


def test_threshold_sweep_is_antitone(spark):
    """Raising the cutoff can only shrink the surviving set."""
    rows = sorted(_rows(spark, "llm_dedup_threshold_sweep"),
                  key=lambda r: r.threshold)
    for lo, hi in zip(rows, rows[1:]):
        assert hi.n_pairs <= lo.n_pairs, (lo, hi)
        assert hi.n_docs_removed <= lo.n_docs_removed, (lo, hi)
    for r in rows:
        assert r.n_docs_removed <= r.n_pairs or r.n_pairs == 0
        assert 0.0 <= r.removed_share <= 1.0


def test_semantic_outliers_bounded_and_consistent(spark):
    for r in _rows(spark, "llm_semantic_outlier_docs"):
        assert -1.0 - 1e-12 <= r.median_cos <= 1.0 + 1e-12, r
        assert r.mad_cos >= 0.0, r
        assert 0 <= r.n_outliers <= r.n_vecs, r
        assert abs(r.outlier_share - r.n_outliers / r.n_vecs) < 1e-15


def test_sign_hamming_topk_agrees_with_numpy(spark):
    """Third implementation: recompute the sketch + Hamming ranking
    from the raw parquet in numpy and pin the returned top-10 set."""
    import numpy as np

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_ORACLE, "embeddings").collect()
    }
    from decimal import Decimal, ROUND_HALF_UP

    def iscale(v: float) -> int:
        # exact binary value -> DECIMAL(18,6) HALF_UP, the engines' cast
        return int(
            Decimal(float(v)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            ) * 1_000_000
        )

    def sketch(v):
        return np.array([iscale(x) >= 0 for x in v])

    q = sketch(emb[7])
    ham = {
        vid: int((sketch(v) != q).sum())
        for vid, v in emb.items()
        if vid != 7
    }
    want = sorted(ham, key=lambda vid: (ham[vid], vid))[:10]
    got = [r.vec_id for r in _rows(spark, "llm_sign_hamming_topk")]
    assert got == want
    for r in _rows(spark, "llm_sign_hamming_topk"):
        assert 0 <= r.hamming <= 64
        assert -1.0 - 1e-12 <= r.cosine <= 1.0 + 1e-12


def test_cross_source_matrix_shares_sum_to_one(spark):
    rows = _rows(spark, "llm_cross_source_neardup_matrix")
    assert rows, "no near-dup pairs at the cutoff — vacuous matrix"
    assert abs(sum(r.pair_share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r.source_a <= r.source_b, r
        assert r.n_pairs >= 1


def test_watermark_lateness_is_antitone_in_delay(spark):
    rows = sorted(_rows(spark, "stream_watermark_late_audit"),
                  key=lambda r: r.w_hours)
    assert [r.w_hours for r in rows] == [1, 6, 24]
    for lo, hi in zip(rows, rows[1:]):
        assert hi.n_late <= lo.n_late, (lo, hi)
    for r in rows:
        assert 0.0 <= r.late_share < 1.0


def test_watermark_prefix_scan_matches_sequential(spark):
    """The two-level distributed prefix scan must equal the sequential
    definition — recompute lateness counts in pure Python over the raw
    parquet (arrival order = event_id)."""
    ev = sorted(
        (r.event_id, r.us)
        for r in load_table(spark, SF_ORACLE, "events")
        .selectExpr("event_id", "unix_micros(ts) AS us")
        .collect()
    )
    best = None
    late = {1: 0, 6: 0, 24: 0}
    for _eid, us in ev:
        if best is not None:
            for h, w in ((1, 3_600_000_000), (6, 21_600_000_000),
                         (24, 86_400_000_000)):
                if best - us > w:
                    late[h] += 1
        best = us if best is None else max(best, us)
    got = {r.w_hours: r.n_late for r in _rows(spark, "stream_watermark_late_audit")}
    assert got == late


def test_ivf_cell_balance_accounts_for_every_vector(spark):
    rows = _rows(spark, "llm_ivf_cell_balance")
    n_all = load_table(spark, SF_ORACLE, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_all
    assert abs(sum(r.size_share for r in rows) - 1.0) < 1e-9
    mean_ratio = sum(r.balance_ratio for r in rows) / len(rows)
    assert abs(mean_ratio - 1.0) < 1e-9  # ratios average to 1 by definition


def test_brand_affinity_counts_bounded_by_marginals(spark):
    from pyspark.sql import functions as F

    li = load_table(spark, SF_ORACLE, "lineitem")
    part = load_table(spark, SF_ORACLE, "part")
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    marg = {r.p_brand: r.n for r in
            ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in _rows(spark, "agg_brand_affinity_lift"):
        assert r.n_both <= min(marg[r.brand_a], marg[r.brand_b]), r
        assert r.lift > 0


def test_cusum_is_nonnegative_and_resets(spark):
    rows = _rows(spark, "window_cusum_drift_alarm")
    assert rows
    by_type: dict[str, int] = {}
    for r in rows:
        assert r.cusum >= -1e-12, r
        by_type[r.event_type] = by_type.get(r.event_type, 0) + 1
    # the closed form S_t - min prefix hits exactly 0 whenever the
    # running sum makes a new low — every type must touch 0 at least
    # once (its first new-low day)
    for t in by_type:
        zeros = [r for r in rows if r.event_type == t and r.cusum == 0.0]
        assert zeros, f"{t}: cusum never touches 0"


def test_embedding_coverage_identities(spark):
    (r,) = _rows(spark, "llm_embedding_coverage_audit")
    assert r.n_embedded <= min(r.n_docs, r.n_vecs)
    assert r.n_orphan_vecs == r.n_vecs - r.n_embedded
    assert abs(r.coverage - r.n_embedded / r.n_docs) < 1e-15


def test_cap_loss_consistency(spark):
    from smart_contract_database_builder_spark.plans.llm_ops import _LSH_BUCKET_CAP

    for r in _rows(spark, "llm_lsh_cap_loss_audit"):
        # capped buckets have sz > cap >= 2 > 1, so every capped bucket
        # is also counted among the multi-doc buckets
        assert r.n_capped <= r.n_buckets
        # every capped bucket holds > cap docs, so docs_in_capped > cap * n_capped
        if r.n_capped:
            assert r.docs_in_capped > _LSH_BUCKET_CAP * r.n_capped
            assert r.pairs_suppressed >= r.docs_in_capped  # sz(sz-1)/2 > sz for sz>3
        else:
            assert r.docs_in_capped == 0 and r.pairs_suppressed == 0


def test_length_bias_counts_partition_corpus(spark):
    rows = _rows(spark, "llm_dedup_length_bias")
    docs = load_table(spark, SF_ORACLE, "documents")
    per_source = {r.source: r.n for r in
                  docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    for r in rows:
        assert r.n_removed + r.n_kept == per_source[r.source], r
        if r.n_removed:
            assert r.mean_chars_removed is not None and r.mean_chars_removed > 0
        else:
            assert r.mean_chars_removed is None


def test_burst_rate_bounds_and_sequential_twin(spark):
    """max_burst is between 1 and n_events; recompute one user's burst
    with a pure-Python two-pointer over the raw parquet."""
    rows = {r.user_id: r for r in _rows(spark, "window_user_burst_rate")}
    for r in rows.values():
        assert 1 <= r.max_burst_1h <= r.n_events, r
        assert abs(r.burst_share - r.max_burst_1h / r.n_events) < 1e-15
    ev = (
        load_table(spark, SF_ORACLE, "events")
        .selectExpr("user_id", "unix_micros(ts) AS us")
        .collect()
    )
    by_user: dict[int, list[int]] = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e.us)
    W = 3_600_000_000
    for uid in list(by_user)[:5]:
        ts = sorted(by_user[uid])
        best, lo = 1, 0
        for hi in range(len(ts)):
            while ts[hi] - ts[lo] >= W:
                lo += 1
            best = max(best, hi - lo + 1)
        assert rows[uid].max_burst_1h == best, uid
        assert rows[uid].n_events == len(ts)


def test_weak_links_have_no_common_neighbor(spark):
    """Recompute adjacency in Python and pin: every reported edge has
    an empty neighbor intersection, every non-reported candidate edge
    a non-empty one, and degrees match."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        minhash_candidate_pairs_stored,
    )

    cand = [
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs_stored(spark, SF_ORACLE)
        .select("doc_a", "doc_b")
        .collect()
    ]
    adj: dict[int, set[int]] = {}
    for a, b in cand:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    weak = {(a, b) for a, b in cand if not (adj[a] & adj[b])}
    rows = _rows(spark, "llm_weak_link_edges")
    got = {(r.doc_a, r.doc_b) for r in rows}
    assert got == weak and len(cand) > 0
    for r in rows:
        assert r.deg_a == len(adj[r.doc_a]) and r.deg_b == len(adj[r.doc_b])


def test_spend_trend_matches_numpy_ols(spark):
    import numpy as np

    orders = load_table(spark, SF_ORACLE, "orders").selectExpr(
        "o_custkey",
        "datediff(to_date(o_orderdate), to_date('1970-01-01')) AS x",
        "cast(o_totalprice AS decimal(18,2)) AS y",
    ).collect()
    by_c: dict[int, list] = {}
    for r in orders:
        by_c.setdefault(r.o_custkey, []).append((r.x, float(r.y)))
    rows = {r.custkey: r for r in _rows(spark, "agg_customer_spend_trend")}
    import random
    rng = random.Random(13)
    checked = 0
    for c in rng.sample(sorted(by_c), 50):
        pts = by_c[c]
        xs = np.array([p[0] for p in pts], dtype=np.float64)
        ys = np.array([p[1] for p in pts], dtype=np.float64)
        if len(pts) < 3 or np.all(xs == xs[0]):
            assert c not in rows
            continue
        slope = np.polyfit(xs, ys, 1)[0]
        assert abs(rows[c].slope_per_day - slope) < 1e-6 * max(1, abs(slope)), c
        assert rows[c].n_orders == len(pts)
        checked += 1
    assert checked > 30


def test_new_ops_prune_their_scans(spark):
    """Column pruning must reach the parquet scan: a 2-column
    projection that reads the whole row at 100 TB is wrong even when
    the answer is right."""
    import re

    def schemas(name):
        df = plans.QUERIES[name].fn(spark, SF_ORACLE)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        return re.findall(r"ReadSchema: struct<([^>]*)>", plan)

    for sch in schemas("agg_customer_spend_trend"):
        assert set(c.split(":")[0] for c in sch.split(",")) <= {
            "o_custkey", "o_totalprice", "o_orderdate"
        }, sch
    for sch in schemas("agg_orders_backlog_timeseries"):
        assert set(c.split(":")[0] for c in sch.split(",")) <= {
            "o_orderkey", "o_orderdate", "l_orderkey", "l_shipdate"
        }, sch
    for sch in schemas("llm_media_payload_dedup"):
        cols = {c.split(":")[0] for c in sch.split(",") if c}
        assert cols <= {"doc_id"}, sch  # empty = count-only scan, fine


def test_media_payload_dedup_pure_python_twin(spark):
    """Third implementation from the raw parquet: rebuild the
    hash-chain payloads in Python, simulate the re-crawl union, and
    pin every column of the per-kind report."""
    import hashlib

    doc_ids = [
        r.doc_id for r in load_table(spark, SF_ORACLE, "documents")
        .select("doc_id").collect()
    ]
    kinds = ("image", "audio", "video")
    per: dict[str, dict[str, tuple[int, int]]] = {}
    for mid in doc_ids:
        kind = kinds[mid % 3]
        hexdata = "".join(
            hashlib.md5(f"{mid}:{j}".encode()).hexdigest()
            for j in range(8 + mid % 5)
        )
        key = hashlib.md5(hexdata.encode()).hexdigest()
        n_bytes = len(hexdata) // 2
        grp = per.setdefault(kind, {})
        copies, _ = grp.get(key, (0, n_bytes))
        grp[key] = (copies + 2, n_bytes)  # crawl A + mirror copy
    got = {r.kind: r for r in _rows(spark, "llm_media_payload_dedup")}
    assert set(got) == set(per)
    for kind, grp in per.items():
        r = got[kind]
        assert r.n_payloads == len(grp)
        assert r.n_rows == sum(c for c, _ in grp.values())
        assert r.n_dup_rows == sum(c - 1 for c, _ in grp.values())
        assert r.bytes_total == sum(c * b for c, b in grp.values())
        assert r.bytes_unique == sum(b for _, b in grp.values())
        assert abs(
            r.savings_ratio - (1 - r.bytes_unique / r.bytes_total)
        ) < 1e-15


def test_dedup_quality_interaction_consistency(spark):
    rows = _rows(spark, "llm_dedup_quality_interaction")
    docs = load_table(spark, SF_ORACLE, "documents")
    per_source = {r.source: r.n for r in
                  docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    # the removal set must agree with the length-bias audit's
    bias = {r.source: r for r in _rows(spark, "llm_dedup_length_bias")}
    for r in rows:
        assert r.n_removed + r.n_kept == per_source[r.source], r
        assert r.n_removed == bias[r.source].n_removed
        if r.n_removed:
            assert 0.0 <= r.removed_quality_share <= 1.0
        else:
            assert r.removed_quality_share is None
        assert 0.0 <= r.kept_quality_share <= 1.0


def test_corpus_delta_accounts_for_every_doc(spark):
    """added+removed+changed+unchanged covers the union of both
    snapshots; the simulated residues give exact expected counts."""
    rows = _rows(spark, "llm_corpus_delta_report")
    docs = [(r.doc_id, r.source) for r in
            load_table(spark, SF_ORACLE, "documents")
            .select("doc_id", "source").collect()]
    per: dict[str, dict[str, int]] = {}
    for did, src in docs:
        d = per.setdefault(src, {"a": 0, "r": 0, "c": 0, "u": 0})
        m = did % 10
        if m == 3:
            d["a"] += 1
        elif m == 7:
            d["r"] += 1
        elif m == 5:
            d["c"] += 1
        else:
            d["u"] += 1
    for r in rows:
        e = per[r.source]
        assert (r.n_added, r.n_removed, r.n_changed, r.n_unchanged) == (
            e["a"], e["r"], e["c"], e["u"]
        ), r.source
        total = e["a"] + e["r"] + e["c"] + e["u"]
        assert abs(r.churn_rate - (total - e["u"]) / total) < 1e-15
