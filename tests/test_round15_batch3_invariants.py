"""Round-15 batch-3 operators: pure twins + the laws their semantics
imply.

The skyline and zone-map audits get full third implementations
(dependency-free Python from raw parquet, vs Spark AND the DuckDB
oracle); the Theil report is pinned by its DECOMPOSITION IDENTITY
(within + between must reassemble the corpus-level index computed
independently); the dedup-graph placement audits are recomputed in
Python from the same S24 pair store their plans read (the store itself
is pinned by tests/test_jaccard_store.py — these twins verify the audit
arithmetic layered on top of it).
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark import plans
from smart_contract_database_builder_spark.plans.llm_ops import (
    _KANON_KS,
    _KANON_LEN_BUCKET,
    _SHARD_COUNTS,
    _SPILL_J,
    _TRANS_THRESHOLDS,
    _ngram_jaccard_pairs_stored,
)
from smart_contract_database_builder_spark.plans.relational_ext import (
    _ZM_BUCKETS,
    _ZM_EPOCH,
    _ZM_PROBES,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _run(spark, name: str, sf: str = SF):
    return plans.QUERIES[name].fn(spark, sf).toPandas()


def _hex32(x: int) -> int:
    """The shared md5 shard polynomial (first 8 hex digits as int)."""
    return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# llm_cross_shard_dup_spillover
# ---------------------------------------------------------------------------


def test_spillover_python_twin_and_laws(spark):
    pairs = [
        (int(a), int(b))
        for a, b, j in _ngram_jaccard_pairs_stored(spark, SF)
        .select("doc_a", "doc_b", "jaccard")
        .collect()
        if j >= float(_SPILL_J)
    ]
    got = _run(spark, "llm_cross_shard_dup_spillover").sort_values(
        "n_shards"
    )
    assert list(got["n_shards"]) == list(_SHARD_COUNTS)
    for _, row in got.iterrows():
        s = int(row["n_shards"])
        n_cross = sum(
            1 for a, b in pairs if _hex32(a) % s != _hex32(b) % s
        )
        assert int(row["n_pairs"]) == len(pairs)
        assert int(row["n_cross"]) == n_cross
        assert row["random_share"] == 1.0 - 1.0 / s
        if len(pairs):
            assert row["cross_share"] == n_cross / len(pairs)
            assert 0.0 <= row["cross_share"] <= 1.0


# ---------------------------------------------------------------------------
# llm_dedup_transitivity_audit
# ---------------------------------------------------------------------------


def test_transitivity_python_twin_and_monotonicity(spark):
    scored = [
        (int(a), int(b), float(j))
        for a, b, j in _ngram_jaccard_pairs_stored(spark, SF)
        .select("doc_a", "doc_b", "jaccard")
        .collect()
    ]
    got = _run(spark, "llm_dedup_transitivity_audit").sort_values(
        "threshold"
    )
    assert [f"{t:.1f}" for t in got["threshold"]] == _TRANS_THRESHOLDS
    prev_edges = None
    for _, row in got.iterrows():
        th = row["threshold"]
        edges = {(a, b) for a, b, j in scored if j >= th}
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        n_wedges = n_closed = 0
        for u, nbrs in adj.items():
            ns = sorted(nbrs)
            for i in range(len(ns)):
                for k in range(i + 1, len(ns)):
                    n_wedges += 1
                    if (ns[i], ns[k]) in edges:
                        n_closed += 1
        assert int(row["n_edges"]) == len(edges)
        assert int(row["n_wedges"]) == n_wedges
        assert int(row["n_closed"]) == n_closed
        if n_wedges:
            assert row["closure_rate"] == n_closed / n_wedges
        # edge count is threshold-monotone (nonincreasing)
        if prev_edges is not None:
            assert len(edges) <= prev_edges
        prev_edges = len(edges)


# ---------------------------------------------------------------------------
# llm_kanonymity_cell_audit
# ---------------------------------------------------------------------------


def test_kanonymity_python_twin_and_k_monotonicity(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, source, n_chars FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    cells: dict[tuple, int] = {}
    for lang, source, n_chars in rows:
        key = (lang, source, n_chars // _KANON_LEN_BUCKET)
        cells[key] = cells.get(key, 0) + 1
    got = _run(spark, "llm_kanonymity_cell_audit").sort_values("k")
    assert list(got["k"]) == list(_KANON_KS)
    prev_below = prev_risk = -1
    for _, row in got.iterrows():
        k = int(row["k"])
        below = sum(1 for n in cells.values() if n < k)
        at_risk = sum(n for n in cells.values() if n < k)
        assert int(row["n_cells"]) == len(cells)
        assert int(row["n_cells_below"]) == below
        assert int(row["n_docs_at_risk"]) == at_risk
        assert row["risk_share"] == at_risk / len(rows)
        # both audit columns are k-monotone (nondecreasing)
        assert below >= prev_below and at_risk >= prev_risk
        prev_below, prev_risk = below, at_risk


# ---------------------------------------------------------------------------
# llm_cluster_separation_audit
# ---------------------------------------------------------------------------


def test_cluster_separation_numpy_twin(spark):
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT label, embedding FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    by_label: dict[int, list] = {}
    for label, emb in rows:
        by_label.setdefault(int(label), []).append(np.asarray(emb, dtype=np.float64))
    labels = sorted(by_label)
    cent = {l: np.mean(np.stack(by_label[l]), axis=0) for l in labels}
    scat = {
        l: math.sqrt(
            float(
                np.mean(
                    [np.sum((v - cent[l]) ** 2) for v in by_label[l]]
                )
            )
        )
        for l in labels
    }
    got = _run(spark, "llm_cluster_separation_audit").sort_values("label")
    assert list(got["label"]) == labels
    for _, row in got.iterrows():
        l = int(row["label"])
        assert int(row["n_points"]) == len(by_label[l])
        # fixed-point quantization (1e-6 per element) bounds the drift
        assert row["scatter_rms"] == pytest.approx(scat[l], rel=1e-4)
        rr = {
            m: (scat[l] + scat[m])
            / float(np.linalg.norm(cent[l] - cent[m]))
            for m in labels
            if m != l
        }
        worst = max(rr, key=lambda m: (rr[m], -m))
        assert int(row["worst_peer"]) == worst
        assert row["db_component"] == pytest.approx(rr[worst], rel=1e-4)


# ---------------------------------------------------------------------------
# agg_theil_inequality_decomposition
# ---------------------------------------------------------------------------


def test_theil_decomposition_identity(spark):
    """within + between must reassemble the corpus-level Theil index
    computed INDEPENDENTLY (no grouping) — the additive property that
    is the whole point of choosing Theil over Gini."""
    con = duckdb.connect()
    spend = con.execute(
        f"""
        SELECT CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey, o.o_custkey
        """
    ).fetchall()
    xs = [r[0] for r in spend]
    n, s = len(xs), sum(xs)
    mu = s / n
    t_total = sum((x / s) * math.log(x / mu) for x in xs)
    got = _run(spark, "agg_theil_inequality_decomposition")
    share = got["revenue"] * 100 / s
    reassembled = float(
        (got["between_term"] + share * got["theil_within"]).sum()
    )
    # micro-nat quantization of Σ x·ln x bounds the within error at
    # 1e-6 nats per group; the identity must hold to that envelope
    assert reassembled == pytest.approx(t_total, abs=1e-5)
    # every within-group index is nonnegative (Theil is an entropy gap)
    assert (got["theil_within"] >= -1e-9).all()


# ---------------------------------------------------------------------------
# skyline_parts_pareto
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", [SF, SF01])
def test_skyline_definitional_twin(spark, sf):
    con = duckdb.connect()
    parts = con.execute(
        f"SELECT p_partkey, p_size, p_retailprice FROM "
        f"read_parquet('{sf}/part.parquet')"
    ).fetchall()
    sky = {
        pk
        for pk, sz, pr in parts
        if not any(
            (qr <= pr and qs <= sz) and (qr < pr or qs < sz)
            for _, qs, qr in parts
        )
    }
    got = _run(spark, "skyline_parts_pareto", sf)
    assert set(got["p_partkey"]) == sky
    # frontier law: sorted by size, prices strictly decrease across
    # distinct sizes (equal-price ties share a size)
    frontier = got.sort_values(["p_size", "p_retailprice"])
    by_size = frontier.groupby("p_size")["p_retailprice"].min()
    assert (by_size.diff().dropna() < 0).all()


# ---------------------------------------------------------------------------
# layout_zonemap_pruning_audit
# ---------------------------------------------------------------------------


def test_zonemap_python_twin_and_pruning_law(spark):
    import datetime as dt

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT l_shipdate, l_orderkey FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    epoch = dt.date.fromisoformat(_ZM_EPOCH)
    days = [((d.date() - epoch).days, ok) for d, ok in rows]
    lo = min(d for d, _ in days)
    hi = max(d for d, _ in days)
    zones: dict[tuple, list] = {}
    for day, ok in days:
        for layout, bucket in (
            ("hash", ok % _ZM_BUCKETS),
            ("date_sorted", ((day - lo) * _ZM_BUCKETS) // (hi - lo + 1)),
        ):
            z = zones.setdefault((layout, bucket), [day, day, 0])
            z[0] = min(z[0], day)
            z[1] = max(z[1], day)
            z[2] += 1
    got = _run(spark, "layout_zonemap_pruning_audit")
    for name, plo, phi in _ZM_PROBES:
        p_lo = (dt.date.fromisoformat(plo) - epoch).days
        p_hi = (dt.date.fromisoformat(phi) - epoch).days
        matching = sum(1 for d, _ in days if p_lo <= d <= p_hi)
        for layout in ("hash", "date_sorted"):
            zs = [z for (l, _), z in zones.items() if l == layout]
            scanned = [z for z in zs if z[0] <= p_hi and z[1] >= p_lo]
            row = got[(got["layout"] == layout) & (got["probe"] == name)]
            assert len(row) == 1
            row = row.iloc[0]
            assert int(row["buckets_total"]) == len(zs)
            assert int(row["buckets_scanned"]) == len(scanned)
            assert int(row["rows_scanned"]) == sum(z[2] for z in scanned)
            assert int(row["rows_matching"]) == matching
            # an overlapping zone set always covers the matches
            assert int(row["rows_scanned"]) >= matching
    # the pruning law the audit exists to demonstrate: the sorted
    # layout never scans more rows than the hash layout on any probe
    piv = got.pivot(index="probe", columns="layout", values="rows_scanned")
    assert (piv["date_sorted"] <= piv["hash"]).all()


# ---------------------------------------------------------------------------
# llm_dp_histogram_release
# ---------------------------------------------------------------------------


def test_dp_release_python_twin_and_error_scaling(spark):
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _DP_EPSILONS,
    )

    con = duckdb.connect()
    counts = dict(
        con.execute(
            f"SELECT lang, COUNT(*) FROM "
            f"read_parquet('{SF}/documents.parquet') GROUP BY lang"
        ).fetchall()
    )
    got = _run(spark, "llm_dp_histogram_release")
    assert len(got) == len(counts) * len(_DP_EPSILONS)
    for _, row in got.iterrows():
        lang, eps, n = row["lang"], row["eps"], int(row["n_true"])
        assert counts[lang] == n
        # identical seeded inverse-CDF draw, libm ln — exact twin
        seed = f"{lang}|{eps}"
        h = int(hashlib.md5(seed.encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        v = u - 0.5
        sgn = 1.0 if v > 0 else -1.0
        noised = n - (1.0 / eps) * sgn * math.log(1.0 - 2.0 * abs(v))
        assert row["n_noised"] == noised
        assert row["abs_err"] == abs(noised - n)
    # error scales with 1/eps: per lang, the noise magnitude at the
    # smallest epsilon dominates the largest (deterministic draws share
    # the seed structure, so per-eps u differs — compare expected-order
    # on the AGGREGATE: mean abs_err must decrease as eps grows)
    mean_err = got.groupby("eps")["abs_err"].mean()
    assert mean_err.loc[0.1] > mean_err.loc[10.0]


# ---------------------------------------------------------------------------
# stream_shard_watermark_skew
# ---------------------------------------------------------------------------


def test_watermark_skew_python_twin_and_laws(spark):
    from smart_contract_database_builder_spark.plans.streaming_batch import (
        _WM_SKEW_SHARDS,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, ts FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    per: dict[int, list] = {}
    for uid, ts in rows:
        sh = uid % _WM_SKEW_SHARDS
        e = per.setdefault(sh, [0, None])
        e[0] += 1
        e[1] = ts if e[1] is None or ts > e[1] else e[1]
    global_max = max(e[1] for e in per.values())
    frontier = min(e[1] for e in per.values())
    got = _run(spark, "stream_shard_watermark_skew").sort_values("shard")
    assert list(got["shard"]) == sorted(per)
    assert abs(got["event_share"].sum() - 1.0) < 1e-12
    for _, row in got.iterrows():
        sh = int(row["shard"])
        assert int(row["n_events"]) == per[sh][0]
        lag = int((global_max - per[sh][1]).total_seconds())
        assert int(row["lag_behind_global_s"]) == lag
        assert bool(row["holds_back_watermark"]) == (per[sh][1] == frontier)
        assert int(row["watermark_stall_s"]) == int(
            (global_max - frontier).total_seconds()
        )
    # exactly the frontier shard(s) hold the watermark back, and the
    # fastest shard has zero lag
    assert got["holds_back_watermark"].sum() >= 1
    assert got["lag_behind_global_s"].min() == 0


# ---------------------------------------------------------------------------
# llm_incremental_substring_admission
# ---------------------------------------------------------------------------


def test_incremental_substring_python_twin(spark):
    import re as _re

    from smart_contract_database_builder_spark.plans.llm_ops import (
        _INCR_EXISTING_MAX,
        _SUBSTR_K,
    )

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source, text FROM "
        f"read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).fetchall()

    def anchors(text):
        toks = _re.split(r"\s+", text.strip().lower())
        return {
            " ".join(toks[i:i + _SUBSTR_K])
            for i in range(len(toks) - _SUBSTR_K + 1)
        }

    corpus_set: set[str] = set()
    batch: dict[int, tuple[str, set]] = {}
    for doc_id, source, text in docs:
        n = int(source[3:])
        if n < _INCR_EXISTING_MAX:
            corpus_set |= anchors(text)
        else:
            batch[doc_id] = (source, anchors(text))
    got = _run(spark, "llm_incremental_substring_admission")
    assert set(got["doc_id"]) == set(batch)
    n_admitted = 0
    for _, row in got.iterrows():
        source, a = batch[int(row["doc_id"])]
        hits = len(a & corpus_set)
        assert row["source"] == source
        assert int(row["n_anchors"]) == len(a)
        assert int(row["n_hits"]) == hits
        assert bool(row["admitted"]) == (hits == 0)
        n_admitted += hits == 0
    # the near-duplicate-free synthetic corpus should admit most of the
    # batch — a zero-admission run would mean the split or the anchor
    # key is broken
    assert n_admitted > 0


# ---------------------------------------------------------------------------
# window_fulfillment_latency_percentiles
# ---------------------------------------------------------------------------


def test_fulfillment_latency_python_twin(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT o.o_orderpriority,
               CAST(MIN(CAST(l.l_shipdate AS DATE))
                    - CAST(o.o_orderdate AS DATE) AS BIGINT) AS days
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/lineitem.parquet') l
          ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
        """
    ).fetchall()
    by_p: dict[str, list[int]] = {}
    for prio, days in rows:
        by_p.setdefault(prio, []).append(int(days))

    def q_cont(xs, p):
        xs = sorted(xs)
        h = (len(xs) - 1) * p
        lo = int(h)
        if lo == len(xs) - 1:
            return float(xs[lo])
        return xs[lo] + (h - lo) * (xs[lo + 1] - xs[lo])

    got = _run(spark, "window_fulfillment_latency_percentiles")
    assert set(got["o_orderpriority"]) == set(by_p)
    for _, row in got.iterrows():
        xs = by_p[row["o_orderpriority"]]
        assert int(row["n_orders"]) == len(xs)
        assert row["p50_days"] == pytest.approx(q_cont(xs, 0.5), abs=1e-9)
        assert row["p90_days"] == pytest.approx(q_cont(xs, 0.9), abs=1e-9)
        assert row["p99_days"] == pytest.approx(q_cont(xs, 0.99), abs=1e-9)
        assert row["mean_days"] == sum(xs) / len(xs)
        # order statistics are monotone (the synthetic corpus draws
        # ship dates independently of order dates, so negative
        # latencies exist — the real-data law min >= 0 doesn't apply)
        assert row["p50_days"] <= row["p90_days"] <= row["p99_days"]


# ---------------------------------------------------------------------------
# layout_compaction_plan
# ---------------------------------------------------------------------------


def test_compaction_plan_python_twin_and_laws(spark):
    from smart_contract_database_builder_spark.plans.relational_ext import (
        _COMPACT_TARGET_ROWS,
    )

    con = duckdb.connect()
    files = con.execute(
        f"SELECT strftime(l_shipdate, '%Y-%m') AS mon, COUNT(*) "
        f"FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    plan: dict[int, list] = {}
    cum = 0
    for mon, n in files:
        out = cum // _COMPACT_TARGET_ROWS
        e = plan.setdefault(out, [0, 0, mon, mon])
        e[0] += 1
        e[1] += n
        e[3] = mon
        cum += n
    got = _run(spark, "layout_compaction_plan").sort_values("out_file")
    assert list(got["out_file"]) == sorted(plan)
    for _, row in got.iterrows():
        e = plan[int(row["out_file"])]
        assert int(row["n_source_files"]) == e[0]
        assert int(row["n_rows"]) == e[1]
        assert row["first_month"] == e[2]
        assert row["last_month"] == e[3]
    # key-ordered packing law: output key ranges are disjoint and
    # ordered — each stripe's first month follows its predecessor's last
    g = got.sort_values("out_file").reset_index(drop=True)
    for i in range(1, len(g)):
        assert g.loc[i, "first_month"] >= g.loc[i - 1, "last_month"]
    # conservation: every source file lands in exactly one stripe
    assert int(got["n_source_files"].sum()) == len(files)
    assert int(got["n_rows"].sum()) == sum(n for _, n in files)


# ---------------------------------------------------------------------------
# agg_return_rate_ztest
# ---------------------------------------------------------------------------


def test_return_rate_ztest_python_twin(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT p.p_type LIKE 'PROMO%', l.l_returnflag = 'R'
        FROM read_parquet('{SF}/lineitem.parquet') l
        JOIN read_parquet('{SF}/part.parquet') p
          ON p.p_partkey = l.l_partkey
        """
    ).fetchall()
    n1 = sum(1 for promo, _ in rows if promo)
    r1 = sum(1 for promo, ret in rows if promo and ret)
    n2 = len(rows) - n1
    r2 = sum(1 for promo, ret in rows if not promo and ret)
    got = _run(spark, "agg_return_rate_ztest")
    assert len(got) == 1
    row = got.iloc[0]
    assert (int(row["n_promo"]), int(row["n_promo_returned"])) == (n1, r1)
    assert (int(row["n_other"]), int(row["n_other_returned"])) == (n2, r2)
    p1, p2 = r1 / n1, r2 / n2
    pp = (r1 + r2) / (n1 + n2)
    z = (p1 - p2) / math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
    assert row["rate_promo"] == p1 and row["rate_other"] == p2
    assert row["rate_pooled"] == pp
    assert row["z_stat"] == z
    # the synthetic return flag is assigned independently of part type,
    # so the test must NOT be significant — a |z| > 5 here would mean
    # the statistic (not the data) is broken
    assert abs(row["z_stat"]) < 5.0


# ---------------------------------------------------------------------------
# sample_neyman_allocation
# ---------------------------------------------------------------------------


def test_neyman_allocation_python_twin_and_conservation(spark):
    from smart_contract_database_builder_spark.plans.relational_ext import (
        _NEYMAN_BUDGET,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT n.n_name,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        JOIN read_parquet('{SF}/nation.parquet') n
          ON n.n_nationkey = c.c_nationkey
        """
    ).fetchall()
    strata: dict[str, list[int]] = {}
    for nation, cents in rows:
        strata.setdefault(nation, []).append(int(cents))
    wt = {}
    for nation, xs in strata.items():
        nh, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        sd = math.sqrt(float(nh * sxx - sx * sx)) / nh / 100
        wt[nation] = math.floor(nh * sd * 1000000)
    wsum = sum(wt.values())
    exact = {k: _NEYMAN_BUDGET * float(v) / float(wsum) for k, v in wt.items()}
    fl = {k: math.floor(v) for k, v in exact.items()}
    leftover = _NEYMAN_BUDGET - sum(fl.values())
    order = sorted(exact, key=lambda k: (-(exact[k] - fl[k]), k))
    alloc = {
        k: fl[k] + (1 if i < leftover else 0) for i, k in enumerate(order)
    }
    got = _run(spark, "sample_neyman_allocation")
    assert set(got["nation"]) == set(strata)
    for _, row in got.iterrows():
        k = row["nation"]
        assert int(row["n_orders"]) == len(strata[k])
        assert row["alloc_exact"] == exact[k]
        assert int(row["alloc"]) == alloc[k]
    # conservation: allocations sum exactly to the budget
    assert int(got["alloc"].sum()) == _NEYMAN_BUDGET
    # optimality direction: the allocation correlates with N_h * S_h,
    # so the largest-weight stratum gets the largest allocation
    top = max(wt, key=lambda k: (wt[k], k))
    assert int(got.set_index("nation").loc[top, "alloc"]) == max(
        int(a) for a in got["alloc"]
    )
