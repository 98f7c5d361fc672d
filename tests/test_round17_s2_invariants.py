"""Round-17 session-2 operator invariants: pure-Python twins for the
Kaplan-Meier reorder survival, the Benjamini-Hochberg return-rate
screen, the event/weekday mutual-information report, the isotonic
quality calibration (textbook pool-adjacent-violators vs the minimax
join formulation), the content-defined-chunking dedup audit, the
retrieval-evaluation report, and the log-rank two-sample survival
test (plus its partition law against the pooled KM table).

Twins recompute each operator independently (exact integers + Python
IEEE doubles — the same fixed chains both engines evaluate), so they
catch shared-oracle bugs the DuckDB parity sweep cannot.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark import plans

from conftest import SF_SMOKE

SF = SF_SMOKE


def _run(spark, name: str, sf: str = SF):
    return plans.QUERIES[name].fn(spark, sf).toPandas()


def _duck(sql: str, sf: str = SF):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


# ---------------------------------------------------------------------------
# A81 Kaplan-Meier: full pure-Python product-limit recompute
# ---------------------------------------------------------------------------


def test_kaplan_meier_pure_python_twin(spark):
    rows = _duck(
        "SELECT o_custkey, CAST(o_orderdate AS DATE), o_orderkey "
        "FROM orders ORDER BY o_custkey, 2, 3"
    )
    by_cust: dict[int, list] = {}
    for ck, d, _k in rows:
        by_cust.setdefault(ck, []).append(d)
    mxd = max(d for _, d, _k in rows)
    durs = []  # (t, event)
    for ds in by_cust.values():
        for a, b in zip(ds, ds[1:]):
            durs.append(((b - a).days, 1))
        durs.append(((mxd - ds[-1]).days, 0))
    from collections import Counter

    d_t = Counter(t for t, ev in durs if ev == 1)
    c_t = Counter(t for t, ev in durs if ev == 0)
    all_t = sorted(set(d_t) | set(c_t))
    # reverse cumulative at-risk counts (exact ints)
    n_risk, acc = {}, 0
    for t in reversed(all_t):
        acc += d_t.get(t, 0) + c_t.get(t, 0)
        n_risk[t] = acc
    ev_times = [t for t in all_t if d_t.get(t, 0) > 0]
    surv, p = {}, 1.0
    for t in ev_times:  # ascending-t left fold, the engines' order
        p = p * ((n_risk[t] - d_t[t]) / n_risk[t])
        surv[t] = p
    got = _run(spark, "agg_kaplan_meier_reorder")
    assert list(got["t_days"]) == ev_times
    for _, r in got.iterrows():
        t = int(r["t_days"])
        assert int(r["n_at_risk"]) == n_risk[t]
        assert int(r["n_events"]) == d_t[t]
        assert int(r["n_censored"]) == c_t.get(t, 0)
        assert float(r["survival"]) == surv[t], t
    # product-limit laws: survival strictly decreasing, ends at 0 only
    # if the largest duration is an event with full wipe-out
    s = list(got["survival"])
    assert all(a > b for a, b in zip(s, s[1:]))
    # conservation: total durations = orders count
    assert sum(d_t.values()) + sum(c_t.values()) == len(rows)
    # censored tails = number of customers
    assert sum(c_t.values()) == len(by_cust)


# ---------------------------------------------------------------------------
# A82 BH-FDR: bitwise chain recompute + erfc cross-check + step-up laws
# ---------------------------------------------------------------------------


def _as_p2(az: float) -> float:
    t = 1.0 / (1.0 + 0.2316419 * az)
    poly = t * (
        0.319381530
        + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))
    )
    return 2.0 * ((0.3989422804014327 * math.exp(-0.5 * az * az)) * poly)


def test_fdr_bh_pure_python_twin(spark):
    rows = _duck(
        "SELECT n.n_name, CAST(COUNT(*) AS BIGINT), "
        "CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) "
        "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        "JOIN nation n ON n.n_nationkey = c.c_nationkey "
        "GROUP BY n.n_name"
    )
    nn = sum(n for _, n, _r in rows)
    rr = sum(r for _, _n, r in rows)
    m = len(rows)
    stats = []
    for name, n, r in rows:
        p1 = r / n
        p2 = (rr - r) / (nn - n)
        pp = rr / nn
        z = (p1 - p2) / math.sqrt(pp * (1.0 - pp) * (1.0 / n + 1.0 / (nn - n)))
        stats.append((name, n, r, z, _as_p2(abs(z))))
    stats.sort(key=lambda x: (x[4], x[0]))
    thr = [((i + 1) * 0.1) / m for i in range(m)]
    kstar = max(
        (i + 1 for i in range(m) if stats[i][4] <= thr[i]), default=0
    )
    got = _run(spark, "agg_return_rate_fdr_bh")
    assert len(got) == m
    for i, (_, r) in enumerate(got.iterrows()):
        name, n, rt, z, p = stats[i]
        assert r["n_name"] == name
        assert int(r["n_items"]) == n and int(r["n_returned"]) == rt
        assert float(r["z_stat"]) == z
        assert float(r["p_value"]) == p
        assert float(r["bh_threshold"]) == thr[i]
        assert int(r["rejected"]) == (1 if (i + 1) <= kstar else 0)
        # independent accuracy cross-check: A&S 26.2.17 vs libm erfc
        assert abs(p - math.erfc(abs(z) / math.sqrt(2.0))) < 1.5e-7
    # the A&S p is strictly decreasing in |z| on this data, so the BH
    # ranking is exactly the |z|-descending ranking
    zs = sorted((abs(float(z)) for _, _, _, z, _ in stats), reverse=True)
    assert zs == [abs(float(s[3])) for s in stats]
    # step-up law: every rank <= k* is rejected even if its own p
    # exceeds its threshold (the defining difference from Bonferroni)
    rej = got[got["rejected"] == 1]
    assert len(rej) == kstar


# ---------------------------------------------------------------------------
# A83 mutual information: pure-Python recompute + information laws
# ---------------------------------------------------------------------------


def test_mutual_info_pure_python_twin(spark):
    rows = _duck(
        "SELECT event_type, CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT), "
        "CAST(COUNT(*) AS BIGINT) FROM events GROUP BY 1, 2"
    )
    cells = {(t, w): c for t, w, c in rows}
    nn = sum(cells.values())
    rowt: dict[str, int] = {}
    colt: dict[int, int] = {}
    for (t, w), c in cells.items():
        rowt[t] = rowt.get(t, 0) + c
        colt[w] = colt.get(w, 0) + c
    scale = 1e12
    mi_q = 0
    pmis = {}
    for (t, w), c in cells.items():
        pmi = math.log((c * float(nn)) / (float(rowt[t]) * colt[w]))
        pmis[(t, w)] = pmi
        mi_q += math.floor(((c / float(nn)) * pmi) * scale)
    hr_q = sum(
        math.floor((-((r / float(nn)) * math.log(r / float(nn)))) * scale)
        for r in rowt.values()
    )
    hc_q = sum(
        math.floor((-((w / float(nn)) * math.log(w / float(nn)))) * scale)
        for w in colt.values()
    )
    got = _run(spark, "agg_event_weekday_mutual_info")
    assert len(got) == len(cells)
    for _, r in got.iterrows():
        key = (r["event_type"], int(r["weekday"]))
        assert int(r["n_cell"]) == cells[key]
        assert float(r["pmi_nats"]) == pmis[key]
        assert float(r["mi_nats"]) == mi_q / scale
        assert float(r["h_type"]) == hr_q / scale
        assert float(r["h_weekday"]) == hc_q / scale
        assert float(r["nmi"]) == mi_q / math.sqrt(float(hr_q) * float(hc_q))
    # information laws (up to the documented <=|cells| pico-nat floor
    # slack): MI >= 0 and MI <= min(H_row, H_col)
    slack = (len(cells) + 7) / scale
    assert mi_q / scale >= -slack
    assert mi_q <= min(hr_q, hc_q)


# ---------------------------------------------------------------------------
# F132 isotonic: textbook pool-adjacent-violators vs the minimax join
# ---------------------------------------------------------------------------


def _pava(pairs):
    """Weighted increasing-isotonic fit of d/n rates via the stack
    algorithm; returns one fitted rate per input position."""
    blocks = []  # (sum_d, sum_n, count)
    for d, n in pairs:
        blocks.append([d, n, 1])
        while len(blocks) >= 2 and (
            blocks[-2][0] * blocks[-1][1] > blocks[-1][0] * blocks[-2][1]
        ):  # exact rational comparison: avg_prev > avg_last
            d1, n1, c1 = blocks.pop()
            blocks[-1][0] += d1
            blocks[-1][1] += n1
            blocks[-1][2] += c1
    out = []
    for d, n, c in blocks:
        out.extend([d / n] * c)
    return out


def test_isotonic_minimax_matches_pava(spark):
    got = _run(spark, "llm_isotonic_quality_calibration")
    pairs = [
        (int(r["n_dup_docs"]), int(r["n_docs"])) for _, r in got.iterrows()
    ]
    incr = _pava(pairs)
    decr = list(reversed(_pava(list(reversed(pairs)))))
    for i, (_, r) in enumerate(got.iterrows()):
        assert float(r["iso_incr"]) == incr[i], i
        assert float(r["iso_decr"]) == decr[i], i
    # monotonicity laws
    ii = list(got["iso_incr"])
    dd = list(got["iso_decr"])
    assert all(a <= b for a, b in zip(ii, ii[1:]))
    assert all(a >= b for a, b in zip(dd, dd[1:]))
    # the better-direction fit never has larger SSE than the constant
    # fit pooled at the global rate (isotonic generalizes the mean)
    tot_d = sum(d for d, _ in pairs)
    tot_n = sum(n for _, n in pairs)
    gr = tot_d / tot_n
    sse_const = sum(
        n * (d / n - gr) ** 2 for d, n in pairs
    )
    assert min(float(got["sse_incr"][0]), float(got["sse_decr"][0])) <= sse_const + 1e-12


# ---------------------------------------------------------------------------
# F133 CDC chunking: full pure-Python chunker recompute
# ---------------------------------------------------------------------------


def test_cdc_chunk_pure_python_twin(spark):
    docs = _duck("SELECT doc_id, source, substr(text, 1, 2048) FROM documents")
    chunks = []  # (source, clen, hash)
    for _doc_id, source, s in docs:
        L = len(s)
        cuts = set()
        for pos in range(8, L + 1):
            h8 = hashlib.md5(s[pos - 8:pos].encode()).hexdigest()[:8]
            if int(h8, 16) % 64 == 0:
                cuts.add(pos)
        if L >= 1:
            cuts.add(L)
        prev = 0
        for pos in sorted(cuts):
            piece = s[prev:pos]
            chunks.append(
                (source, len(piece), hashlib.md5(piece.encode()).hexdigest())
            )
            prev = pos
    from collections import Counter

    freq = Counter(h for _, _, h in chunks)
    per_src: dict[str, dict] = {}
    for src, clen, h in chunks:
        st = per_src.setdefault(
            src, {"n": 0, "chars": 0, "dupn": 0, "dupm": 0, "hs": set()}
        )
        st["n"] += 1
        st["chars"] += clen
        st["hs"].add(h)
        if freq[h] >= 2:
            st["dupn"] += 1
            st["dupm"] += clen
    got = _run(spark, "llm_cdc_chunk_dedup")
    assert len(got) == len(per_src)
    for _, r in got.iterrows():
        st = per_src[r["source"]]
        assert int(r["n_chunks"]) == st["n"]
        assert int(r["n_distinct_chunks"]) == len(st["hs"])
        assert int(r["n_chars"]) == st["chars"]
        assert int(r["n_dup_chunks"]) == st["dupn"]
        assert int(r["dup_char_mass"]) == st["dupm"]
        assert float(r["dup_char_ratio"]) == st["dupm"] / float(st["chars"])
        assert float(r["avg_chunk_len"]) == st["chars"] / st["n"]
    # conservation: chunk chars reassemble every capped document exactly
    assert sum(st["chars"] for st in per_src.values()) == sum(
        len(s) for _, _, s in docs
    )


def test_cdc_boundaries_are_content_local():
    """The CDC property itself: prepending a char to a document shifts
    every byte, yet all boundaries strictly inside the unmodified
    suffix stay anchored to the same CONTENT positions — the reason a
    one-char edit re-chunks O(1) chunks, not the whole document."""
    base = "the quick brown fox jumps over the lazy dog " * 20

    def cut_positions(s):
        return {
            pos
            for pos in range(8, len(s) + 1)
            if int(hashlib.md5(s[pos - 8:pos].encode()).hexdigest()[:8], 16)
            % 64
            == 0
        }

    a = cut_positions(base)
    b = cut_positions("X" + base)
    # every interior boundary of the original reappears shifted by 1
    assert {p + 1 for p in a if p > 8} <= b


# ---------------------------------------------------------------------------
# F134 retrieval eval: numpy-free pure-Python recompute
# ---------------------------------------------------------------------------


def _iscale_py(v: float) -> int:
    return int(
        Decimal(v).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        * 1_000_000
    )


def test_retrieval_eval_pure_python_twin(spark):
    rows = _duck("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id")
    vecs = {vid: [_iscale_py(v) for v in emb] for vid, emb in rows}
    qids = [7, 13, 23, 31, 43]
    K = 10
    W = (
        1000000000, 630929754, 500000000, 430676558, 386852807,
        356207187, 333333333, 315464877, 301029996, 289064826,
    )
    idcg = float(sum((K + 1 - j) * W[j - 1] for j in range(1, K + 1)))
    expected = {}
    for qid in qids:
        qv = vecs[qid]
        qq = sum(x * x for x in qv)
        scored = []
        for vid, dv in vecs.items():
            if vid == qid:
                continue
            dot = sum(a * b for a, b in zip(dv, qv))
            dd = sum(x * x for x in dv)
            cos = float(dot) / (math.sqrt(float(dd)) * math.sqrt(float(qq)))
            ham = sum(
                1 for a, b in zip(dv, qv) if (a >= 0) != (b >= 0)
            )
            scored.append((vid, cos, ham))
        truth = [
            v for v, _, _ in sorted(scored, key=lambda x: (-x[1], x[0]))[:K]
        ]
        trank = {v: i + 1 for i, v in enumerate(truth)}
        sysl = [
            v for v, _, _ in sorted(scored, key=lambda x: (x[2], x[0]))[:K]
        ]
        rels = [K + 1 - trank[v] if v in trank else 0 for v in sysl]
        dcg = sum(r * W[i] for i, r in enumerate(rels))
        hits = sum(1 for r in rels if r > 0)
        first = next((i + 1 for i, r in enumerate(rels) if r > 0), 0)
        expected[qid] = dict(
            n_candidates=len(vecs) - 1,
            n_hits=hits,
            recall=hits / 10.0,
            first=first,
            mrr=0.0 if first == 0 else 1.0 / first,
            dcg=dcg,
            ndcg=float(dcg) / idcg,
        )
    got = _run(spark, "llm_retrieval_eval_report")
    assert list(got["query_vec_id"]) == qids
    for _, r in got.iterrows():
        e = expected[int(r["query_vec_id"])]
        assert int(r["n_candidates"]) == e["n_candidates"]
        assert int(r["n_hits"]) == e["n_hits"]
        assert float(r["recall_at_k"]) == e["recall"]
        assert int(r["first_hit_rank"]) == e["first"]
        assert float(r["mrr"]) == e["mrr"]
        assert int(r["dcg"]) == e["dcg"]
        assert float(r["ndcg"]) == e["ndcg"]
    # metric laws: ndcg in [0,1]; perfect retrieval iff recall 1 and
    # ranks aligned; recall bounds ndcg-positivity
    for e in expected.values():
        assert 0.0 <= e["ndcg"] <= 1.0
        assert (e["ndcg"] > 0) == (e["n_hits"] > 0)


# ---------------------------------------------------------------------------
# A84 log-rank: full pure-Python recompute + relation to A81
# ---------------------------------------------------------------------------


def test_logrank_pure_python_twin(spark):
    rows = _duck(
        "SELECT o.o_custkey, CAST(o.o_orderdate AS DATE), o.o_orderkey, "
        "CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END "
        "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
        "ORDER BY o.o_custkey, 2, 3"
    )
    by_cust: dict[int, tuple[int, list]] = {}
    for ck, d, _k, g in rows:
        by_cust.setdefault(ck, (g, []))[1].append(d)
    mxd = max(d for _, d, _k, _g in rows)
    from collections import Counter

    d_t = {1: Counter(), 0: Counter()}  # events per group
    a_t = {1: Counter(), 0: Counter()}  # all durations per group
    for g, ds in by_cust.values():
        for a, b in zip(ds, ds[1:]):
            d_t[g][(b - a).days] += 1
            a_t[g][(b - a).days] += 1
        a_t[g][(mxd - ds[-1]).days] += 1
    all_t = sorted(set(a_t[1]) | set(a_t[0]))
    n1, n2, acc1, acc2 = {}, {}, 0, 0
    for t in reversed(all_t):
        acc1 += a_t[1].get(t, 0)
        acc2 += a_t[0].get(t, 0)
        n1[t], n2[t] = acc1, acc2
    scale = 1e9
    oq = vq = 0
    exp1 = {}
    ev_times = [
        t for t in all_t if d_t[1].get(t, 0) + d_t[0].get(t, 0) > 0
    ]
    for t in ev_times:
        d1, d2 = d_t[1].get(t, 0), d_t[0].get(t, 0)
        dd, nn = d1 + d2, n1[t] + n2[t]
        e1 = (float(dd) * n1[t]) / nn
        exp1[t] = e1
        oq += math.floor((d1 - e1) * scale)
        v = (
            0.0
            if nn <= 1
            else ((float(dd) * n1[t]) / nn)
            * (n2[t] / float(nn))
            * ((nn - dd) / float(nn - 1))
        )
        vq += math.floor(v * scale)
    chi = (oq / scale) * (oq / scale) / (vq / scale)
    got = _run(spark, "agg_logrank_reorder_by_segment")
    assert list(got["t_days"]) == ev_times
    for _, r in got.iterrows():
        t = int(r["t_days"])
        assert int(r["n1_at_risk"]) == n1[t]
        assert int(r["n2_at_risk"]) == n2[t]
        assert int(r["d1_events"]) == d_t[1].get(t, 0)
        assert int(r["d2_events"]) == d_t[0].get(t, 0)
        assert float(r["e1_expected"]) == exp1[t]
        assert float(r["o_minus_e"]) == oq / scale
        assert float(r["variance"]) == vq / scale
        assert float(r["chi_sq"]) == chi
        assert int(r["n_times"]) == len(ev_times)
    # family law: the pooled at-risk/event counts are EXACTLY A81's
    # (the two-sample split partitions the one-sample table)
    km = _run(spark, "agg_kaplan_meier_reorder")
    pooled = {
        int(r["t_days"]): (int(r["n_at_risk"]), int(r["n_events"]))
        for _, r in km.iterrows()
    }
    for _, r in got.iterrows():
        t = int(r["t_days"])
        assert int(r["n1_at_risk"]) + int(r["n2_at_risk"]) == pooled[t][0]
        assert int(r["d1_events"]) + int(r["d2_events"]) == pooled[t][1]
