"""Pure-Python third implementations of two round-14 operators.

Oracle parity proves Spark == DuckDB; a dependency-free Python
recompute from the RAW PARQUET proves both are RIGHT — a shared
misunderstanding (wrong hash input, wrong order statistic, off-by-one
threshold) cannot survive three independent implementations. Run at
sf0.001 where full in-memory recompute is trivial.
"""

from __future__ import annotations

import hashlib
import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark import plans

SF = "/root/testdata/sf0.001"


def _docs():
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, source, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()


def _tokens(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


def _shingles(toks: list[str], n: int = 3) -> set[str]:
    return {" ".join(toks[i:i + n]) for i in range(max(0, len(toks) - n + 1))} \
        if len(toks) >= n else set()


def test_kmv_audit_matches_pure_python(spark):
    """Recompute the KMV estimate per source from scratch: distinct
    3-gram shingles, 48-bit md5 hashes, k-th smallest DISTINCT hash,
    (k-1)·2^48/h_k — every output value must match bitwise."""
    K, SPACE = 64, float(1 << 48)
    by_source: dict[str, set[str]] = {}
    for _id, source, text in _docs():
        by_source.setdefault(source, set()).update(_shingles(_tokens(text)))
    want = {}
    for source, sh in by_source.items():
        hs = sorted({int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
                     for s in sh})
        n_exact = len(sh)
        if len(hs) >= K:
            est = (K - 1) * SPACE / float(hs[K - 1])
        else:
            est = float(n_exact)
        want[source] = (n_exact, est, (est - n_exact) / n_exact)
    got = plans.QUERIES["llm_kmv_distinct_audit"].fn(spark, SF).collect()
    assert {r.source for r in got} == set(want)
    for r in got:
        n_exact, est, rel = want[r.source]
        assert r.n_exact == n_exact, r.source
        assert r.est_kmv == est, r.source       # bitwise: same op chain
        assert r.rel_err == rel, r.source


def test_ablation_matrix_matches_pure_python(spark):
    """Recompute the four Gopher violation flags per doc from raw text
    and rebuild all six matrix cells — counts and Jaccards must match
    exactly."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _ABLATION_FILTERS,
        _G_MAX_MWL,
        _G_MAX_TOK,
        _G_MAX_TOP_FRAC,
        _G_MIN_MWL,
        _G_MIN_TOK,
        _STOPWORDS,
    )

    flags = []
    for _id, _source, text in _docs():
        toks = _tokens(text)
        n_tok = len(toks)
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        mwl = sum(len(t) * c for t, c in counts.items()) / n_tok
        top = max(counts.values()) / n_tok
        has_stop = any(t in counts for t in _STOPWORDS)
        flags.append({
            "len_rule": not (_G_MIN_TOK <= n_tok <= _G_MAX_TOK),
            "mwl_rule": not (_G_MIN_MWL <= mwl <= _G_MAX_MWL),
            "rep_rule": top > _G_MAX_TOP_FRAC,
            "stop_rule": not has_stop,
        })
    want = {}
    for i, a in enumerate(_ABLATION_FILTERS):
        for b in _ABLATION_FILTERS[i + 1:]:
            both = sum(1 for f in flags if f[a] and f[b])
            oa = sum(1 for f in flags if f[a] and not f[b])
            ob = sum(1 for f in flags if f[b] and not f[a])
            union = both + oa + ob
            want[(a, b)] = (both, oa, ob,
                            both / union if union else 0.0)
    got = plans.QUERIES["llm_filter_ablation_matrix"].fn(spark, SF).collect()
    assert len(got) == len(want) == 6
    for r in got:
        both, oa, ob, jac = want[(r.filter_a, r.filter_b)]
        assert (r.n_both, r.n_only_a, r.n_only_b) == (both, oa, ob), (
            r.filter_a, r.filter_b
        )
        assert abs(r.overlap_jaccard - jac) < 1e-15
