"""Round-15 operators: pure-Python twins + invariants + the
degenerate-corpus regression pins for the three round-15 parity fixes.

The substring family gets the full third-implementation treatment
(Spark == DuckDB == dependency-free Python from raw parquet); the
mixing/session audits get exact twins plus the monotonicity laws their
semantics imply.
"""

from __future__ import annotations

import hashlib
import os
import re
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark import plans
from smart_contract_database_builder_spark.plans.llm_ops import (
    _ORDER_SEED,
    _ORDER_SHARDS,
    _SUBSTR_DF_CAP,
    _SUBSTR_K,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _docs(sf=SF):
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, source, lang, text "
        f"FROM read_parquet('{sf}/documents.parquet') ORDER BY doc_id"
    ).fetchall()


def _tokens(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


def _gram_positions(toks: list[str], k: int = _SUBSTR_K):
    """1-based (pos, gram) anchors, matching the Spark/SQL convention."""
    return [
        (i + 1, " ".join(toks[i:i + k]))
        for i in range(len(toks) - k + 1)
    ]


def _all_grams(docs):
    """{gram: [(doc_id, pos), ...]} over the corpus."""
    occ: dict[str, list[tuple[int, int]]] = {}
    for doc_id, _src, _lang, text in docs:
        for pos, g in _gram_positions(_tokens(text)):
            occ.setdefault(g, []).append((doc_id, pos))
    return occ


def _merged_runs(positions: list[int], k: int = _SUBSTR_K):
    """Merged coverage runs over sorted anchor positions; two anchors
    merge when the gap is <= k (overlapping or touching intervals)."""
    runs = []
    for p in sorted(positions):
        if runs and p - runs[-1][1] <= k:
            runs[-1][1] = p
        else:
            runs.append([p, p])
    return [(last - first + k) for first, last in runs]


def test_substring_dup_mass_matches_pure_python(spark):
    docs = _docs()
    occ = _all_grams(docs)
    shared = {g for g, o in occ.items() if len({d for d, _ in o}) >= 2}
    per_doc_positions: dict[int, list[int]] = {}
    for doc_id, _src, _lang, text in docs:
        ps = [p for p, g in _gram_positions(_tokens(text)) if g in shared]
        if ps:
            per_doc_positions[doc_id] = ps
    want: dict[str, list[int]] = {}
    for doc_id, src, _lang, text in docs:
        n_tok = len(_tokens(text))
        row = want.setdefault(src, [0, 0, 0, 0, 0])
        row[0] += 1
        row[1] += n_tok
        if doc_id in per_doc_positions:
            lens = _merged_runs(per_doc_positions[doc_id])
            row[2] += 1
            row[3] += len(lens)
            row[4] += sum(lens)
    got = {
        r.source: r.asDict()
        for r in plans.QUERIES["llm_substring_dup_mass"].fn(spark, SF).collect()
    }
    assert set(got) == set(want)
    for src, (n_docs, n_tokens, n_dup, n_runs, dup_tokens) in want.items():
        g = got[src]
        assert (
            g["n_docs"], g["n_tokens"], g["n_docs_with_dup"],
            g["n_runs"], g["dup_tokens"],
        ) == (n_docs, n_tokens, n_dup, n_runs, dup_tokens), src
        assert g["dup_token_share"] == (
            0.0 if n_tokens == 0 else dup_tokens / n_tokens
        )


def test_substring_pair_maxrun_matches_pure_python(spark):
    docs = _docs()
    occ = _all_grams(docs)
    chains: dict[tuple[int, int], dict[int, list[int]]] = {}
    for g, o in occ.items():
        if not 2 <= len({d for d, _ in o}) <= _SUBSTR_DF_CAP:
            continue
        for da, pa in o:
            for db, pb in o:
                if da < db:
                    chains.setdefault((da, db), {}).setdefault(
                        pa - pb, []
                    ).append(pa)
    want = {}
    for pair, diags in chains.items():
        run_lens = []
        n_pts = 0
        for _diag, pas in diags.items():
            pas = sorted(set(pas))
            n_pts += len(pas)
            start = prev = pas[0]
            for p in pas[1:]:
                if p - prev > 1:
                    run_lens.append(prev - start + _SUBSTR_K)
                    start = p
                prev = p
            run_lens.append(prev - start + _SUBSTR_K)
        want[pair] = (max(run_lens), len(run_lens), n_pts)
    got = {
        (r.doc_a, r.doc_b): (r.max_run_len, r.n_runs, r.n_anchor_matches)
        for r in plans.QUERIES["llm_substring_pair_maxrun"]
        .fn(spark, SF)
        .collect()
    }
    assert got == want
    # every reported longest run is at least one anchor wide
    assert all(v[0] >= _SUBSTR_K for v in got.values())


def test_substring_pair_maxrun_is_the_true_longest_substring(spark):
    """The diagonal-chain arithmetic must equal a direct quadratic
    longest-common-substring (in tokens) computation for pairs whose
    anchors all survive the doc-frequency cap."""
    docs = {d: _tokens(t) for d, _s, _l, t in _docs()}
    occ = _all_grams(_docs())
    hot = {g for g, o in occ.items()
           if len({d for d, _ in o}) > _SUBSTR_DF_CAP}
    rows = plans.QUERIES["llm_substring_pair_maxrun"].fn(spark, SF).collect()
    assert rows, "fixture corpus must contain shared substrings"
    for r in rows[:10]:
        a, b = docs[r.doc_a], docs[r.doc_b]
        # token-grain LCS via suffix comparison (small docs)
        best = 0
        for i in range(len(a)):
            for j in range(len(b)):
                l = 0
                while (i + l < len(a) and j + l < len(b)
                       and a[i + l] == b[j + l]):
                    l += 1
                best = max(best, l)
        if not hot:
            assert r.max_run_len == best >= _SUBSTR_K


def test_substring_stopgram_audit_accounts_for_every_gram(spark):
    rows = plans.QUERIES["llm_substring_stopgram_audit"].fn(spark, SF).collect()
    occ = _all_grams(_docs())
    n_grams = sum(r.n_grams for r in rows)
    n_occ = sum(r.n_occurrences for r in rows)
    assert n_grams == len(occ)
    assert n_occ == sum(len(o) for o in occ.values())
    for r in rows:
        assert r.in_pair_scope == (1 if 2 <= r.doc_freq <= _SUBSTR_DF_CAP else 0)


def test_substring_run_histogram_mass_reconciles_with_dup_mass(spark):
    hist = plans.QUERIES["llm_substring_run_histogram"].fn(spark, SF).collect()
    mass = plans.QUERIES["llm_substring_dup_mass"].fn(spark, SF).collect()
    assert sum(r.run_token_mass for r in hist) == sum(
        r.dup_tokens for r in mass
    )
    assert sum(r.n_runs for r in hist) == sum(r.n_runs for r in mass)
    assert all(r.run_len >= _SUBSTR_K for r in hist)
    assert abs(sum(r.mass_share for r in hist) - 1.0) < 1e-9


def test_shard_mixing_audit_matches_pure_python(spark):
    docs = _docs()
    n = len(docs)
    from collections import Counter
    n_l: Counter = Counter()
    n_s: Counter = Counter()
    n_sl: Counter = Counter()
    langs = set()
    for doc_id, _src, lang, _text in docs:
        h = hashlib.md5((_ORDER_SEED + str(doc_id)).encode()).hexdigest()
        shard = ord(h[0]) % _ORDER_SHARDS
        n_l[lang] += 1
        n_s[shard] += 1
        n_sl[(shard, lang)] += 1
        langs.add(lang)
    got = {
        r.shard: r.asDict()
        for r in plans.QUERIES["llm_shard_mixing_audit"].fn(spark, SF).collect()
    }
    assert set(got) == set(range(_ORDER_SHARDS))
    for shard in range(_ORDER_SHARDS):
        g = got[shard]
        assert g["n_docs"] == n_s.get(shard, 0)
        assert g["n_langs_present"] == sum(
            1 for l in langs if n_sl.get((shard, l), 0) > 0
        )
        if n_s.get(shard, 0) == 0:
            assert g["l1_mix_distance"] == 0.0
        else:
            num = sum(
                abs(n_sl.get((shard, l), 0) * n - n_l[l] * n_s[shard])
                for l in langs
            )
            assert g["l1_mix_distance"] == num / (n_s[shard] * n)
            assert 0.0 <= g["l1_mix_distance"] <= 2.0


def test_interleave_run_lengths_matches_pure_python(spark):
    docs = _docs()
    src = {d: s for d, s, _l, _t in docs}
    order = sorted(
        (
            ord(hashlib.md5((_ORDER_SEED + str(d)).encode()).hexdigest()[0])
            % _ORDER_SHARDS,
            hashlib.md5((_ORDER_SEED + str(d)).encode()).hexdigest(),
            d,
        )
        for d in src
    )
    from collections import defaultdict
    runs = defaultdict(list)
    prev_shard, prev_src, run = None, None, 0
    for shard, _key, d in order:
        s = src[d]
        if shard == prev_shard and s == prev_src:
            run += 1
        else:
            if prev_src is not None:
                runs[prev_src].append(run)
            run = 1
        prev_shard, prev_src = shard, s
    runs[prev_src].append(run)
    got = {
        r.source: r.asDict()
        for r in plans.QUERIES["llm_interleave_run_lengths"]
        .fn(spark, SF)
        .collect()
    }
    assert set(got) == set(runs)
    for s, lens in runs.items():
        g = got[s]
        assert g["n_docs"] == sum(lens)
        assert g["n_runs"] == len(lens)
        assert g["max_run_len"] == max(lens)
        assert g["mean_run_len"] == sum(lens) / len(lens)
    assert sum(g["n_docs"] for g in got.values()) == len(docs)


def test_session_gap_sweep_laws_and_pandas_twin(spark):
    rows = sorted(
        plans.QUERIES["stream_session_gap_sweep"].fn(spark, SF).collect(),
        key=lambda r: r.gap_minutes,
    )
    # a larger gap can only merge sessions
    for a, b in zip(rows, rows[1:]):
        assert a.n_sessions >= b.n_sessions
        assert a.events_per_session <= b.events_per_session
    ev = pd.read_parquet(f"{SF}/events.parquet")[["user_id", "ts"]]
    for r in rows:
        cut = pd.Timedelta(minutes=int(r.gap_minutes))
        n_sessions = 0
        for _u, g in ev.sort_values("ts").groupby("user_id"):
            ts = g["ts"].tolist()
            n_sessions += 1 + sum(
                1 for x, y in zip(ts, ts[1:]) if y - x >= cut
            )
        assert r.n_sessions == n_sessions
        assert r.events_per_session == len(ev) / n_sessions


# ---------------------------------------------------------------------------
# Degenerate-corpus regression pins for the round-15 parity fixes
# ---------------------------------------------------------------------------


def _write_documents(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "int64", "n_chars": "int64"})
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_decon_sweep_emits_zero_rows_for_gram_sizes_that_flag_nothing(
    spark, tmp_path
):
    """r15 fix: a gram size that flags zero docs must emit an explicit
    zero row (the oracle's ungrouped UNION ALL always does)."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _DECON_MOD,
        _DECON_REM,
    )

    rows = [
        # the benchmark doc (doc_id % MOD == REM)
        (_DECON_REM, "a b c d e", "en", "bench", 9),
        # corpus doc sharing ONLY the 3-gram "a b c"
        (1, "a b c q w", "en", "web", 9),
        (2, "u v w x y", "en", "web", 9),
    ]
    sf = _write_documents(tmp_path, rows)
    got = {
        r.n: r
        for r in plans.QUERIES["llm_decontaminate_ngram_sweep"]
        .fn(spark, sf)
        .collect()
    }
    assert set(got) == {3, 4, 5}
    assert got[3].n_flagged_docs == 1
    for n in (4, 5):
        assert got[n].n_flagged_docs == 0
        assert got[n].n_hit_occurrences == 0
        assert got[n].flagged_share == 0.0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        plans.QUERIES["llm_decontaminate_ngram_sweep"].oracle
    ).fetchall()
    assert sorted((w[0], w[1], w[2], w[3]) for w in want) == sorted(
        (g.n, g.n_flagged_docs, g.n_hit_occurrences, g.flagged_share)
        for g in got.values()
    )


def test_fingerprint_agreement_zero_pair_corpus_reports_zeros(
    spark, tmp_path
):
    """r15 fix: with both pair stores empty the SUM-based counts must
    coalesce to the oracle's COUNT zeros, not NULL."""
    words = [f"w{i}" for i in range(120)]
    rows = [
        (i, " ".join(words[i * 40:(i + 1) * 40]), "en", "s", 200)
        for i in range(3)
    ]
    sf = _write_documents(tmp_path, rows)
    got = (
        plans.QUERIES["llm_fingerprint_method_agreement"]
        .fn(spark, sf)
        .collect()
    )
    assert len(got) == 1
    r = got[0]
    assert (r.n_both, r.n_simhash_only, r.n_jaccard_only) == (0, 0, 0)
    assert r.simhash_recall_of_jaccard == 0.0
    assert r.jaccard_recall_of_simhash == 0.0
    assert r.avg_hamming_both == 0.0
    assert r.avg_shared_jaccard_only == 0.0


def test_upsample_plan_zero_token_guard_is_unreachable_but_aligned():
    """The whitespace tokenizer maps '' to [''] (1 token) on BOTH
    engines, so SUM(len(tokens)) >= n_docs and the n_tokens = 0 branch
    is unreachable on real data — the r15 guard (Spark filter + oracle
    HAVING) exists so the two engines stay aligned by construction if
    the tokenizer ever changes. Pin the premise."""
    con = duckdb.connect()
    assert con.execute(
        r"SELECT len(string_split_regex(trim(lower('')), '\s+'))"
    ).fetchone()[0] == 1
    assert "HAVING SUM(len(" in plans.QUERIES["llm_upsample_plan_integer"].oracle
