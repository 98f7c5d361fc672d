"""Round-17 operator invariants: pure-Python twins and structural laws
for the trend/changepoint/association batch (Kendall tau-b, Theil-Sen,
binary-segmentation changepoint, runs test, autocorrelation, seasonal
decomposition, quantile treatment effect), the entity-resolution
linkage report, the content-key engineering audits (hash-width
collisions, bloom sizing), leave-one-source-out valuation, the power-
iteration top principal component, and the true-streaming near-dup
admission witness (batch parity against ``llm_incremental_neardup``).

Twins recompute each statistic independently (exact integers + Python
IEEE doubles — the same fixed chains both engines evaluate), so they
catch shared-oracle bugs the DuckDB parity sweep cannot.
"""

from __future__ import annotations

import math
import os
import sys

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


def _daily():
    """(cents, n) per day in day order — the shared twin input."""
    return _duck(
        "SELECT CAST(o_orderdate AS DATE) AS d, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT), "
        "CAST(COUNT(*) AS BIGINT) FROM orders GROUP BY 1 ORDER BY d"
    )


# ---------------------------------------------------------------------------
# Trend / association statistics: brute-force pure-Python twins
# ---------------------------------------------------------------------------


def test_kendall_tau_twin(spark):
    df = _run(spark, "agg_kendall_tau_daily")
    days = _daily()
    conc = disc = tx = ty = n0 = 0
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            n0 += 1
            dc = days[j][1] - days[i][1]
            dn = days[j][2] - days[i][2]
            if dc == 0:
                tx += 1
            if dn == 0:
                ty += 1
            if dc * dn > 0:
                conc += 1
            elif dc * dn < 0 and dc != 0 and dn != 0:
                disc += 1
    r = df.iloc[0]
    assert int(r["n_pairs"]) == n0
    assert int(r["concordant"]) == conc
    assert int(r["discordant"]) == disc
    tau = (conc - disc) / math.sqrt(float(n0 - tx) * (n0 - ty))
    assert r["tau_b"] == tau
    assert -1.0 <= r["tau_b"] <= 1.0


def test_theilsen_twin(spark):
    df = _run(spark, "agg_theilsen_trend_slope")
    days = _daily()
    slopes = []
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            num = (days[j][1] - days[i][1]) * 1000
            dd = (days[j][0] - days[i][0]).days
            slopes.append((num - (num % dd + dd) % dd) // dd)
    slopes.sort()
    m = len(slopes)
    sen = slopes[(m + 1) // 2 - 1] / 1000
    r = df.iloc[0]
    assert int(r["n_pairs"]) == m
    assert r["sen_slope"] == sen
    # Sen slope is bounded by the extreme pairwise slopes; OLS need not be
    assert slopes[0] / 1000 <= r["sen_slope"] <= slopes[-1] / 1000


def test_changepoint_twin(spark):
    df = _run(spark, "agg_changepoint_best_split")
    days = _daily()
    cents = [r[1] for r in days]
    n, s = len(cents), sum(cents)
    q = 10_000_000_000
    best = None
    sk = 0
    for k in range(1, n):
        sk += cents[k - 1]
        gain = (
            math.floor(float(sk) * float(sk) / k / q)
            + math.floor(float(s - sk) * float(s - sk) / (n - k) / q)
            - math.floor(float(s) * float(s) / n / q)
        )
        if best is None or gain > best[0]:
            best = (gain, k, sk)
    r = df.iloc[0]
    assert int(r["n_days"]) == n
    assert int(r["n_before"]) == best[1]
    assert r["mean_before"] == float(best[2]) / best[1] / 100
    # between-segment SS is non-negative by Cauchy-Schwarz (up to the
    # floor quantization, which can shave at most 2 units)
    assert r["gain_dollars2"] >= -2 * 10_000_000_000 / 10000


def test_runs_test_twin(spark):
    df = _run(spark, "agg_runs_test_daily")
    days = _daily()
    ranked = sorted((c, d) for d, c, _ in days)
    med = ranked[(len(ranked) + 1) // 2 - 1][0]
    signs = [1 if c > med else 0 for _, c, _ in days if c != med]
    runs = 1 + sum(1 for i in range(1, len(signs)) if signs[i] != signs[i - 1])
    a, b = sum(signs), len(signs) - sum(signs)
    r = df.iloc[0]
    assert (int(r["n_above"]), int(r["n_below"]), int(r["n_runs"])) == (
        a,
        b,
        runs,
    )
    assert r["expected_runs"] == 2.0 * (a * b) / (a + b) + 1
    assert 1 <= r["n_runs"] <= a + b


def test_autocorr_twin(spark):
    df = _run(spark, "agg_autocorr_daily_revenue").set_index("lag_days")
    days = _daily()
    by_d = {d: c for d, c, _ in days}
    n, s = len(days), sum(c for _, c, _ in days)
    ss = sum(c * c for _, c, _ in days)
    xbar = float(s) / n
    import datetime as dt

    for lag in (1, 7, 28):
        pairs = [
            (c, by_d[d + dt.timedelta(days=lag)])
            for d, c, _ in days
            if d + dt.timedelta(days=lag) in by_d
        ]
        m = len(pairs)
        pk = sum(a * b for a, b in pairs)
        sh = sum(b for _, b in pairs)
        st = sum(a for a, _ in pairs)
        acf = (
            float(pk) - xbar * sh - xbar * st + (m * xbar) * xbar
        ) / (float(ss) - float(s) * xbar)
        assert int(df.loc[lag, "n_pairs"]) == m
        assert df.loc[lag, "acf"] == acf
        assert -1.0 - 1e-9 <= df.loc[lag, "acf"] <= 1.0 + 1e-9


def test_seasonal_decomposition_twin(spark):
    df = _run(spark, "agg_seasonal_decomposition_daily").set_index("wd")
    days = _daily()
    cents = [c for _, c, _ in days]
    import datetime as dt

    epoch = dt.date(1992, 1, 1)
    sums, cnts = {}, {}
    for t in range(3, len(cents) - 3):
        w7 = sum(cents[t - 3 : t + 4])
        wd = (days[t][0] - epoch).days % 7
        sums[wd] = sums.get(wd, 0) + 7 * cents[t] - w7
        cnts[wd] = cnts.get(wd, 0) + 1
    for wd in sums:
        assert int(df.loc[wd, "n_days"]) == cnts[wd]
        assert (
            df.loc[wd, "seasonal_dollars"]
            == float(sums[wd]) / 7 / cnts[wd] / 100
        )
    # additive seasonal components of a detrended series sum to ~0:
    # the weighted sum over weekdays is exactly the telescoped boundary
    total = sum(sums.values())
    span = sum(abs(v) for v in sums.values()) or 1
    assert abs(total) <= span  # sanity: no runaway component


def test_qte_twin(spark):
    df = _run(spark, "agg_quantile_treatment_effect").set_index("pct")
    rows = _duck(
        "SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),"
        " CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END"
        " FROM orders"
    )
    g1 = sorted(c for c, g in rows if g == 1)
    g0 = sorted(c for c, g in rows if g == 0)
    for q in range(10, 100, 10):
        v1 = g1[-(-q * len(g1) // 100) - 1]
        v0 = g0[-(-q * len(g0) // 100) - 1]
        assert df.loc[q, "v_urgent"] == v1 / 100
        assert df.loc[q, "v_other"] == v0 / 100
        assert df.loc[q, "qte"] == (v1 - v0) / 100
    # nearest-rank quantiles are monotone in q
    assert df["v_urgent"].is_monotonic_increasing
    assert df["v_other"].is_monotonic_increasing


# ---------------------------------------------------------------------------
# Entity resolution: linkage-report structural laws
# ---------------------------------------------------------------------------


def test_er_linkage_laws(spark):
    df = _run(spark, "join_er_duplicate_listings")
    n_parts = _duck("SELECT COUNT(*) FROM part")[0][0]
    assert int(df["n_parts"].sum()) == n_parts  # blocks partition the catalog
    # sorted-neighborhood candidates are LINEAR: <= W per record
    assert (df["n_pairs"] <= df["n_parts"] * 3).all()
    # threshold counts nest
    assert (df["n_match_strong"] <= df["n_match_weak"]).all()
    assert (df["n_match_weak"] <= df["n_pairs"]).all()
    # the score of a fully-agreeing pair bounds every observed score
    hi = df["max_score"].dropna()
    if len(hi):
        u = _duck(
            """
            WITH px AS (
              SELECT string_split(p_name, ' ')[1] AS adj,
                     p_type AS typ, CAST(p_size AS BIGINT) AS siz,
                     CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) // 1000 AS pb
              FROM part
            )
            SELECT
              (SELECT CAST(SUM(c * (c-1) // 2) AS DOUBLE)
                      / (CAST(MIN(nn) AS DOUBLE) * (MIN(nn)-1) / 2)
               FROM (SELECT COUNT(*) AS c, SUM(COUNT(*)) OVER () AS nn
                     FROM px GROUP BY adj)),
              (SELECT CAST(SUM(c * (c-1) // 2) AS DOUBLE)
                      / (CAST(MIN(nn) AS DOUBLE) * (MIN(nn)-1) / 2)
               FROM (SELECT COUNT(*) AS c, SUM(COUNT(*)) OVER () AS nn
                     FROM px GROUP BY typ)),
              (SELECT CAST(SUM(c * (c-1) // 2) AS DOUBLE)
                      / (CAST(MIN(nn) AS DOUBLE) * (MIN(nn)-1) / 2)
               FROM (SELECT COUNT(*) AS c, SUM(COUNT(*)) OVER () AS nn
                     FROM px GROUP BY siz)),
              (SELECT CAST(SUM(c * (c-1) // 2) AS DOUBLE)
                      / (CAST(MIN(nn) AS DOUBLE) * (MIN(nn)-1) / 2)
               FROM (SELECT COUNT(*) AS c, SUM(COUNT(*)) OVER () AS nn
                     FROM px GROUP BY pb))
            """
        )[0]
        cap = (
            math.log(0.9 / u[0])
            + math.log(0.85 / u[1])
            + math.log(0.8 / u[2])
            + math.log(0.75 / u[3])
        )
        assert (hi <= cap + 1e-9).all()


# ---------------------------------------------------------------------------
# Content-key engineering audits
# ---------------------------------------------------------------------------


def test_hash_collision_audit_twin(spark):
    df = _run(spark, "llm_hash_collision_audit").set_index("bits")
    import hashlib

    texts = {
        t[0] if t[0] is not None else ""
        for t in _duck("SELECT text FROM documents")
    }
    hashes = {hashlib.md5(t.encode()).hexdigest() for t in texts}
    d = len(hashes)
    for bits in (16, 20, 24):
        buckets = {}
        for h in hashes:
            b = int(h[:8], 16) % (1 << bits)
            buckets[b] = buckets.get(b, 0) + 1
        obs = sum(c * (c - 1) // 2 for c in buckets.values())
        assert int(df.loc[bits, "observed_pairs"]) == obs
        assert int(df.loc[bits, "n_contents"]) == d
        assert df.loc[bits, "expected_pairs"] == (
            float(d) * (d - 1) / 2 / (1 << bits)
        )
    # narrower keys collide at least as much
    assert (
        df.sort_index()["observed_pairs"].is_monotonic_decreasing
        or (df.sort_index()["observed_pairs"].diff().dropna() <= 0).all()
    )


def test_bloom_sizing_twin(spark):
    df = _run(spark, "layout_bloom_sizing_audit")
    m = 1 << 18
    for _, r in df.iterrows():
        n = int(r["n_keys"])
        k = min(16, max(1, math.floor(math.log(2) * (m / n))))
        assert int(r["k_hashes"]) == k
        assert r["fpp"] == math.pow(1 - math.exp(-(k * n) / m), k)
        assert 0.0 < r["fpp"] < 1.0
        assert r["bits_per_key"] == float(m) / n


def test_loo_quality_conservation(spark):
    df = _run(spark, "llm_source_loo_quality_shift")
    n_docs = _duck("SELECT COUNT(*) FROM documents")[0][0]
    assert int(df["n_docs"].sum()) == n_docs
    # corpus mean is identical on every row (a global constant)
    assert df["corpus_mean"].nunique() == 1
    # influence identity: influence = corpus_mean - loo_mean, and the
    # doc-weighted influences telescope to ~0 (first-order Shapley sums)
    assert (df["influence"] == df["corpus_mean"] - df["loo_mean"]).all()
    # a source with above-corpus mean has POSITIVE influence
    up = df[df["mean_quality"] > df["corpus_mean"]]
    assert (up["influence"] > 0).all()
    dn = df[df["mean_quality"] < df["corpus_mean"]]
    assert (dn["influence"] < 0).all()


# ---------------------------------------------------------------------------
# Power iteration: eigendecomposition cross-check + determinism
# ---------------------------------------------------------------------------


def test_top_pc_power_matches_eigh(spark):
    import numpy as np

    from smart_contract_database_builder_spark.plans.llm_ops import (
        gram_moment_relations,
    )
    from smart_contract_database_builder_spark.sources.tables import (
        load_table,
    )

    df = _run(spark, "llm_embedding_top_pc_power")
    assert len(df) == 16
    # rebuild the covariance from the SAME exact-integer moments the
    # plan consumes (quantization correctness is F57's oracle's job —
    # this test pins the driver-side power iteration itself)
    emb = load_table(spark, SF, "embeddings")
    prod, sums = gram_moment_relations(emb)
    mom = {(r["i"], r["j"]): r["pp"] for r in prod.collect()}
    svec = {r["i"]: (r["s"], r["n"]) for r in sums.collect()}
    d = len(svec)
    n = svec[0][1]
    s = np.array([svec[i][0] for i in range(d)], dtype=np.float64)
    c = np.zeros((d, d))
    for (i, j), pp in mom.items():
        v = (pp / n - (s[i] * s[j]) / (n * n)) / 1e12
        c[i, j] = c[j, i] = v
    w, v = np.linalg.eigh(c)
    top, lam = v[:, -1], w[-1]
    got = df.set_index("dim")["loading"]
    vec = np.zeros(d)
    vec[got.index.to_numpy()] = got.to_numpy()
    # the report keeps the top-16 |loading| dims of a unit vector; its
    # alignment with eigh's eigenvector must match the eigenvector's
    # own mass on those dims (up to iteration tolerance)
    mask = np.zeros(d, dtype=bool)
    mask[got.index.to_numpy()] = True
    cos = abs(float(vec @ top))
    proj2 = float(top[mask] @ top[mask])
    assert cos >= proj2 - 1e-6  # iteration runs to a 1e-14 step tolerance
    assert df["eigenvalue"].nunique() == 1
    # Rayleigh quotient never exceeds the top eigenvalue and must have
    # converged past the rest of the spectrum
    assert df["eigenvalue"].iloc[0] <= lam + 1e-12
    assert abs(df["eigenvalue"].iloc[0] - lam) <= 1e-9 * max(1.0, abs(lam))
    assert ((df["var_share"] > 0) & (df["var_share"] <= 1)).all()
    # determinism across invocations
    df2 = _run(spark, "llm_embedding_top_pc_power")
    assert df.equals(df2)


# ---------------------------------------------------------------------------
# True-streaming near-dup admission: batch parity
# ---------------------------------------------------------------------------


def test_stream_neardup_admission_batch_parity(spark):
    import pandas as pd

    got = _run(spark, "stream_true_neardup_admission")
    assert got["batch_id"].nunique() >= 2, "expected multiple micro-batches"
    ref = _run(spark, "llm_incremental_neardup")
    a = (
        got[["doc_id", "n_corpus_neighbors", "admitted"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = ref.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # every batch-slice doc received exactly one decision
    assert got["doc_id"].is_unique


def test_er_linkage_pure_python_twin(spark):
    """Full pure-Python recompute of J44 at sf0.001 — blocking,
    sorted-neighborhood candidate generation, measured u-probabilities,
    Fellegi-Sunter scoring, per-noun rollup — compared EXACTLY to the
    Spark output (same IEEE chains). Catches a shared Spark/DuckDB
    oracle bug (e.g. both sides agreeing on a wrong window order) that
    the parity sweep cannot."""
    import pandas as pd

    df = (
        _run(spark, "join_er_duplicate_listings")
        .sort_values("noun")
        .reset_index(drop=True)
    )
    parts = _duck(
        "SELECT p_partkey, p_name, p_brand, p_type, CAST(p_size AS BIGINT),"
        " CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 1000"
        " FROM part"
    )
    px = [
        {
            "pk": pk,
            "adj": name.split(" ")[0],
            "noun": name.split(" ")[1],
            "brand": brand,
            "typ": typ,
            "siz": siz,
            "pb": pb,
        }
        for pk, name, brand, typ, siz, pb in parts
    ]
    n = len(px)

    def u_of(feat):
        from collections import Counter

        c = Counter(r[feat] for r in px)
        num = sum(v * (v - 1) // 2 for v in c.values())
        return float(num) / (float(n) * (n - 1) / 2)

    m = {"adj": 0.9, "typ": 0.85, "siz": 0.8, "pb": 0.75}
    wa = {f: math.log(m[f] / u_of(f)) for f in m}
    wd = {f: math.log((1 - m[f]) / (1 - u_of(f))) for f in m}
    from collections import defaultdict

    blocks = defaultdict(list)
    for r in px:
        blocks[(r["noun"], r["brand"])].append(r)
    per_noun = defaultdict(lambda: {"pairs": 0, "w": 0, "s": 0, "mx": None})
    for (noun, _), rows in blocks.items():
        rows.sort(key=lambda r: (r["typ"], r["siz"], r["pb"], r["pk"]))
        for i, a in enumerate(rows):
            for j in range(i + 1, min(i + 4, len(rows))):
                b = rows[j]
                score = (
                    (wa["adj"] if a["adj"] == b["adj"] else wd["adj"])
                    + (wa["typ"] if a["typ"] == b["typ"] else wd["typ"])
                    + (wa["siz"] if a["siz"] == b["siz"] else wd["siz"])
                    + (wa["pb"] if a["pb"] == b["pb"] else wd["pb"])
                )
                t = per_noun[noun]
                t["pairs"] += 1
                t["w"] += score >= 1.0
                t["s"] += score >= 3.0
                t["mx"] = score if t["mx"] is None else max(t["mx"], score)
    n_parts = defaultdict(int)
    for r in px:
        n_parts[r["noun"]] += 1
    want = pd.DataFrame(
        [
            {
                "noun": noun,
                "n_parts": n_parts[noun],
                "n_pairs": per_noun[noun]["pairs"] if noun in per_noun else 0,
                "n_match_weak": per_noun[noun]["w"] if noun in per_noun else 0,
                "n_match_strong": per_noun[noun]["s"] if noun in per_noun else 0,
                "max_score": per_noun[noun]["mx"] if noun in per_noun else None,
            }
            for noun in sorted(n_parts)
        ]
    )
    pd.testing.assert_frame_equal(
        df, want, check_dtype=False, check_exact=True
    )
