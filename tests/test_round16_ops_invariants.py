"""Round-16 operator invariants: pure-Python/pandas twins and
structural laws for the statistics batch (Mann-Whitney, KS, Spearman,
chi-square, ANOVA, CUPED, Poisson bootstrap, winsorized means), the
substring-grain dedup TRANSFORM and its conservation vs the F112 mass
accounting, the J41 within-doc occurrence cap (adversarial corpus),
the grain-overlap matrix, the epoch mix schedule, the Z-order layout
audit, and the two new streaming sweeps.

Twins recompute each statistic independently (exact integers +
Python's IEEE doubles — the same fixed chains both engines evaluate),
so they catch shared-oracle bugs the DuckDB parity sweep cannot.
"""

from __future__ import annotations

import hashlib
import math
import os
import re
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


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip().lower()) if t] if text.strip() else []


# ---------------------------------------------------------------------------
# Substring family: the trim transform, its conservation, the J41 cap
# ---------------------------------------------------------------------------


def _py_substring_trim(docs: dict[int, str], k: int = 8):
    """Pure-Python reference of substring_dedup_trim semantics."""
    grams: dict[str, list[tuple[int, int]]] = {}
    toks = {d: _tok(t) for d, t in docs.items()}
    for d, ts in toks.items():
        for p0 in range(len(ts) - k + 1):
            g = " ".join(ts[p0 : p0 + k])
            grams.setdefault(g, []).append((d, p0 + 1))
    removed: dict[int, set[int]] = {d: set() for d in docs}
    for g, occ in grams.items():
        if len({d for d, _ in occ}) < 2:
            continue
        first = min(occ)
        for d, pos in occ:
            if (d, pos) != first:
                removed[d].update(range(pos, pos + k))
    out = {}
    for d, ts in toks.items():
        kept = [t for i, t in enumerate(ts, start=1) if i not in removed[d]]
        out[d] = (
            len(ts),
            len(removed[d]),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


def test_substring_trim_python_twin(spark):
    from smart_contract_database_builder_spark.plans.llm_ops import (
        substring_dedup_trim,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = {
        1: f"intro one {shared} tail one",
        2: f"other head {shared} closing words here",
        3: "entirely unique text with no overlap at all whatsoever now",
        4: "short doc",  # < 8 tokens: no grams, nothing removed
        5: (
            "rep rep rep rep rep rep rep rep rep rep rep rep"
        ),  # within-doc only: df=1 anchors, NOT cut at this grain
        6: f"{shared} {shared}",  # shares with 1/2 AND repeats internally
    }
    sdf = spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        int(r.doc_id): (int(r.n_tok), int(r.n_removed), r.kept_hash)
        for r in substring_dedup_trim(sdf).collect()
    }
    want = _py_substring_trim(docs)
    assert got == want
    # doc 3 and 4 untouched; doc 5 untouched (within-doc only)
    assert got[3][1] == 0 and got[4][1] == 0 and got[5][1] == 0
    # doc 1 holds the canonical first occurrence start; doc 2 and 6 lose
    # their copies
    assert got[2][1] > 0 and got[6][1] > 0


def test_substring_trim_conservation_vs_dup_mass(spark):
    trim = _run(spark, "llm_substring_dedup_trim")
    mass = _run(spark, "llm_substring_dup_mass")
    assert int(trim["n_tok"].sum()) == int(mass["n_tokens"].sum())
    # every removed token was inside a shared run, and the globally-first
    # occurrences are kept, so removal is strictly bounded by dup mass
    assert 0 < int(trim["n_removed"].sum()) <= int(mass["dup_tokens"].sum())
    # per-doc removal can never exceed the doc itself
    assert (trim["n_removed"] <= trim["n_tok"]).all()


def test_substring_pair_maxrun_adversarial_cap(spark, tmp_path):
    """A doc repeating ONE anchor m times meets a partner doing the
    same: without the per-(anchor, doc) position cap the join yields
    m×m rows; with it, exactly cap² — observable as n_anchor_matches."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _SUBSTR_K,
        _SUBSTR_POS_CAP,
    )

    m = 120  # anchor positions per doc before the cap
    text = " ".join(["x"] * (m + _SUBSTR_K - 1))
    sdf = spark.createDataFrame(
        [(i, text, "en", "s", len(text)) for i in (1, 2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path)
    sdf.write.parquet(f"{sf}/documents.parquet")
    out = _run(spark, "llm_substring_pair_maxrun", sf)
    assert len(out) == 1
    row = out.iloc[0]
    # all cap² position pairs survive; the diagonal-0 chain saturates at
    # cap + K - 1 tokens instead of the unbounded m + K - 1
    assert int(row["n_anchor_matches"]) == _SUBSTR_POS_CAP**2
    assert int(row["max_run_len"]) == _SUBSTR_POS_CAP + _SUBSTR_K - 1


def test_grain_overlap_laws(spark):
    df = _run(spark, "llm_dedup_grain_overlap")
    assert (
        df["removed_both"]
        <= df[["removed_span", "removed_substr"]].min(axis=1)
    ).all()
    assert (
        df["removed_either"]
        == df["removed_span"] + df["removed_substr"] - df["removed_both"]
    ).all()
    assert (df["removed_either"] <= df["n_tokens"]).all()


# ---------------------------------------------------------------------------
# Statistics batch: exact Python twins
# ---------------------------------------------------------------------------


def test_mann_whitney_python_twin(spark):
    rows = _duck(
        """SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
                  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
           FROM orders"""
    )
    from collections import Counter

    c1 = Counter(v for v, g in rows if g == 1)
    call = Counter(v for v, _ in rows)
    n1 = sum(c1.values())
    n2 = len(rows) - n1
    cb = 0
    r1x2 = 0
    tie3 = 0
    for v in sorted(call):
        c = call[v]
        r1x2 += c1.get(v, 0) * (2 * cb + c + 1)
        tie3 += c**3 - c
        cb += c
    u = (r1x2 - n1 * (n1 + 1)) / 2
    mean_u = float(n1) * n2 / 2
    var_u = (
        float(n1) * n2 / 12
        * ((n1 + n2 + 1) - float(tie3) / (float(n1 + n2) * (n1 + n2 - 1)))
    )
    got = _run(spark, "agg_mann_whitney_u").iloc[0]
    assert int(got["n_urgent"]) == n1 and int(got["n_other"]) == n2
    assert got["u_stat"] == u
    assert got["z_stat"] == (u - mean_u) / math.sqrt(var_u)
    assert got["rank_biserial"] == 2.0 * u / (float(n1) * n2) - 1.0


def test_ks_two_sample_python_twin(spark):
    rows = _duck(
        """SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
                  c.c_mktsegment
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
           WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')"""
    )
    from collections import Counter

    c1 = Counter(v for v, s in rows if s == "BUILDING")
    c2 = Counter(v for v, s in rows if s == "MACHINERY")
    n1, n2 = sum(c1.values()), sum(c2.values())
    f1 = f2 = 0
    best, at = -1, None
    for v in sorted(set(c1) | set(c2)):
        f1 += c1.get(v, 0)
        f2 += c2.get(v, 0)
        num = abs(f1 * n2 - f2 * n1)
        if num > best:
            best, at = num, v
    got = _run(spark, "agg_ks_two_sample").iloc[0]
    assert int(got["n_building"]) == n1 and int(got["n_machinery"]) == n2
    assert got["ks_stat"] == best / (float(n1) * n2)
    assert int(got["ks_at_cents"]) == at


def test_spearman_python_twin(spark):
    rows = _duck(
        """SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT),
                  COUNT(*)
           FROM orders GROUP BY CAST(o_orderdate AS DATE)"""
    )

    def rank2(vals):
        from collections import Counter

        cnt = Counter(vals)
        out, cb = {}, 0
        for v in sorted(cnt):
            out[v] = 2 * cb + cnt[v] + 1
            cb += cnt[v]
        return out

    rx = rank2([r for r, _ in rows])
    ry = rank2([c for _, c in rows])
    xs = [(rx[r], ry[c]) for r, c in rows]
    n = len(xs)
    sx = sum(x for x, _ in xs)
    sy = sum(y for _, y in xs)
    sxy = sum(x * y for x, y in xs)
    sxx = sum(x * x for x, _ in xs)
    syy = sum(y * y for _, y in xs)
    rho = float(n * sxy - sx * sy) / math.sqrt(
        float(n * sxx - sx * sx) * float(n * syy - sy * sy)
    )
    got = _run(spark, "agg_spearman_daily_correlation").iloc[0]
    assert int(got["n_days"]) == n
    assert got["spearman_rho"] == rho
    assert -1.0 <= rho <= 1.0


def test_chi_square_python_twin(spark):
    rows = _duck(
        """SELECT o.o_orderpriority, c.c_mktsegment, COUNT(*)
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
           GROUP BY 1, 2"""
    )
    n = sum(c for _, _, c in rows)
    rt = {}
    ct = {}
    for p, s, c in rows:
        rt[p] = rt.get(p, 0) + c
        ct[s] = ct.get(s, 0) + c
    tm = sum(
        math.floor(float(c) * c * n / (float(rt[p]) * ct[s]) * 1000000)
        for p, s, c in rows
    )
    got = _run(spark, "agg_chi_square_independence").iloc[0]
    assert int(got["n_total"]) == n
    assert int(got["dof"]) == (len(rt) - 1) * (len(ct) - 1)
    assert got["chi2_stat"] == float(tm) / 1000000 - n
    assert got["chi2_stat"] >= 0.0


def test_weekday_anova_python_twin(spark):
    rows = _duck(
        """SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01'
                       AS BIGINT) % 7,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
           FROM orders GROUP BY CAST(o_orderdate AS DATE)"""
    )
    Q = 10_000_000_000
    grp: dict[int, list[int]] = {}
    for wd, cents in rows:
        grp.setdefault(wd, []).append(cents)
    t = sum(
        math.floor(float(sum(v)) * float(sum(v)) / len(v) / Q)
        for v in grp.values()
    )
    n = len(rows)
    s = sum(c for _, c in rows)
    k = len(grp)
    g = math.floor(float(s) * float(s) / n / Q)
    xq = math.floor(float(sum(c * c for _, c in rows)) / Q)
    got = _run(spark, "agg_weekday_anova").iloc[0]
    assert int(got["n_days"]) == n and int(got["k_groups"]) == k
    assert got["f_stat"] == float((t - g) * (n - k)) / float((xq - t) * (k - 1))
    assert got["eta_sq"] == float(t - g) / float(xq - g)
    # quantized SS partition still sums to (quantized) total
    assert got["ss_between"] + got["ss_within"] == float(xq - g) * 1000000
    # sanity vs the unquantized statistic: within 0.1% relative
    ssb = sum(sum(v) ** 2 / len(v) for v in grp.values()) - s**2 / n
    ssw = sum(c * c for _, c in rows) - sum(
        sum(v) ** 2 / len(v) for v in grp.values()
    )
    f_exact = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(got["f_stat"] - f_exact) / f_exact < 1e-3


def test_cuped_python_twin_and_identity(spark):
    rows = _duck(
        """SELECT c.c_mktsegment, o.o_custkey,
                  CAST(SUM(CASE WHEN o.o_orderdate < TIMESTAMP '1996-01-01'
                           THEN CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           ELSE 0 END) AS BIGINT),
                  CAST(SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '1996-01-01'
                           THEN CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           ELSE 0 END) AS BIGINT)
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
           GROUP BY 1, 2"""
    )
    segs: dict[str, list[tuple[int, int]]] = {}
    for seg, _, x, y in rows:
        segs.setdefault(seg, []).append((x, y))
    got = _run(spark, "agg_cuped_adjusted_metric").set_index("segment")
    for seg, xy in segs.items():
        n = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxx = sum(x * x for x, _ in xy)
        sxy = sum(x * y for x, y in xy)
        syy = sum(y * y for _, y in xy)
        covn = float(n * sxy - sx * sy)
        varxn = float(n * sxx - sx * sx)
        varyn = float(n * syy - sy * sy)
        r = got.loc[seg]
        assert int(r["n_customers"]) == n
        assert r["theta"] == covn / varxn
        assert r["var_reduction"] == (covn * covn) / (varxn * varyn)
        assert 0.0 <= r["var_reduction"] <= 1.0
        # CUPED identity: adjusted variance = raw * (1 - rho^2)
        assert r["var_y_adjusted"] == r["var_y"] * (1.0 - r["var_reduction"])


def _hex32(h: str) -> int:
    return int(h[:8], 16)


def test_poisson_bootstrap_python_twin(spark):
    cums = [
        0.36787944117144233,
        0.7357588823428847,
        0.9196986029286058,
        0.9810118431238462,
        0.9963401531726563,
        0.9994058151824183,
        0.9999167588507119,
    ]

    def w_of(u: float) -> int:
        for i, t in enumerate(cums):
            if u < t:
                return i
        return len(cums)

    rows = _duck(
        """SELECT r.r_name, o.o_orderkey,
                  CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           FROM orders o
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN nation n ON n.n_nationkey = c.c_nationkey
           JOIN region r ON r.r_regionkey = n.n_regionkey"""
    )
    per: dict[str, dict[int, tuple[int, int]]] = {}
    for region, okey, cents in rows:
        reps = per.setdefault(region, {r: (0, 0) for r in range(32)})
        for g in range(8):
            digest = hashlib.md5(f"{okey}:{g}".encode()).hexdigest()
            for j in range(4):
                rep = g * 4 + j
                u = int(digest[8 * j : 8 * j + 8], 16) / 4294967296.0
                w = w_of(u)
                sw, swc = reps[rep]
                reps[rep] = (sw + w, swc + w * cents)
    got = _run(spark, "agg_poisson_bootstrap_ci").set_index("region")
    for region, reps in per.items():
        means = sorted(
            (float(swc) / sw, rep) for rep, (sw, swc) in reps.items()
        )
        r = got.loc[region]
        assert r["ci_lo"] == means[1][0] / 100  # rank 2 of 32
        assert r["ci_hi"] == means[30][0] / 100  # rank 31 of 32
        assert r["ci_lo"] <= r["ci_hi"]
        assert int(r["n_replicates"]) == 32


def test_winsorized_laws(spark):
    df = _run(spark, "agg_winsorized_spend_stats")
    assert (df["p05"] <= df["p95"]).all()
    assert ((df["mean_winsorized"] >= df["p05"]) & (df["mean_winsorized"] <= df["p95"])).all()
    assert ((df["mean_trimmed"] >= df["p05"]) & (df["mean_trimmed"] <= df["p95"])).all()


# ---------------------------------------------------------------------------
# Drawdown, systematic estimator, Z-order, schedule, modularity,
# calibration, streaming sweeps
# ---------------------------------------------------------------------------


def test_drawdown_laws(spark):
    df = _run(spark, "window_revenue_drawdown").sort_values("day")
    assert (df["drawdown"] >= 0).all()
    assert (df["peak_revenue"] >= df["revenue"]).all()
    assert df["peak_revenue"].is_monotonic_increasing or (
        df["peak_revenue"].diff().dropna() >= 0
    ).all()


def test_systematic_estimate_python_twin(spark):
    rows = _duck(
        """SELECT r.r_name, o.o_orderkey,
                  CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           FROM orders o
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN nation n ON n.n_nationkey = c.c_nationkey
           JOIN region r ON r.r_regionkey = n.n_regionkey"""
    )
    got = _run(spark, "agg_systematic_sample_estimate").set_index("region")
    per: dict[str, tuple[int, int, int, int]] = {}
    for region, okey, cents in rows:
        n, tot, ns, sc = per.get(region, (0, 0, 0, 0))
        hit = okey % 40 == 7
        per[region] = (
            n + 1,
            tot + cents,
            ns + (1 if hit else 0),
            sc + (cents if hit else 0),
        )
    for region, (n, tot, ns, sc) in per.items():
        r = got.loc[region]
        assert int(r["n_orders"]) == n and int(r["n_sampled"]) == ns
        assert r["revenue_estimated"] == float(40 * sc) / 100
        assert r["relative_error"] == (float(40 * sc) - float(tot)) / float(
            tot
        )


def test_zorder_audit_laws(spark):
    df = _run(spark, "layout_zorder_benefit_audit").set_index(
        ["layout", "probe"]
    )
    for (layout, probe), r in df.iterrows():
        assert r["rows_scanned"] >= r["rows_matching"]
        assert r["buckets_scanned"] <= r["buckets_total"]
    # each 1-D sort degenerates on the OTHER dimension; z-order prunes on both
    assert (
        df.loc[("qty_sorted", "q1_1996_dates"), "buckets_scanned"]
        == df.loc[("qty_sorted", "q1_1996_dates"), "buckets_total"]
    )
    assert (
        df.loc[("date_sorted", "qty_45_50"), "buckets_scanned"]
        == df.loc[("date_sorted", "qty_45_50"), "buckets_total"]
    )
    assert (
        df.loc[("zorder", "q1_1996_dates"), "buckets_scanned"]
        < df.loc[("zorder", "q1_1996_dates"), "buckets_total"]
    )
    assert (
        df.loc[("zorder", "qty_45_50"), "buckets_scanned"]
        < df.loc[("zorder", "qty_45_50"), "buckets_total"]
    )


def test_epoch_schedule_conservation(spark):
    df = _run(spark, "llm_epoch_mix_schedule")
    per = df.groupby("source").agg(
        planned=("tokens_planned", "sum"),
        alloc=("tokens_alloc", "first"),
        src=("tokens_source", "first"),
    )
    # Bresenham conservation: epochs sum exactly to the allocation
    assert (per["planned"] == per["alloc"]).all()
    # largest-remainder conservation: allocations sum exactly to budget
    assert int(per["alloc"].sum()) == int(per["src"].sum())
    # epoch shares differ by at most 1 token within a source
    spread = df.groupby("source")["tokens_planned"].agg(
        lambda s: s.max() - s.min()
    )
    assert (spread <= 1).all()


def test_modularity_identity(spark):
    df = _run(spark, "llm_neardup_source_modularity")
    q = df["modularity"].iloc[0]
    assert (df["modularity"] == q).all()
    recomputed = (
        sum(
            math.floor((fw - ef) * 1000000000)
            for fw, ef in zip(df["frac_within"], df["expected_frac"])
        )
        / 1000000000
    )
    assert q == recomputed
    assert -1.0 <= q <= 1.0
    # degree conservation: sum of degrees = 2m = 2 * sum of frac * m
    assert abs(df["frac_within"].sum()) <= 1.0 + 1e-12


def test_quality_calibration_conservation(spark):
    df = _run(spark, "llm_quality_dup_calibration")
    # _tokens() yields [''] for empty text, so len(t) >= 1 for EVERY
    # document — the bins partition the whole table and per-bin doc
    # counts must conserve the full document count exactly.
    n_docs_tok = _duck(
        "SELECT COUNT(*) FROM documents "
        r"WHERE len(string_split_regex(trim(lower(text)), '\s+')) > 0"
    )[0][0]
    assert int(df["n_docs"].sum()) == n_docs_tok
    assert int(df["n_docs"].sum()) >= 1
    assert (df["n_dup_docs"] <= df["n_docs"]).all()
    assert ((df["dup_rate"] >= 0) & (df["dup_rate"] <= 1)).all()


def test_dedup_horizon_monotone(spark):
    df = _run(spark, "stream_dedup_horizon_sweep").sort_values(
        "horizon_hours"
    )
    assert df["n_suppressed"].is_monotonic_increasing or (
        df["n_suppressed"].diff().dropna() >= 0
    ).all()
    assert ((df["suppress_share"] >= 0) & (df["suppress_share"] <= 1)).all()


def test_microbatch_sweep_laws(spark):
    df = _run(spark, "stream_microbatch_size_sweep").sort_values(
        "batch_size"
    )
    assert (df["n_batches"].diff().dropna() <= 0).all()
    assert (df["avg_events"].diff().dropna() >= 0).all()
    assert (df["max_windows"].diff().dropna() >= 0).all()
    assert (df["avg_events"] <= df["batch_size"]).all()


def test_prefix_sums_property(spark):
    """The two-level bucketed prefix scan behind A66/A67 must equal a
    naive sequential prefix sum for any distinct-key relation —
    including keys straddling bucket boundaries and sparse/dense mixes
    (the helper is load-bearing for every rank statistic)."""
    import random

    from smart_contract_database_builder_spark.plans.relational_ext import (
        _prefix_sums,
    )

    rng = random.Random(7)
    keys = sorted(
        rng.sample(range(0, 5 * (1 << 20)), 400)  # spans ~5 buckets
        + [0, (1 << 20) - 1, 1 << 20, (1 << 20) + 1, 5 * (1 << 20) - 1]
    )
    rows = [(k, rng.randint(-3, 9), rng.randint(0, 5)) for k in keys]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    got = {
        r.k: (r.ca_ex, r.cb_in)
        for r in _prefix_sums(
            df, "k", [("a", "ca_ex", False), ("b", "cb_in", True)]
        ).collect()
    }
    ca = cb = 0
    for k, a, b in rows:
        cb += b
        assert got[k] == (ca, cb), k
        ca += a
