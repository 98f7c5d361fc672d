"""Structural invariants for the round-7 operators — properties the
cross-engine oracle can't see (a bug shared by both engines' SQL shape
would survive the parity sweep; these pin the math directly).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_contract_database_builder_spark import plans
from smart_contract_database_builder_spark.sources.tables import load_table

from conftest import SF_ORACLE


def _run(spark, name):
    return plans.QUERIES[name].fn(spark, SF_ORACLE)


def test_order_count_distribution_conserves_totals(spark):
    """The histogram must conserve both customers and orders: Σ
    n_customers = |customer| and Σ (c_count × n_customers) = |orders|
    — and the left join must surface a zero-order bucket if any
    customer never ordered."""
    rows = _run(spark, "agg_order_count_distribution").collect()
    n_cust = load_table(spark, SF_ORACLE, "customer").count()
    n_ord = load_table(spark, SF_ORACLE, "orders").count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert sum(r["c_count"] * r["n_customers"] for r in rows) == n_ord


def test_small_quantity_revenue_bounds(spark):
    """The Q17 aggregate must count a strict subset of the brand's
    lineitems and produce positive revenue."""
    row = _run(spark, "agg_small_quantity_revenue").collect()[0]
    part = load_table(spark, SF_ORACLE, "part").filter(
        F.col("p_brand") == "Brand#9"
    )
    li = load_table(spark, SF_ORACLE, "lineitem")
    brand_li = li.join(part, li.l_partkey == part.p_partkey).count()
    assert 0 < row["n_small"] < brand_li
    assert row["avg_yearly"] > 0


def test_important_parts_threshold_is_selective(spark):
    """Every kept part must exceed the 1/2000 share of total revenue,
    and the cut must actually select (neither empty nor everything)."""
    rows = _run(spark, "agg_important_parts").collect()
    li = load_table(spark, SF_ORACLE, "lineitem")
    total = li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("t")
    ).collect()[0]["t"]
    n_parts = li.select("l_partkey").distinct().count()
    assert 0 < len(rows) < n_parts
    thr = float(total) / 2000.0
    for r in rows:
        assert r["part_value"] > thr * 0.999  # double rendering slack


def test_parts_supplier_counts_bounds(spark):
    rows = _run(spark, "agg_parts_supplier_counts").collect()
    n_supp = load_table(spark, SF_ORACLE, "supplier").count()
    assert rows
    for r in rows:
        assert 1 <= r["supplier_cnt"] <= n_supp
        assert r["p_brand"] != "Brand#1" and r["p_type"] != "PROMO"


def test_ntile_quartiles_are_balanced_and_ordered(spark):
    """Per priority: exactly 4 bins, bin sizes differ by ≤ 1 (the NTILE
    contract), and price ranges are non-overlapping in quartile order
    (boundaries may touch on duplicate prices)."""
    rows = _run(spark, "window_ntile_quartiles").collect()
    by_prio: dict[str, dict[int, dict]] = {}
    for r in rows:
        by_prio.setdefault(r["o_orderpriority"], {})[r["quartile"]] = r
    for prio, bins in by_prio.items():
        assert sorted(bins) == [1, 2, 3, 4], prio
        sizes = [bins[q]["n"] for q in (1, 2, 3, 4)]
        assert max(sizes) - min(sizes) <= 1, (prio, sizes)
        for q in (1, 2, 3):
            assert bins[q]["hi"] <= bins[q + 1]["lo"], (prio, q)
        for q in (1, 2, 3, 4):
            assert bins[q]["lo"] <= bins[q]["hi"]


def test_mad_outliers_bounds(spark):
    """MAD flags at most a minority; the median sits inside the data
    range; recomputing the flag count from raw prices agrees."""
    row = _run(spark, "agg_mad_outliers").collect()[0]
    orders = load_table(spark, SF_ORACLE, "orders")
    n = orders.count()
    assert 0 <= row["n_outliers"] < n / 2
    assert abs(row["outlier_share"] - row["n_outliers"] / n) < 1e-12
    lohi = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    ).collect()[0]
    assert lohi["lo"] <= row["median_price"] <= lohi["hi"]
    assert row["mad"] >= 0
    from smart_contract_database_builder_spark.plans.relational_ext import (
        _MAD_K,
    )

    cutoff = row["mad"] * _MAD_K
    recount = orders.filter(
        F.abs(F.col("o_totalprice") - F.lit(row["median_price"])) > cutoff
    ).count()
    assert recount == row["n_outliers"]


def test_gapfill_axis_is_dense_and_conservative(spark):
    """The output is one row per calendar day of the observed span —
    no holes, no extras — and gap rows are exactly the days with no
    orders (zero revenue, zero count)."""
    import datetime

    rows = _run(spark, "scalar_gapfill_daily_revenue").collect()
    days = [datetime.date.fromisoformat(r["day"]) for r in rows]
    days_sorted = sorted(days)
    assert len(days) == len(set(days))
    assert (days_sorted[-1] - days_sorted[0]).days + 1 == len(days)
    orders = load_table(spark, SF_ORACLE, "orders")
    n_obs_days = (
        orders.select(F.to_date("o_orderdate").alias("d")).distinct().count()
    )
    non_gap = [r for r in rows if not r["is_gap"]]
    assert len(non_gap) == n_obs_days
    for r in rows:
        if r["is_gap"]:
            assert r["revenue"] == 0.0 and r["n_orders"] == 0
        else:
            assert r["n_orders"] > 0
    assert sum(r["n_orders"] for r in rows) == orders.count()


def test_ohlc_bars_are_internally_consistent(spark):
    rows = _run(spark, "agg_ohlc_daily_value").collect()
    assert rows
    for r in rows:
        assert r["px_low"] <= r["px_high"]
        assert r["px_low"] <= r["px_open"] <= r["px_high"]
        assert r["px_low"] <= r["px_close"] <= r["px_high"]
        assert r["n_events"] > 0


def test_edit_distance_pairs_within_candidates_and_bound(spark):
    """Every emitted pair is an LSH candidate pair and respects the
    _ED_MAX cutoff; a doc paired with itself is impossible."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _ED_MAX,
        _tokens,
        fan_out_if_narrow,
        minhash_candidate_pairs,
    )

    rows = _run(spark, "llm_edit_distance_pairs").collect()
    assert rows
    docs = load_table(spark, SF_ORACLE, "documents")
    toked = fan_out_if_narrow(docs.select("doc_id", _tokens().alias("t")))
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(toked).collect()
    }
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0 <= r["edit_distance"] <= _ED_MAX
        assert (r["doc_a"], r["doc_b"]) in cand


def test_ngram_novelty_bounds_and_ref_exclusion(spark):
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _DECON_MOD,
        _DECON_REM,
    )

    rows = _run(spark, "llm_ngram_novelty").collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % _DECON_MOD != _DECON_REM
        assert 0 <= r["n_novel"] <= r["n_grams"]
        assert abs(r["novelty"] - r["n_novel"] / r["n_grams"]) < 1e-12


def test_semdedup_one_representative_per_cluster(spark):
    """Exactly one representative per cluster, and it is the (dist,
    vec_id)-argmin of its cluster; assignments agree with the k-means
    query (shared _km_state)."""
    rows = _run(spark, "llm_semdedup_representatives").collect()
    km = {
        r["vec_id"]: (r["cluster"], r["dist_fp2"])
        for r in _run(spark, "llm_kmeans_lloyd").collect()
    }
    assert len(rows) == len(km)
    by_cluster: dict[int, list] = {}
    for r in rows:
        assert km[r["vec_id"]] == (r["cluster"], r["dist_fp2"])
        by_cluster.setdefault(r["cluster"], []).append(r)
    for cl, members in by_cluster.items():
        reps = [m for m in members if m["is_representative"]]
        assert len(reps) == 1, cl
        best = min((m["dist_fp2"], m["vec_id"]) for m in members)
        assert (reps[0]["dist_fp2"], reps[0]["vec_id"]) == best


def test_mode_token_share_and_coverage(spark):
    rows = _run(spark, "llm_mode_token_by_lang").collect()
    docs = load_table(spark, SF_ORACLE, "documents")
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert {r["lang"] for r in rows} == langs
    for r in rows:
        assert 0 < r["share"] <= 1
        assert r["cnt"] >= 1 and r["top_token"]


def test_readability_formula_recomputes(spark):
    rows = _run(spark, "llm_readability_scores").collect()
    assert rows
    for r in rows:
        assert r["n_words"] >= 1
        assert r["n_sentences"] >= 1 and r["n_syllables"] >= 1
        expect = (
            206.835
            - 1.015 * (r["n_words"] / r["n_sentences"])
            - 84.6 * (r["n_syllables"] / r["n_words"])
        )
        assert r["flesch"] == expect


def test_zipf_slope_is_negative_and_full_rank(spark):
    from smart_contract_database_builder_spark.plans.llm_ops import _ZIPF_N

    row = _run(spark, "llm_zipf_slope_report").collect()[0]
    docs = load_table(spark, SF_ORACLE, "documents")
    vocab = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t")
        )
        .distinct()
        .count()
    )
    assert row["n_terms"] == min(_ZIPF_N, vocab)
    # natural-ish text: frequency decays with rank
    assert -3.0 < row["zipf_slope"] < 0.0


def _py_bpe(words: dict[str, int], n_merges: int):
    """Reference greedy BPE trainer (pure Python): per iteration, count
    adjacent pairs weighted by word count, merge the (count desc, pair
    asc) argmax greedily left-to-right in every word."""
    vocab = {w: list(w) for w in words}
    merges = []
    for it in range(1, n_merges + 1):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + words[w]
        if not pc:
            break
        (p1, p2), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((it, p1, p2, p1 + p2, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == p1 and syms[i + 1] == p2:
                    out.append(p1 + p2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_matches_pure_python_reference(spark):
    """The distributed trainer must reproduce the sequential greedy BPE
    reference exactly on the real corpus vocabulary."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _BPE_MERGES,
    )

    rows = _run(spark, "llm_bpe_train_merges").collect()
    docs = load_table(spark, SF_ORACLE, "documents")
    words = {
        r["w"]: r["c"]
        for r in docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    expect = _py_bpe(words, _BPE_MERGES)
    got = [
        (
            r["iteration"],
            r["left_sym"],
            r["right_sym"],
            r["merged"],
            r["pair_count"],
        )
        for r in sorted(rows, key=lambda r: r["iteration"])
    ]
    assert got == expect


def test_bpe_islands_handle_self_pairs(spark, tmp_path):
    """Adversarial pin for the islands trick: a corpus dominated by a
    self-overlapping pair (x,x) must merge greedily left-to-right —
    'xxxx' → [xx, xx], 'xxx' → [xx, x] — exactly like the sequential
    reference."""
    import pandas as pdd

    from smart_contract_database_builder_spark.plans.llm_ops import (
        _BPE_MERGES,
        llm_bpe_train_merges,
    )

    corpus = ["xxxx xxxx xxx", "xxxx xx ab", "xxxx xxx ab ab"]
    pdf = pdd.DataFrame(
        {
            "doc_id": range(len(corpus)),
            "text": corpus,
            "lang": ["en"] * len(corpus),
            "source": ["s"] * len(corpus),
            "n_chars": [len(t) for t in corpus],
        }
    )
    sf = str(tmp_path / "selfpair")
    spark.createDataFrame(pdf).write.parquet(f"{sf}/documents.parquet")
    rows = llm_bpe_train_merges(spark, sf).collect()
    words: dict[str, int] = {}
    for line in corpus:
        for w in line.split():
            words[w] = words.get(w, 0) + 1
    expect = _py_bpe(words, _BPE_MERGES)
    got = [
        (
            r["iteration"],
            r["left_sym"],
            r["right_sym"],
            r["merged"],
            r["pair_count"],
        )
        for r in sorted(rows, key=lambda r: r["iteration"])
    ]
    assert got == expect
    # the first merge must be the self pair, counted greedily:
    # xxxx→2 per occurrence, xxx→1 per occurrence, xx→1
    assert got[0][1] == "x" and got[0][2] == "x"


def test_bpe_segmentation_reconstructs_words(spark):
    """Concatenating each word's segments (modulo separators) must give
    the word back, and the emitted merges are the only multi-char
    symbols that can appear."""
    segs = _run(spark, "llm_bpe_segment_vocab").collect()
    merges = {
        r["merged"] for r in _run(spark, "llm_bpe_train_merges").collect()
    }
    assert segs
    for r in segs:
        syms = r["segmentation"].split(" ")
        assert len(syms) == r["n_syms"]
        assert "".join(syms) == r["word"]
        for s in syms:
            assert len(s) == 1 or s in merges, (r["word"], s)


def test_langid_confusion_rows_sum_to_one(spark):
    rows = _run(spark, "llm_langid_confusion_matrix").collect()
    docs = load_table(spark, SF_ORACLE, "documents")
    by_label: dict[str, list] = {}
    for r in rows:
        by_label.setdefault(r["labeled_lang"], []).append(r)
        assert r["is_correct"] == (r["labeled_lang"] == r["predicted_lang"])
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert set(by_label) == langs
    for lang, cells in by_label.items():
        assert abs(sum(c["row_share"] for c in cells) - 1.0) < 1e-9, lang
    assert sum(r["n"] for r in rows) == docs.count()


def test_rolling_7day_revenue_recomputes(spark):
    """The rolling sum over the dense axis must equal a direct Python
    recompute from the gap-fill rows, and early rows must report their
    shorter window honestly."""
    gf = {
        r["day"]: r["revenue"]
        for r in _run(spark, "scalar_gapfill_daily_revenue").collect()
    }
    rows = sorted(
        _run(spark, "window_rolling_7day_revenue").collect(),
        key=lambda r: r["day"],
    )
    days = [r["day"] for r in rows]
    assert days == sorted(gf)
    for i, r in enumerate(rows):
        lo = max(0, i - 6)
        window_days = days[lo : i + 1]
        assert r["rolling_n_days"] == len(window_days)
        expect = sum(gf[d] for d in window_days)
        assert abs(r["rolling_7d_revenue"] - expect) < 1e-6
        assert r["revenue"] == gf[r["day"]]


def _plan(spark, name, executed=False):
    df = plans.QUERIES[name].fn(spark, SF_ORACLE)
    if executed:
        df.collect()
        return df._jdf.queryExecution().executedPlan().toString()
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_ohlc_plan_has_no_window(spark):
    """The OHLC docstring's claim: open/close come from struct-extrema
    aggregates, so the plan must carry NO window operator (the oracle's
    QUALIFY windows are the shape Spark deliberately avoids)."""
    assert "Window" not in _plan(spark, "agg_ohlc_daily_value")


def test_mode_token_plan_has_no_window(spark):
    """Mode-per-language runs as aggregates only — no window over the
    vocabulary relation (partition-local SortAggregate is expected for
    the immutable struct buffer; a Window node is not)."""
    assert "Window" not in _plan(spark, "llm_mode_token_by_lang")


def test_gapfill_calendar_broadcasts(spark):
    """The generated O(days) calendar must broadcast into the join —
    the fact side never reshuffles for the gap-fill."""
    assert "BroadcastHashJoin" in _plan(spark, "scalar_gapfill_daily_revenue")


def test_important_parts_reuses_the_partkey_aggregate(spark):
    """The docstring's 'scanned once' claim: the global total derives
    from the SAME partkey aggregate, so the executed adaptive plan must
    contain a ReusedExchange (the pv subtree built once, read twice)."""
    plan = _plan(spark, "agg_important_parts", executed=True)
    assert "ReusedExchange" in plan


def test_pivot_is_one_aggregation_no_join(spark):
    """n_total rides the SAME single aggregation pass: exactly one
    partial+final HashAggregate pair and no join anywhere (the r6
    ADVICE fix must not have introduced a second scan)."""
    plan = _plan(spark, "agg_pivot_daily_event_matrix")
    assert "Join" not in plan
    assert plan.count("HashAggregate") == 2


def test_pagerank_recomputes_in_python(spark):
    """The fixed-point PageRank must match an independent sequential
    recompute from the candidate edges — iteration order, floor
    divisions and damping exactly."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _PR_ITERS,
        _tokens,
        fan_out_if_narrow,
        minhash_candidate_pairs,
    )

    rows = {r["doc_id"]: r for r in _run(spark, "llm_pagerank_candidates").collect()}
    docs = load_table(spark, SF_ORACLE, "documents")
    toked = fan_out_if_narrow(docs.select("doc_id", _tokens().alias("t")))
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(toked).collect()
    ]
    out: dict[int, list[int]] = {}
    for a, b in pairs:
        out.setdefault(a, []).append(b)
        out.setdefault(b, []).append(a)
    deg = {n: len(vs) for n, vs in out.items()}
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _PR_BASE,
        _PR_DAMP,
        _PR_DEN,
    )

    rank = {n: 1_000_000 for n in out}
    for _ in range(_PR_ITERS):
        acc = {n: 0 for n in out}
        for n, vs in out.items():
            c = rank[n] // deg[n]
            for v in vs:
                acc[v] += c
        rank = {
            n: _PR_BASE + (acc[n] * _PR_DAMP) // _PR_DEN for n in out
        }
    assert set(rows) == set(out)
    for n in out:
        assert rows[n]["degree"] == deg[n], n
        assert rows[n]["rank_fp"] == rank[n], n


def test_idle_rich_customers_recomputes(spark):
    """Per-nation counts must equal a direct recompute of the
    above-average + inactive-since-cutoff predicate."""
    rows = _run(spark, "agg_idle_rich_customers").collect()
    cust = load_table(spark, SF_ORACLE, "customer")
    orders = load_table(spark, SF_ORACLE, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("a")
        )
        .collect()[0]["a"]
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    direct = (
        cust.filter(F.col("c_acctbal") > avg_bal)
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    want = {r["c_nationkey"]: r["count"] for r in direct}
    got = {r["c_nationkey"]: r["n_customers"] for r in rows}
    assert got == want and got


def test_excess_quantity_suppliers_bounds(spark):
    from smart_contract_database_builder_spark.plans.relational_ext import (
        _EXCESS_QTY,
    )

    rows = _run(spark, "join_excess_quantity_suppliers").collect()
    assert rows
    for r in rows:
        assert r["n_excess_parts"] >= 1
        assert r["total_excess_qty"] > _EXCESS_QTY * r["n_excess_parts"]


def test_bpe_encode_conserves_words_and_bounds_tokens(spark):
    """Per-doc word counts must match a direct tokenize; BPE tokens are
    between n_words (full merges) and total chars (no merges)."""
    rows = _run(spark, "llm_bpe_encode_stats").collect()
    docs = load_table(spark, SF_ORACLE, "documents")
    counts = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n"),
        ).collect()
    }
    assert len(rows) == len(counts)
    for r in rows:
        assert r["n_words"] == counts[r["doc_id"]]
        assert r["n_words"] <= r["n_bpe_tokens"]
        assert abs(
            r["tokens_per_word"] - r["n_bpe_tokens"] / r["n_words"]
        ) < 1e-12


def test_event_type_lift_recomputes(spark):
    """Lift must equal the exact ratio recomputed from distinct
    (user, type) sets, for every pair."""
    rows = _run(spark, "agg_event_type_lift").collect()
    ev = load_table(spark, SF_ORACLE, "events")
    ut = {
        (r["user_id"], r["event_type"])
        for r in ev.select("user_id", "event_type").distinct().collect()
    }
    users = {u for u, _ in ut}
    types = sorted({t for _, t in ut})
    per = {t: sum(1 for u2, t2 in ut if t2 == t) for t in types}
    got = {(r["type_a"], r["type_b"]): r for r in rows}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            n_both = sum(
                1 for u in users if (u, a) in ut and (u, b) in ut
            )
            if n_both == 0:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert r["n_both"] == n_both
            expect = (n_both * len(users)) / (per[a] * per[b])
            assert abs(r["lift"] - expect) < 1e-12


def test_ivfpq_results_live_in_probed_cells_and_agree_with_pq(spark):
    """Every IVF-PQ result must sit in one of the query's nprobe
    nearest cells, and any vector appearing in BOTH the IVF-PQ and the
    unpruned PQ top-10 must carry the identical ADC distance (pruning
    changes the candidate set, never the metric)."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _IVFPQ_NPROBE,
    )

    rows = _run(spark, "llm_ivfpq_topk").collect()
    assert len(rows) == 10
    cells = {r["cell"] for r in rows}
    assert len(cells) <= _IVFPQ_NPROBE
    d = [r["approx_d2"] for r in rows]
    assert d == sorted(d)
    pq = {r["vec_id"]: r["approx_d2"] for r in _run(spark, "llm_pq_topk").collect()}
    for r in rows:
        if r["vec_id"] in pq:
            assert pq[r["vec_id"]] == r["approx_d2"], r["vec_id"]


def test_ewma_recurrence_recomputes(spark):
    """The fixed-point EWMA must match a sequential Python recompute
    from the gap-filled axis (floor updates, cents integers), and the
    first day's EWMA equals its revenue."""
    gf = sorted(
        _run(spark, "scalar_gapfill_daily_revenue").collect(),
        key=lambda r: r["day"],
    )
    rows = sorted(
        _run(spark, "window_ewma_daily_revenue").collect(),
        key=lambda r: r["day"],
    )
    assert [r["day"] for r in rows] == [r["day"] for r in gf]
    from smart_contract_database_builder_spark.plans.relational_ext import (
        _EWMA_DEN,
        _EWMA_NUM,
    )

    prev = None
    for g, r in zip(gf, rows):
        c = round(g["revenue"] * 100)
        prev = (
            c
            if prev is None
            else (_EWMA_NUM * c + (_EWMA_DEN - _EWMA_NUM) * prev) // _EWMA_DEN
        )
        assert r["revenue"] == g["revenue"]
        assert round(r["ewma_revenue"] * 100) == prev, r["day"]


def test_curation_v2_is_a_readable_subset_of_v1(spark):
    """v2's survivors must be exactly v1's survivors minus the docs
    outside the Flesch band (stage composition check at the id level,
    finer than the rollup the oracle verifies)."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _CURATE_FLESCH_HI,
        _CURATE_FLESCH_LO,
        curate_documents,
    )

    docs = load_table(spark, SF_ORACLE, "documents")
    v1 = {r["doc_id"] for r in curate_documents(docs).collect()}
    v2 = {
        r["doc_id"]
        for r in curate_documents(
            docs,
            readability_band=(_CURATE_FLESCH_LO, _CURATE_FLESCH_HI),
        ).collect()
    }
    assert v2 < v1  # strictly smaller on this corpus
    flesch = {
        r["doc_id"]: r["flesch"]
        for r in plans.QUERIES["llm_readability_scores"].fn(
            spark, SF_ORACLE
        ).collect()
    }
    dropped = v1 - v2
    for d in dropped:
        assert not (
            _CURATE_FLESCH_LO <= flesch[d] <= _CURATE_FLESCH_HI
        ), d
    for d in v2:
        assert _CURATE_FLESCH_LO <= flesch[d] <= _CURATE_FLESCH_HI, d


def test_seasonal_naive_mape_recomputes(spark):
    """MAPE must equal a direct recompute from the gap-filled axis
    (lag-7 forecast, zero-actual days excluded)."""
    gf = sorted(
        _run(spark, "scalar_gapfill_daily_revenue").collect(),
        key=lambda r: r["day"],
    )
    row = _run(spark, "window_seasonal_naive_mape").collect()[0]
    apes = []
    for i in range(7, len(gf)):
        a, f = gf[i]["revenue"], gf[i - 7]["revenue"]
        if a > 0.0:
            apes.append(abs(a - f) / a)
    assert row["n_days"] == len(apes)
    assert abs(row["mape"] - sum(apes) / len(apes)) < 1e-9


def test_weekday_seasonality_indices_average_to_one(spark):
    """Day-count-weighted mean of the seasonality indices must be 1.0
    by construction, all 7 weekdays present, counts summing to the
    distinct-day total."""
    rows = _run(spark, "agg_weekday_seasonality").collect()
    assert sorted(r["weekday"] for r in rows) == [1, 2, 3, 4, 5, 6, 7]
    orders = load_table(spark, SF_ORACLE, "orders")
    n_days = (
        orders.select(F.to_date("o_orderdate").alias("d")).distinct().count()
    )
    assert sum(r["n_days"] for r in rows) == n_days
    weighted = sum(r["seasonality_index"] * r["n_days"] for r in rows)
    assert abs(weighted / n_days - 1.0) < 1e-9
    for r in rows:
        assert r["seasonality_index"] > 0


def test_curriculum_order_is_a_permutation_bucketed_easy_first(spark):
    """epoch_pos is a 1..N permutation; buckets are contiguous in the
    epoch order; bucket assignment is monotone in document length."""
    rows = _run(spark, "llm_curriculum_order").collect()
    n = len(rows)
    assert sorted(r["epoch_pos"] for r in rows) == list(range(1, n + 1))
    by_pos = sorted(rows, key=lambda r: r["epoch_pos"])
    buckets = [r["bucket"] for r in by_pos]
    assert buckets == sorted(buckets)  # contiguous easy→hard stages
    docs = load_table(spark, SF_ORACLE, "documents")
    length = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    max_len_by_bucket: dict[int, int] = {}
    for r in rows:
        b = r["bucket"]
        max_len_by_bucket[b] = max(
            max_len_by_bucket.get(b, 0), length[r["doc_id"]]
        )
    ordered = [max_len_by_bucket[b] for b in sorted(max_len_by_bucket)]
    assert ordered == sorted(ordered)


def test_incremental_neardup_agrees_with_pair_generator(spark):
    """A batch doc must be rejected iff it shares a capped band bucket
    with ≥1 corpus doc — recompute membership from the raw bands."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _INC_ND_MOD,
        _INC_ND_REM,
        _LSH_BUCKET_CAP,
        _tokens,
        _word_ngrams,
        fan_out_if_narrow,
        minhash_bands,
    )

    rows = {r["doc_id"]: r for r in _run(spark, "llm_incremental_neardup").collect()}
    docs = load_table(spark, SF_ORACLE, "documents")
    toked = fan_out_if_narrow(docs.select("doc_id", _tokens().alias("t")))
    sh = toked.select("doc_id", F.explode(_word_ngrams(F.col("t"))).alias("s"))
    bands = minhash_bands(sh).collect()
    corpus_by_bucket: dict[tuple, set] = {}
    batch_by_bucket: dict[tuple, set] = {}
    for r in bands:
        k = (r["band_idx"], r["key"])
        if r["doc_id"] % _INC_ND_MOD == _INC_ND_REM:
            batch_by_bucket.setdefault(k, set()).add(r["doc_id"])
        else:
            corpus_by_bucket.setdefault(k, set()).add(r["doc_id"])
    neighbors: dict[int, set] = {}
    for k, batch_docs in batch_by_bucket.items():
        corp = corpus_by_bucket.get(k, set())
        if not corp or len(corp) > _LSH_BUCKET_CAP:
            continue
        for d in batch_docs:
            neighbors.setdefault(d, set()).update(corp)
    batch_ids = {
        r["doc_id"] for r in bands if r["doc_id"] % _INC_ND_MOD == _INC_ND_REM
    }
    assert set(rows) == batch_ids
    for d in batch_ids:
        expect = len(neighbors.get(d, set()))
        assert rows[d]["n_corpus_neighbors"] == expect, d
        assert rows[d]["admitted"] == (expect == 0), d


def test_simhash_hamming_pairs_pigeonhole_recall(spark):
    """Brute-force recompute over the collected fingerprints: the
    banded operator must return EXACTLY the radius-3 pairs whose every
    shared block bucket is under the cap — and for uncapped fingerprint
    space, every in-radius pair must share at least one identical
    block (the pigeonhole guarantee the docstring claims)."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _LSH_BUCKET_CAP,
        _SIMH_BLOCK_W,
        _SIMH_BLOCKS,
        _SIMH_RADIUS,
    )
    from smart_contract_database_builder_spark.plans.reference_ext import (
        llm_simhash_documents,
    )

    fps = {
        r["doc_id"]: r["simhash"]
        for r in llm_simhash_documents(spark, SF_ORACLE)
        .select("doc_id", "simhash")
        .collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in _run(spark, "llm_simhash_hamming_pairs").collect()
    }
    # bucket occupancy per block
    occ: dict[tuple, int] = {}
    for d, s in fps.items():
        for b in range(_SIMH_BLOCKS):
            k = (b, s[b * _SIMH_BLOCK_W : (b + 1) * _SIMH_BLOCK_W])
            occ[k] = occ.get(k, 0) + 1
    ids = sorted(fps)
    expect = {}
    for i, a in enumerate(ids):
        for b_ in ids[i + 1:]:
            sa, sb = fps[a], fps[b_]
            h = sum(1 for x, y in zip(sa, sb) if x != y)
            if h > _SIMH_RADIUS:
                continue
            shared_ok = False
            shared_any = False
            for blk in range(_SIMH_BLOCKS):
                ka = sa[blk * _SIMH_BLOCK_W : (blk + 1) * _SIMH_BLOCK_W]
                kb = sb[blk * _SIMH_BLOCK_W : (blk + 1) * _SIMH_BLOCK_W]
                if ka == kb:
                    shared_any = True
                    if occ[(blk, ka)] <= _LSH_BUCKET_CAP:
                        shared_ok = True
            assert shared_any, (a, b_, h)  # pigeonhole
            if shared_ok:
                expect[(a, b_)] = h
    assert got == expect


def test_rolling_wau_recomputes(spark):
    """WAU per day must equal a direct recompute from distinct
    (user, day) activity; WAU ≥ that day's DAU."""
    ev = load_table(spark, SF_ORACLE, "events")
    ud = {
        (r["user_id"], r["d"])
        for r in ev.select(
            "user_id", F.to_date("ts").alias("d")
        ).distinct().collect()
    }
    days = sorted({d for _, d in ud})
    rows = {r["day"]: r["wau"] for r in _run(spark, "agg_rolling_wau").collect()}
    assert len(rows) == len(days)
    import datetime

    for d in days:
        lo = d - datetime.timedelta(days=6)
        expect = len({u for u, dd in ud if lo <= dd <= d})
        assert rows[d.isoformat()] == expect, d
        dau = len({u for u, dd in ud if dd == d})
        assert rows[d.isoformat()] >= dau


def test_winnow_collisions_group_structure(spark):
    """Every collision group has ≥2 docs, the canonical is its min
    member, and group membership matches the per-doc fingerprints from
    the simhash/winnow query."""
    fps: dict[int, int] = {
        r["doc_id"]: r["winnow_fp"]
        for r in plans.QUERIES["llm_simhash_documents"]
        .fn(spark, SF_ORACLE)
        .collect()
    }
    by_fp: dict[int, list] = {}
    for d, f in fps.items():
        by_fp.setdefault(f, []).append(d)
    expect = {
        f: (len(ds), min(ds)) for f, ds in by_fp.items() if len(ds) >= 2
    }
    got = {
        r["winnow_fp"]: (r["n_docs"], r["canonical_doc_id"])
        for r in _run(spark, "llm_winnow_collisions").collect()
    }
    assert got == expect and got


def test_kmeans_purity_recomputes(spark):
    """Purity per cluster must equal a recompute from the k-means
    assignments joined to labels; members sum to the corpus."""
    km = _run(spark, "llm_kmeans_lloyd").collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    by_cluster: dict[int, dict[int, int]] = {}
    for r in km:
        c = by_cluster.setdefault(r["cluster"], {})
        lab = labels[r["vec_id"]]
        c[lab] = c.get(lab, 0) + 1
    rows = {r["cluster"]: r for r in _run(spark, "llm_kmeans_purity").collect()}
    assert set(rows) == set(by_cluster)
    assert sum(r["n_members"] for r in rows.values()) == len(km)
    for cl, counts in by_cluster.items():
        top_label, n_top = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        r = rows[cl]
        assert r["n_members"] == sum(counts.values())
        assert (r["top_label"], r["n_top_label"]) == (top_label, n_top)
        assert abs(r["purity"] - n_top / r["n_members"]) < 1e-12


def test_yoy_growth_recomputes(spark):
    """Growth rates must equal the exact ratio of consecutive yearly
    revenues per nation; every first year is NULL, never 0."""
    rows = _run(spark, "agg_nation_revenue_yoy").collect()
    by_nation: dict[int, list] = {}
    for r in rows:
        by_nation.setdefault(r["c_nationkey"], []).append(r)
    assert by_nation
    for nk, rs in by_nation.items():
        rs.sort(key=lambda r: r["yr"])
        assert rs[0]["prev_revenue"] is None
        assert rs[0]["yoy_growth"] is None
        for prev, cur in zip(rs, rs[1:]):
            assert cur["prev_revenue"] == prev["revenue"]
            expect = (cur["revenue"] - prev["revenue"]) / prev["revenue"]
            assert abs(cur["yoy_growth"] - expect) < 1e-12
