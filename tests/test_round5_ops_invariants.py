"""Structural invariants for the round-5 pipeline operators.

Oracle parity (tests/test_oracle_parity.py) already proves Spark ==
DuckDB on these queries; these tests pin properties that BOTH engines
could get wrong together — the invariants a pipeline consumer relies
on, independent of any twin-implementation consensus.
"""

from __future__ import annotations

from smart_contract_database_builder_spark import plans

from conftest import SF_SMOKE


def _run(name, spark, sf=SF_SMOKE):
    return plans.QUERIES[name].fn(spark, sf).collect()


def test_duplicate_spans_bounds_and_witness(spark):
    rows = _run("llm_duplicate_spans", spark)
    assert rows, "empty result"
    for r in rows:
        assert 0 <= r.n_dup_spans <= r.n_spans, r
        assert 0.0 <= r.dup_frac <= 1.0, r
        if r.n_spans > 0:
            assert abs(r.dup_frac - r.n_dup_spans / r.n_spans) < 1e-12
    # duplication needs a witness: if ANY doc has dup spans, at least
    # one OTHER doc must too (a shared span implicates both sides)
    dup_docs = [r for r in rows if r.n_dup_spans > 0]
    assert len(dup_docs) != 1, "a duplicated span cannot have one owner"


def test_span_trim_bounds_and_consistency(spark):
    import hashlib

    rows = {r.doc_id: r for r in _run("llm_span_dedup_trim", spark)}
    assert rows
    empty_md5 = hashlib.md5(b"").hexdigest()
    for r in rows.values():
        assert 0 <= r.n_removed <= r.n_tok, r
        # fully-trimmed doc <=> hash of the empty string
        assert (r.kept_hash == empty_md5) == (r.n_removed == r.n_tok), r
    # the trim must actually fire on this corpus (it contains dup docs)
    assert sum(r.n_removed for r in rows.values()) > 0
    # ...but must NOT remove everything everywhere
    assert any(r.n_removed == 0 for r in rows.values())
    # consistency with the scoring twin: a doc with zero spans shared
    # with ANY other doc and no internal repetition loses nothing
    scores = {r.doc_id: r for r in _run("llm_duplicate_spans", spark)}
    for doc_id, s in scores.items():
        if s.n_dup_spans == 0 and rows[doc_id].n_removed > 0:
            # only possible via within-doc span repetition; verify
            from smart_contract_database_builder_spark.sources.tables import (
                load_table,
            )

            text = (
                load_table(spark, SF_SMOKE, "documents")
                .filter(f"doc_id = {doc_id}")
                .collect()[0]
                .text
            )
            toks = text.strip().lower().split()
            grams = [" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)]
            assert len(grams) != len(set(grams)), (
                f"doc {doc_id} trimmed without any duplicated span"
            )


def test_incremental_dedup_split_and_disjointness(spark):
    kept = _run("llm_incremental_dedup", spark)
    from smart_contract_database_builder_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    raw = load_table(spark, SF_SMOKE, "documents")
    key = F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "))
    keyed = raw.select(
        "doc_id",
        F.substring("source", 4, 10).cast("int").alias("src_num"),
        key.alias("content_key"),
    ).collect()
    corpus_keys = {r.content_key for r in keyed if r.src_num < 10}
    incoming = [r for r in keyed if r.src_num >= 10]
    kept_ids = {r.doc_id for r in kept}
    for r in kept:
        assert r.content_key not in corpus_keys, "kept a corpus duplicate"
        assert int(r.source[3:]) >= 10, "emitted a corpus-side doc"
    # everything not kept from the incoming batch must be justified by a
    # corpus collision
    for r in incoming:
        if r.doc_id not in kept_ids:
            assert r.content_key in corpus_keys, (
                f"doc {r.doc_id} dropped without a corpus collision"
            )


def test_gopher_filter_keep_is_conjunction_of_rules(spark):
    rows = _run("llm_gopher_quality_filter", spark)
    assert rows
    for r in rows:
        expect = (
            20 <= r.n_tok <= 1000
            and 2.0 <= r.mean_word_len <= 10.0
            and r.top_token_frac <= 0.2
            and r.has_stopword
        )
        assert r.keep == expect, r
    # the rule chain must actually discriminate on the corpus
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept  # not everything is dropped


def test_training_order_is_a_bijection_with_dense_ranks(spark):
    rows = _run("llm_training_order", spark)
    n = len(rows)
    assert n > 0
    # every doc appears exactly once
    assert len({r.doc_id for r in rows}) == n
    # (shard, pos) is unique and positions are dense 1..|shard|
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < 8
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # determinism: a second run yields the identical assignment
    again = {r.doc_id: (r.shard, r.pos_in_shard) for r in _run("llm_training_order", spark)}
    assert again == {r.doc_id: (r.shard, r.pos_in_shard) for r in rows}
    # order is key-driven, not doc_id-driven: within a shard, positions
    # sorted by doc_id must NOT be simply 1,2,3,... for every shard
    # (that would mean the "shuffle" preserved input order everywhere)
    preserved = 0
    for shard, _ in by_shard.items():
        docs = sorted(
            (r.doc_id, r.pos_in_shard) for r in rows if r.shard == shard
        )
        if [p for _, p in docs] == sorted(p for _, p in docs):
            preserved += 1
    assert preserved < len(by_shard), "seeded shuffle preserved input order"


def test_curation_pipeline_is_consistent_with_its_stages(spark):
    """The composed pipeline's (lang, source) totals must be derivable
    from its own standalone stages run independently."""
    from pyspark.sql import functions as F
    from smart_contract_database_builder_spark.sources.tables import load_table
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _DECON_MOD,
        _DECON_REM,
        _MIX_THR_EN,
        _MIX_THR_OTHER,
        _tokens,
    )

    sf = SF_SMOKE
    quality = {
        r.doc_id
        for r in _run("llm_gopher_quality_filter", spark, sf)
        if r.keep
    }
    contaminated = {
        r.doc_id
        for r in plans.QUERIES["llm_decontaminate_overlap"].fn(spark, sf).collect()
    }
    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")).alias("ck"),
        F.size(_tokens()).alias("n_tok"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4).alias("h4"),
    ).collect()
    keyed = [r for r in docs if r.doc_id in quality]
    canonical = {}
    for r in keyed:
        if r.ck not in canonical or r.doc_id < canonical[r.ck]:
            canonical[r.ck] = r.doc_id
    expect = {}
    for r in keyed:
        if canonical[r.ck] != r.doc_id:
            continue
        if r.doc_id % _DECON_MOD == _DECON_REM or r.doc_id in contaminated:
            continue
        thr = _MIX_THR_EN if r.lang == "en" else _MIX_THR_OTHER
        if not r.h4 < thr:
            continue
        k = (r.lang, r.source)
        n, t = expect.get(k, (0, 0))
        expect[k] = (n + 1, t + r.n_tok)

    got = {
        (r.lang, r.source): (r.n_docs, r.n_tokens)
        for r in _run("llm_curation_pipeline", spark, sf)
    }
    assert got == expect
    assert len(got) > 0
