"""Property tests for the training-pipeline operators added in round 4:
reproducible mix-sampling, sequence packing, and the decontamination
overlap join. Cross-engine value parity lives in test_oracle_parity;
these pin the operator-level invariants the oracle can't express.
"""

import pyspark.sql.functions as F
import pytest

from smart_contract_database_builder_spark.plans.llm_ops import (
    _DECON_MOD,
    _DECON_REM,
    _MIX_THR_EN,
    _MIX_THR_OTHER,
    _PACK_CTX,
    llm_decontaminate_overlap,
    llm_mix_sample_by_lang,
    llm_sequence_packing,
)

SF = "/root/testdata/sf0.01"


def test_mix_sample_is_monotone_in_threshold(spark):
    """Raising a threshold only ADDS docs — the kept set at a lower
    threshold is a subset of the kept set at a higher one. This is the
    property RNG sampling lacks and the whole point of hash gating."""
    from smart_contract_database_builder_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    h4 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    lo = {
        r.doc_id
        for r in docs.filter(h4 < "3000").select("doc_id").collect()
    }
    hi = {
        r.doc_id
        for r in docs.filter(h4 < "9000").select("doc_id").collect()
    }
    assert lo and lo < hi


def test_mix_sample_rates_track_thresholds(spark):
    """Achieved keep-rates land near the hex-threshold fractions
    (4-hex-digit uniform hash ⇒ rate ≈ thr/65536)."""
    kept = llm_mix_sample_by_lang(spark, SF).groupBy("lang").count()
    from smart_contract_database_builder_spark.sources.tables import load_table

    totals = (
        load_table(spark, SF, "documents").groupBy("lang").count()
        .withColumnRenamed("count", "total")
    )
    rows = kept.join(totals, "lang").collect()
    assert rows
    for r in rows:
        want = (
            int(_MIX_THR_EN, 16) if r.lang == "en" else int(_MIX_THR_OTHER, 16)
        ) / 65536
        assert abs(r["count"] / r.total - want) < 0.15, r


def test_mix_sample_partitioning_independent(spark):
    """The kept set is identical at any partition count — hash gating
    is order- and layout-free."""
    base = {r.doc_id for r in llm_mix_sample_by_lang(spark, SF).collect()}
    from smart_contract_database_builder_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").repartition(7)
    h4 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    thr = F.when(F.col("lang") == "en", F.lit(_MIX_THR_EN)).otherwise(
        F.lit(_MIX_THR_OTHER)
    )
    again = {r.doc_id for r in docs.filter(h4 < thr).select("doc_id").collect()}
    assert base == again


def test_sequence_packing_invariants(spark):
    """Within every shard: offsets are the exact prefix sums of token
    counts in doc_id order (no gaps, no overlap), pack ids are
    monotone, and a doc crosses a boundary iff its token span straddles
    a multiple of the context length."""
    rows = llm_sequence_packing(spark, SF).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: r.doc_id)
        off = 0
        prev_pack = 0
        for r in docs:
            assert r.start_off == off, (src, r)
            assert r.pack_id == off // _PACK_CTX
            assert r.pack_id >= prev_pack
            end = off + r.n_tok
            want_cross = (end - 1) // _PACK_CTX > off // _PACK_CTX
            assert r.crosses_boundary == want_cross, (src, r)
            off = end
            prev_pack = r.pack_id


def test_decontaminate_excludes_benchmark_docs(spark):
    """Benchmark-slice docs are never scored against themselves, and
    every flagged doc really is outside the benchmark slice with a
    sane overlap fraction."""
    rows = llm_decontaminate_overlap(spark, SF).collect()
    assert rows, "expected at least one contaminated doc at sf0.01"
    for r in rows:
        assert r.doc_id % _DECON_MOD != _DECON_REM
        assert 0 < r.n_contaminated <= r.n_grams
        assert 0.0 < r.contaminated_frac <= 1.0


def test_chunking_tiles_every_document(spark):
    """Per doc: chunk starts advance by exactly the stride, lengths are
    clamped to the doc's token count, consecutive chunks overlap by
    window-minus-stride, and the union of chunk spans covers [0, n_tok)
    with no gap."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _CHUNK_STRIDE,
        _CHUNK_TOKENS,
        llm_chunk_documents,
    )
    from smart_contract_database_builder_spark.sources.tables import load_table

    n_tok = {
        r.doc_id: r.n
        for r in load_table(spark, SF, "documents")
        .select(
            "doc_id",
            F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n"),
        )
        .collect()
    }
    rows = llm_chunk_documents(spark, SF).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_tok)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = n_tok[doc_id]
        for i, c in enumerate(chunks):
            assert c.chunk_idx == i
            assert c.start_tok == i * _CHUNK_STRIDE
            assert c.chunk_len == min(_CHUNK_TOKENS, n - c.start_tok)
            assert c.chunk_len >= 1
        # full coverage: last chunk reaches the end of the doc
        last = chunks[-1]
        assert last.start_tok + last.chunk_len == n
        assert last.start_tok + _CHUNK_STRIDE >= n  # no missing chunk after


def test_pii_redaction_counts_and_negative_control(spark):
    """Every %3==0 doc loses exactly one email, every %3==1 doc exactly
    one phone, and the %3==2 negative-control docs are untouched (the
    word-salad corpus contains no organic PII)."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        llm_pii_redaction,
    )

    rows = llm_pii_redaction(spark, SF).collect()
    assert rows
    for r in rows:
        want_email = 1 if r.doc_id % 3 == 0 else 0
        want_phone = 1 if r.doc_id % 3 == 1 else 0
        assert r.n_emails == want_email, r
        assert r.n_phones == want_phone, r


def test_pii_redaction_removes_the_pii(spark):
    """The redacted text hash equals md5 of the expected redacted
    string, i.e. the placeholder really replaced the injected span."""
    import hashlib

    from smart_contract_database_builder_spark.plans.llm_ops import (
        llm_pii_redaction,
    )
    from smart_contract_database_builder_spark.sources.tables import load_table

    text = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 30)
        .collect()
    }
    rows = [r for r in llm_pii_redaction(spark, SF).collect() if r.doc_id < 30]
    for r in rows:
        t = text[r.doc_id]
        if r.doc_id % 3 == 0:
            want = t + " contact <EMAIL> now"
        elif r.doc_id % 3 == 1:
            want = t + " call <PHONE> today"
        else:
            want = t
        assert r.redacted_hash == hashlib.md5(want.encode()).hexdigest(), r
        assert r.redacted_len == len(want)


def test_vocab_coverage_is_a_proper_cdf(spark):
    """Ranks are dense from 1, counts are non-increasing, cumulative
    share is strictly increasing and ends at the true covered
    fraction (== 1.0 when the whole vocab fits in the report)."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _VOCAB_TOP,
        llm_vocab_coverage,
    )

    rows = sorted(llm_vocab_coverage(spark, SF).collect(), key=lambda r: r.term_rank)
    assert rows
    cum = 0
    prev_c = None
    for i, r in enumerate(rows, 1):
        assert r.term_rank == i
        if prev_c is not None:
            assert r.term_count <= prev_c
        prev_c = r.term_count
        cum += r.term_count
        assert r.cum_count == cum
    assert rows[-1].cum_frac <= 1.0
    if len(rows) < _VOCAB_TOP:  # whole vocabulary reported
        assert rows[-1].cum_frac == 1.0
