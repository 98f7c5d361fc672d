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
