"""Registry curation invariants.

The correctness driver processes queries in registration order and
records only the FIRST 50 — round 2 lost 17 CORRECTNESS rows purely by
position (every MinHash/ANN/TF-IDF/streaming query registered after the
cut). These tests pin the curation so the window can't silently regress:
every oracle-carrying query must sit inside the window, and only the
genuinely rows-only queries (engine-internal RNG/sketches/codecs) may
trail beyond it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark import plans

_DRIVER_WINDOW = 50


def test_every_oracle_query_is_inside_the_driver_window():
    names = list(plans.QUERIES)
    late = [
        n
        for i, n in enumerate(names)
        if plans.QUERIES[n].oracle is not None and i >= _DRIVER_WINDOW
    ]
    assert late == [], f"oracle queries beyond the driver window: {late}"


def test_similarity_and_streaming_queries_lead():
    """The round-2 casualties must be registered first."""
    head = list(plans.QUERIES)[:14]
    for name in (
        "llm_minhash_lsh_pairs",
        "llm_ann_bucketed_cosine_pairs",
        "llm_cosine_topk_bruteforce",
        "llm_tfidf_top_terms",
        "stream_tumbling_window_counts",
        "stream_session_windows",
        "stream_dedup_first_event",
        "stream_static_enrich_segments",
        "ref_extract_functions",
        "ref_sink_roundtrip",
    ):
        assert name in head, f"{name} not in the registry head: {head}"


def test_only_genuinely_rows_only_queries_trail():
    names = list(plans.QUERIES)
    trailing = names[_DRIVER_WINDOW:]
    assert all(plans.QUERIES[n].oracle is None for n in trailing)
    # each trailing query documents WHY it has no oracle
    for n in trailing:
        doc = plans.QUERIES[n].doc.lower()
        assert "rows-only" in doc or "rows only" in doc, n
