"""Property test: substring_dedup_trim vs a pure-Python reference.

The DuckDB oracle proves Spark == DuckDB on the fixed corpus; this
proves both match the SEMANTICS on randomized colliding corpora — a
3-word vocabulary makes 8-token anchors repeat constantly, exercising
the cross-doc df>=2 gate (within-doc-only repeats must NOT be cut at
this grain, unlike the span grain), overlap unions, whole-doc removal,
and cross-doc canonical ordering. Complements
tests/test_span_trim_property.py one dedup grain over.
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from smart_contract_database_builder_spark.plans.llm_ops import (
    _SUBSTR_K,
    substring_dedup_trim,
)

_docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=30),
    min_size=1,
    max_size=8,
)


def _tokenize(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


def _reference_trim(texts: list[str]) -> dict[int, tuple[int, int, str]]:
    """Remove-all-but-first over CROSS-DOC shared _SUBSTR_K anchors."""
    token_docs = [_tokenize(t) for t in texts]
    occ: dict[str, list[tuple[int, int]]] = {}
    for doc_id, toks in enumerate(token_docs):
        for p in range(max(0, len(toks) - _SUBSTR_K + 1)):
            occ.setdefault(" ".join(toks[p : p + _SUBSTR_K]), []).append(
                (doc_id, p + 1)
            )
    covered: dict[int, set[int]] = {d: set() for d in range(len(texts))}
    for gram, places in occ.items():
        if len({d for d, _ in places}) < 2:
            continue  # within-doc-only repeat: the span grain's job
        first = min(places)
        for d, pos in places:
            if (d, pos) != first:
                covered[d].update(range(pos, pos + _SUBSTR_K))
    out = {}
    for doc_id, toks in enumerate(token_docs):
        kept = [
            tok
            for i, tok in enumerate(toks, start=1)
            if i not in covered[doc_id]
        ]
        out[doc_id] = (
            len(toks),
            len(covered[doc_id]),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


@settings(max_examples=10, deadline=None)
@given(_docs_strategy)
def test_substring_trim_matches_python_reference(spark, token_docs):
    texts = [" ".join(toks) for toks in token_docs]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tok, r.n_removed, r.kept_hash)
        for r in substring_dedup_trim(docs).collect()
    }
    assert got == _reference_trim(texts)
