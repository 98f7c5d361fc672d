"""Property test: span_dedup_trim vs a pure-Python reference model.

The DuckDB oracle proves Spark == DuckDB on the fixed corpus; this
test proves both match the SEMANTICS on randomized corpora built to
collide — a 3-word vocabulary makes 8-token span repeats common, so
the remove-all-but-first rule actually exercises overlap unions,
whole-doc removal, and cross-doc canonical ordering.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from smart_contract_database_builder_spark.plans.llm_ops import (
    _SPAN_N,
    span_dedup_trim,
)

_docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=30),
    min_size=1,
    max_size=8,
)


def _tokenize(text: str) -> list[str]:
    # mirrors _tokens(): split(trim(lower(text)), '\s+') — note Spark's
    # split of "" yields [""], exactly like re.split on ""
    return re.split(r"\s+", text.strip().lower())


def _reference_trim(texts: list[str]) -> dict[int, tuple[int, int, str]]:
    """Pure-Python remove-all-but-first over _SPAN_N-token spans."""
    token_docs = [_tokenize(t) for t in texts]
    counts: Counter[str] = Counter()
    first: dict[str, tuple[int, int]] = {}
    for doc_id, toks in enumerate(token_docs):
        for p in range(max(0, len(toks) - _SPAN_N + 1)):
            gram = " ".join(toks[p : p + _SPAN_N])
            counts[gram] += 1
            first.setdefault(gram, (doc_id, p))
    out = {}
    for doc_id, toks in enumerate(token_docs):
        covered: set[int] = set()
        for p in range(max(0, len(toks) - _SPAN_N + 1)):
            gram = " ".join(toks[p : p + _SPAN_N])
            if counts[gram] >= 2 and first[gram] != (doc_id, p):
                covered.update(range(p, p + _SPAN_N))
        kept = [tok for i, tok in enumerate(toks) if i not in covered]
        out[doc_id] = (
            len(toks),
            len(covered),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


@settings(max_examples=10, deadline=None)
@given(_docs_strategy)
def test_span_trim_matches_python_reference(spark, token_docs):
    texts = [" ".join(toks) for toks in token_docs]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tok, r.n_removed, r.kept_hash)
        for r in span_dedup_trim(docs).collect()
    }
    assert got == _reference_trim(texts)


def test_span_trim_boundary_doc_ids(spark):
    """Canonical selection at the doc_id domain edges. The retired
    arithmetic composite key (doc_id * 1e6 + p) silently overflowed a
    64-bit long for doc_id >= ~9.2e12; the struct-min key must pick the
    lexicographically-first (doc_id, p) occurrence no matter how large
    the ids are. Three docs share one duplicated span; the SMALLEST
    doc_id (which is also near 2**63) must keep it."""
    dup = " ".join(["x"] * _SPAN_N)
    ids = [2**63 - 2, 2**63 - 1, 0]
    texts = [dup, dup, "a b c"]
    docs = spark.createDataFrame(
        list(zip(ids, texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tok, r.n_removed, r.kept_hash)
        for r in span_dedup_trim(docs).collect()
    }
    keep_hash = hashlib.md5(dup.encode()).hexdigest()
    empty_hash = hashlib.md5(b"").hexdigest()
    # first occurrence by (doc_id, p) order = doc 2**63-2 keeps its span
    assert got[2**63 - 2] == (_SPAN_N, 0, keep_hash)
    assert got[2**63 - 1] == (_SPAN_N, _SPAN_N, empty_hash)
    assert got[0][1] == 0  # unique text untouched
