"""Property tests: the micro-nat quantized text scorers vs pure-Python
reference models on randomized corpora — the fixed-testdata oracle
can't see corpus shapes it doesn't contain (single-token docs, all-
duplicate docs, unicode terms, heavy skew)."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _q(x: float) -> int:
    return math.floor(math.log(x) * 1_000_000)


def _py_entropy(tokens: list[str]) -> float:
    from collections import Counter

    n = len(tokens)
    c = Counter(tokens)
    s = sum(v * _q(v) for v in c.values())
    return (_q(n) * n - s) / (n * 1_000_000.0)


def _py_surprisal(docs: dict[int, list[str]]) -> dict[int, float]:
    from collections import Counter

    ctf: Counter = Counter()
    for toks in docs.values():
        ctf.update(toks)
    n_corpus = sum(ctf.values())
    v = len(ctf)
    lp = {
        t: math.floor(-math.log((c + 1) / (n_corpus + v)) * 1_000_000)
        for t, c in ctf.items()
    }
    out = {}
    for d, toks in docs.items():
        s = sum(lp[t] for t in toks)
        out[d] = s / (len(toks) * 1_000_000.0)
    return out


_corpus = st.dictionaries(
    keys=st.integers(min_value=0, max_value=50),
    values=st.lists(
        st.sampled_from(["a", "bb", "ccc", "δδ", "x1", "zz9"]),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus)
def test_entropy_and_surprisal_match_python_models(spark, corpus):
    import pandas as pd

    from smart_contract_database_builder_spark.plans.llm_ops import (
        llm_token_entropy,
        llm_unigram_surprisal,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": list(corpus.keys()),
            "text": [" ".join(toks) for toks in corpus.values()],
            "lang": "en",
            "source": "prop",
            "n_chars": [len(" ".join(t)) for t in corpus.values()],
        }
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            f"{d}/documents.parquet"
        )
        ent = {
            r["doc_id"]: r["entropy_nats"]
            for r in llm_token_entropy(spark, d).collect()
        }
        sup = {
            r["doc_id"]: r["avg_surprisal_nats"]
            for r in llm_unigram_surprisal(spark, d).collect()
        }
    want_sup = _py_surprisal(corpus)
    assert set(ent) == set(corpus)
    for doc_id, toks in corpus.items():
        assert ent[doc_id] == _py_entropy(toks), (doc_id, toks)
        assert sup[doc_id] == want_sup[doc_id], (doc_id, toks)
