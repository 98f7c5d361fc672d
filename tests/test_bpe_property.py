"""Property test for the distributed BPE trainer: on ARBITRARY small
corpora over a tiny alphabet (maximizing self-pair and overlap cases),
the islands-scheme merge must reproduce the sequential greedy reference
exactly — every iteration's chosen pair, its weighted count, and the
resulting segmentations.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from test_round7_operators import _py_bpe


def _py_bpe_vocab(words: dict[str, int], n_merges: int):
    """Reference trainer that also returns the final segmentation."""
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
    return merges, vocab


# Tiny alphabet ⇒ dense pair collisions, frequent (x, x) self-pairs and
# long homogeneous runs — the regimes where a wrong islands scheme
# diverges from greedy left-to-right.
_WORD = st.text(alphabet="ab", min_size=1, max_size=8)
_CORPUS = st.lists(
    st.tuples(_WORD, st.integers(min_value=1, max_value=5)),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_distributed_bpe_equals_sequential_reference(spark, tmp_path_factory, corpus):
    import pandas as pd

    from smart_contract_database_builder_spark.plans.llm_ops import (
        _BPE_MERGES,
        _bpe_state,
    )

    # materialize the corpus as a documents table (each word repeated
    # per its weight inside one text field — the trainer counts word
    # occurrences from the corpus, so weights become real repetitions)
    words: dict[str, int] = {}
    for w, c in corpus:
        words[w] = words.get(w, 0) + c
    text = " ".join(w for w, c in words.items() for _ in range(c))
    pdf = pd.DataFrame(
        {
            "doc_id": [0],
            "text": [text],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [len(text)],
        }
    )
    sf = str(tmp_path_factory.mktemp("bpe_prop"))
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )

    merge_rows, v = _bpe_state(spark, sf)
    got_merges = []
    for m in merge_rows:
        r = m.collect()
        if r:
            got_merges.append(
                (
                    r[0]["iteration"],
                    r[0]["left_sym"],
                    r[0]["right_sym"],
                    r[0]["merged"],
                    r[0]["pair_count"],
                )
            )
    expect_merges, expect_vocab = _py_bpe_vocab(words, _BPE_MERGES)
    # single-symbol-only corpora may run out of pairs: the reference
    # stops early; the distributed trainer's later iterations emit an
    # empty argmax row — compare the non-empty prefix
    assert got_merges[: len(expect_merges)] == expect_merges
    got_vocab = {r["word"]: list(r["syms"]) for r in v.collect()}
    assert got_vocab == {
        w: syms for w, syms in expect_vocab.items()
    }
