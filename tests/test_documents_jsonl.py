"""Error-routing contract of the JSONL documents source (P8 on the
document side)."""

from __future__ import annotations

import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from smart_contract_database_builder_spark.sources.documents import (
    read_documents_jsonl,
)

_GOOD = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0", "n_chars": 10},
    {"doc_id": 2, "text": "gamma", "lang": "de", "source": "s1", "n_chars": 5},
]
_BAD_LINES = ['{"doc_id": 3, "text": "broken', "not json at all"]


def _write_fixture(tmp_path, gz=False):
    lines = [json.dumps(r) for r in _GOOD] + _BAD_LINES
    if gz:
        p = os.path.join(tmp_path, "docs.jsonl.gz")
        with gzip.open(p, "wt", encoding="utf-8") as f:
            f.write("\n".join(lines))
    else:
        p = os.path.join(tmp_path, "docs.jsonl")
        with open(p, "w", encoding="utf-8") as f:
            f.write("\n".join(lines))
    return p


def test_permissive_routes_corrupt_lines(spark, tmp_path):
    path = _write_fixture(str(tmp_path))
    df = read_documents_jsonl(spark, path)
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r._corrupt is None]
    bad = [r for r in rows if r._corrupt is not None]
    assert {r.doc_id for r in good} == {1, 2}
    assert len(bad) == 2
    # corrupt rows carry the raw line for quarantine, data columns null
    assert all(r.text is None and r.doc_id is None for r in bad)
    assert any("broken" in r._corrupt for r in bad)


def test_dropmalformed_drops_them(spark, tmp_path):
    path = _write_fixture(str(tmp_path))
    df = read_documents_jsonl(spark, path, mode="DROPMALFORMED").select(
        "doc_id", "text"
    )
    assert sorted(r.doc_id for r in df.collect()) == [1, 2]


def test_failfast_raises(spark, tmp_path):
    path = _write_fixture(str(tmp_path))
    with pytest.raises(Exception) as e:
        read_documents_jsonl(spark, path, mode="FAILFAST").collect()
    assert "Malformed" in str(e.value) or "FAILFAST" in str(e.value)


def test_gzipped_jsonl_reads_transparently(spark, tmp_path):
    path = _write_fixture(str(tmp_path), gz=True)
    df = read_documents_jsonl(spark, path)
    # NB: a query whose referenced columns are ONLY the corrupt-record
    # column is disallowed by Spark (SPARK-26745) — always project a
    # data column alongside it
    rows = df.select("doc_id", "_corrupt").collect()
    assert sum(1 for r in rows if r._corrupt is None) == 2


def test_parsed_corpus_feeds_the_operator_surface(spark, tmp_path):
    """A JSONL-ingested corpus must drop straight into the documents
    operators: run the span-trim transform over it."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        span_dedup_trim,
    )

    path = _write_fixture(str(tmp_path))
    docs = read_documents_jsonl(spark, path).filter(
        F.col("_corrupt").isNull()
    ).drop("_corrupt")
    out = {r.doc_id: r.n_tok for r in span_dedup_trim(docs).collect()}
    assert out == {1: 2, 2: 1}
