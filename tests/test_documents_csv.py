"""Error-routing + quoting contract of the CSV documents source (the
CSV twin of the JSONL source's P8 semantics)."""

from __future__ import annotations

import os

import pytest

from smart_contract_database_builder_spark.sources.documents import (
    read_documents_csv,
)

_HEADER = "doc_id,text,lang,source,n_chars"
_GOOD_ROWS = [
    '1,"alpha beta",en,s0,10',
    '2,"gamma ""quoted"" text",de,s1,5',
    '3,"multi\nline body",fr,s2,15',
]
#: n_chars is not an int → schema violation routes the line.
_BAD_ROW = '4,"oops",en,s0,notanumber'


def _write_fixture(tmp_path) -> str:
    p = os.path.join(str(tmp_path), "docs.csv")
    with open(p, "w", encoding="utf-8") as f:
        f.write("\n".join([_HEADER, *_GOOD_ROWS, _BAD_ROW]))
    return p


def test_permissive_routes_malformed_rows(spark, tmp_path):
    df = read_documents_csv(spark, _write_fixture(tmp_path))
    rows = df.collect()
    good = [r for r in rows if r._corrupt is None]
    bad = [r for r in rows if r._corrupt is not None]
    assert {r.doc_id for r in good} == {1, 2, 3}
    assert len(bad) == 1
    assert "notanumber" in bad[0]._corrupt


def test_quoting_contract(spark, tmp_path):
    df = read_documents_csv(spark, _write_fixture(tmp_path))
    by_id = {r.doc_id: r for r in df.collect() if r.doc_id is not None}
    assert by_id[2].text == 'gamma "quoted" text'  # doubled-quote escape
    assert by_id[3].text == "multi\nline body"  # quoted multiline


def test_dropmalformed_drops_them(spark, tmp_path):
    """NB: Spark's CSV parser validates only the REFERENCED columns
    (column pruning) — a projection that skips the malformed column
    would keep the row. Select every data column so the bad n_chars is
    actually parsed; this is the documented producer-facing contract."""
    df = read_documents_csv(
        spark, _write_fixture(tmp_path), mode="DROPMALFORMED"
    ).select("doc_id", "text", "lang", "source", "n_chars")
    assert sorted(r.doc_id for r in df.collect()) == [1, 2, 3]


def test_failfast_raises(spark, tmp_path):
    with pytest.raises(Exception) as e:
        read_documents_csv(
            spark, _write_fixture(tmp_path), mode="FAILFAST"
        ).collect()
    assert "Malformed" in str(e.value) or "FAILFAST" in str(e.value)


def test_unknown_mode_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        read_documents_csv(spark, _write_fixture(tmp_path), mode="YOLO")
