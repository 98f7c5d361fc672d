"""Smoke tests for the driver contract module."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"region_name", "revenue", "line_count"} == set(df.columns)


def test_queries_and_oracles_aligned():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "query registry is empty"
    # every oracle key must exist in queries
    assert set(oracles) <= set(qs)
