"""Oracle-parity harness: every registered query vs its DuckDB twin.

Mirrors the driver's correctness gate (row-count + column set +
order-insensitive values) at sf0.01 so regressions surface locally
before the per-round verify.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from smart_contract_database_builder_spark import plans

from conftest import SF_ORACLE

_SQL_QUERIES = sorted(name for name, s in plans.QUERIES.items() if s.oracle)
_ROWS_ONLY = sorted(name for name, s in plans.QUERIES.items() if not s.oracle)


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted, type-normalized frame for comparison."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64")
        elif s.dtype == object:
            pdf[c] = s.map(
                lambda v: repr(sorted(v)) if isinstance(v, (list, np.ndarray, set))
                else (v.isoformat() if isinstance(v, (dt.date, dt.datetime))
                      else (repr(v) if isinstance(v, (dict, tuple)) else v))
            )
    pdf = pdf.sort_values(by=list(pdf.columns), na_position="first")
    return pdf.reset_index(drop=True)


@pytest.mark.parametrize("name", _SQL_QUERIES)
def test_query_matches_oracle(spark, oracle, name):
    spec = plans.QUERIES[name]
    got = canonicalize(spec.fn(spark, SF_ORACLE).toPandas())
    want = canonicalize(oracle.execute(spec.oracle).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    # check_exact: the engine's parity rules (functions/numeric.py) are meant
    # to produce BITWISE-identical floats vs the oracle — the driver gate
    # compares value hashes, so approximate equality is not good enough.
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = plans.QUERIES[name]
    df = spec.fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_seeded_sample_is_deterministic(spark):
    """O4: the seeded Bernoulli sample must return the identical row set
    across invocations (fixed seed + deterministic input partitioning) —
    the property that makes rows-only sampling auditable."""
    from conftest import SF_ORACLE

    fn = plans.QUERIES["sample_orders_seeded"].fn
    a = sorted(r["o_orderkey"] for r in fn(spark, SF_ORACLE).collect())
    b = sorted(r["o_orderkey"] for r in fn(spark, SF_ORACLE).collect())
    assert a == b and len(a) > 0
