"""Rank-error bound for the percentile_approx scale twin.

``agg_percentile_prices`` is the exact, oracle-checked anchor;
``agg_percentile_prices_approx`` is the mergeable-sketch form a 100 TB
job would run. ``percentile_approx(..., accuracy=10000)`` guarantees a
rank error of at most 1/accuracy: the returned value sits within
``n / 10000`` positions of the true order statistic. The test converts
that rank bound into a value bound per group (the value at the rank
window's edges) instead of guessing a relative-value epsilon, so it
holds even for heavy-tailed price distributions.
"""

from __future__ import annotations

import bisect

from smart_contract_database_builder_spark import plans
from smart_contract_database_builder_spark.sources.tables import load_table

from conftest import SF_ORACLE

_ACCURACY = 10000
_PCTS = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p99": 0.99}


def test_approx_percentiles_within_rank_error_of_exact(spark):
    approx = {
        r.o_orderpriority: r
        for r in plans.QUERIES["agg_percentile_prices_approx"]
        .fn(spark, SF_ORACLE)
        .collect()
    }
    values_by_group: dict[str, list[float]] = {}
    for row in (
        load_table(spark, SF_ORACLE, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    ):
        values_by_group.setdefault(row.o_orderpriority, []).append(row.o_totalprice)

    assert set(approx) == set(values_by_group)
    for group, vals in values_by_group.items():
        vals.sort()
        n = len(vals)
        assert approx[group].n == n
        max_rank_err = max(1, -(-n // _ACCURACY))  # ceil(n / accuracy)
        for col, p in _PCTS.items():
            got = getattr(approx[group], col)
            # admissible value window = values within ±max_rank_err ranks
            # of the target rank
            target = p * (n - 1)
            lo_rank = max(0, int(target) - max_rank_err)
            hi_rank = min(n - 1, int(target) + 1 + max_rank_err)
            assert vals[lo_rank] <= got <= vals[hi_rank], (
                f"{group}.{col}: approx {got} outside rank window "
                f"[{vals[lo_rank]}, {vals[hi_rank]}] (n={n})"
            )
            # and the returned value must be an actual data value (GK
            # sketches return observed points, not interpolations)
            idx = bisect.bisect_left(vals, got)
            assert idx < n and vals[idx] == got, (
                f"{group}.{col}: {got} is not an observed o_totalprice"
            )
