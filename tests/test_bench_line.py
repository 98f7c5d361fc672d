"""The driver parses bench.py's final stdout line out of a ~2000-char
tail window (BENCH_r02..r05 parsed; r06..r12, with >90 queries and an
8KB line, all arrived "parsed": null). These tests pin the structural
fix: the emitted line stays under the budget no matter how many
queries ran, the slowest queries survive inline, and the full map is
preserved in the side artifact."""

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _timings(n: int, seed: int = 7) -> dict:
    rng = random.Random(seed)
    return {
        f"llm_some_operator_name_number_{i:03d}": rng.uniform(0.05, 3.5)
        for i in range(n)
    }


def test_line_fits_budget_at_any_query_count():
    for n in (5, 55, 120, 230, 500):
        line, full = bench.format_result(
            _timings(n), {}, sf=0.1, reps=3, tier="headline", clean=False
        )
        assert len(line) <= 1800, (n, len(line))
        d = json.loads(line)
        assert d["n_queries"] == n
        assert len(full["queries"]) == n
        assert d["queries_omitted"] == n - len(d["queries"])


def test_slowest_queries_survive_inline():
    t = _timings(230)
    line, _ = bench.format_result(t, {}, sf=0.1, reps=3, tier="headline", clean=False)
    d = json.loads(line)
    inline = set(d["queries"])
    # every inline query must be >= every omitted query (slowest-first pick)
    omitted_max = max(v for k, v in t.items() if k not in inline)
    inline_min = min(v for k, v in t.items() if k in inline)
    assert inline_min >= omitted_max - 1e-9


def test_totals_and_errors_survive_truncation():
    t = _timings(230)
    errs = {f"q{i}": "RuntimeError: " + "x" * 500 for i in range(12)}
    line, full = bench.format_result(t, errs, sf=0.1, reps=3, tier="headline", clean=True)
    assert len(line) <= 1800
    d = json.loads(line)
    assert d["total_sec"] == round(sum(t.values()), 3)
    assert d["n_errors"] == 12
    assert len(d["errors"]) <= 5  # truncated inline ...
    assert all(len(v) <= 80 for v in d["errors"].values())
    assert full["errors"] == errs  # ... but complete in the artifact


def test_small_run_keeps_every_query_inline():
    t = _timings(10)
    line, _ = bench.format_result(t, {}, sf=0.01, reps=1, tier="headline", clean=False)
    d = json.loads(line)
    assert len(d["queries"]) == 10
    assert d["queries_omitted"] == 0
