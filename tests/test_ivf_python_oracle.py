"""IVF top-k pinned against an independent driver-side Python replica.

Since round 6 the registry entry ALSO carries a DuckDB oracle (the cell
table is quantized to fixed-point integers, making every step exact),
so this replica is a third independent engine: centroids are
``floor(Σ scaled / n)`` int64 fixed-point, cell distances exact integer
squared-delta sums, tie-break on (d2, cell), in-cell cosine exact int64
dot → one double division.
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark.plans import llm_ops

from conftest import SF_ORACLE

_FP = 1_000_000


def _iscale(x: float) -> int:
    # double → DECIMAL(18,6) → ×1e6 → int64, matching llm_ops._iscale
    return int(Decimal(repr(float(x))).quantize(Decimal("0.000001")) * _FP)


def test_ivf_topk_matches_python_replica(spark):
    emb = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    emb["scaled"] = emb["embedding"].map(lambda v: [_iscale(x) for x in v])

    # per-label QUANTIZED centroids: floor(Σ scaled / n) int64 — the
    # same arithmetic as ivf_quantized_cells
    import math

    centroids: dict[int, list[int]] = {}
    for label, grp in emb.groupby("label"):
        mats = list(grp["scaled"])
        n = len(mats)
        centroids[label] = [
            math.floor(float(sum(row[d] for row in mats)) / n)
            for d in range(len(mats[0]))
        ]

    def cell_of(scaled) -> int:
        best = None
        for cell in sorted(centroids):  # ties break on cell, like orderBy
            c = centroids[cell]
            d2 = 0  # exact integer distance
            for x, cc in zip(scaled, c):
                d2 += (x - cc) * (x - cc)
            if best is None or d2 < best[0]:
                best = (d2, cell)
        return best[1]

    emb["cell"] = emb["scaled"].map(cell_of)
    qrow = emb[emb.vec_id == llm_ops._QUERY_VEC_ID].iloc[0]
    q_cell = qrow["cell"]
    qs = qrow["scaled"]
    nq = sum(v * v for v in qs)

    cand = emb[(emb.cell == q_cell) & (emb.vec_id != llm_ops._QUERY_VEC_ID)]
    scored = []
    for _, r in cand.iterrows():
        dot = sum(a * b for a, b in zip(r["scaled"], qs))
        na = sum(v * v for v in r["scaled"])
        cosine = float(dot) / ((na**0.5) * (nq**0.5))
        scored.append((int(r["vec_id"]), int(r["cell"]), cosine))
    scored.sort(key=lambda t: (-t[2], t[0]))
    want = scored[:10]

    got = [
        (r["vec_id"], r["cell"], r["cosine"])
        for r in llm_ops.llm_ivf_topk(spark, SF_ORACLE).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    assert [g[1] for g in got] == [w[1] for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], rel=0, abs=1e-12)
