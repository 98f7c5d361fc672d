"""PQ ANN quality + determinism pins (the oracle proves Spark==DuckDB;
this asserts the operator is a USEFUL approximation, not just a
reproducible one).

Random synthetic embeddings are PQ's worst case (no cluster structure
for the codebook to exploit) and the label codebook has only ~10
entries per subspace, so the floor is deliberately loose — the point
is to catch a sign/slice bug (recall collapsing to ~0), not to
benchmark recall.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark.plans import QUERIES

from conftest import SF_ORACLE


def _exact_l2_top10() -> list[int]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/embeddings.parquet')"
    )
    return con.execute(r"""
WITH s AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))
                     * 1000000 AS BIGINT)) AS sv
  FROM embeddings
),
q AS (SELECT sv AS qv FROM s WHERE vec_id = 7)
SELECT s.vec_id FROM s, q WHERE s.vec_id != 7
ORDER BY list_aggregate(
  list_transform(list_zip(s.sv, q.qv), p -> (p[1]-p[2])*(p[1]-p[2])),
  'sum'), s.vec_id
LIMIT 10""").df()["vec_id"].tolist()


def test_pq_topk_recall_floor_and_determinism(spark):
    got = QUERIES["llm_pq_topk"].fn(spark, SF_ORACLE).collect()
    pq_ids = [r.vec_id for r in got]
    exact = _exact_l2_top10()
    overlap = len(set(pq_ids) & set(exact))
    assert overlap >= 2, (
        f"PQ recall collapsed: top-10 overlap with exact L2 is {overlap} "
        f"(pq={pq_ids}, exact={exact})"
    )
    # the true nearest neighbor must survive the quantization
    assert exact[0] in pq_ids
    # codes are deterministic integers: a rerun is bit-identical
    again = QUERIES["llm_pq_topk"].fn(spark, SF_ORACLE).collect()
    assert [(r.vec_id, r.approx_d2, r.pq_code) for r in got] == [
        (r.vec_id, r.approx_d2, r.pq_code) for r in again
    ]
    # every code has one sub-code per subspace
    assert all(len(r.pq_code.split("-")) == 8 for r in got)
