"""Quantified recall of the MinHash-LSH candidate stage.

``llm_ngram_jaccard_topk`` (and every consumer of
``minhash_candidate_pairs``) is approximate-recall BY DESIGN: a true
near-dup pair is absent when its 4 bands never collide, or when every
colliding bucket exceeds ``_LSH_BUCKET_CAP``. This test pins the bound
numerically — the exact all-pairs word-3-gram Jaccard ground truth is
computed in DuckDB (feasible at test SF; the quadratic join is exactly
what the LSH design avoids at scale) and the candidate stage must
recover ≥90% of the pairs at J ≥ 0.5.

Theory cross-check: with 4 bands × 2 rows the collision probability at
J = 0.5 is 1-(1-0.5²)⁴ ≈ 0.68 per pair, rising to ≈0.99 at J = 0.8 —
the test corpus' near-dup pairs sit well above the band threshold
(measured recall 1.0 at sf0.01), so a 0.9 floor holds slack for corpus
regeneration without masking a real recall regression.
"""

from __future__ import annotations

from smart_contract_database_builder_spark import plans

from conftest import SF_ORACLE

_EXACT_SQL = r"""
WITH sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      THEN list_transform(range(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      ELSE [] END) AS s
    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
          FROM documents)
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS j
FROM inter
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE j >= 0.5
"""


def test_lsh_candidate_recall_vs_exact(spark, oracle):
    truth = {
        (int(r[0]), int(r[1])) for r in oracle.execute(_EXACT_SQL).fetchall()
    }
    assert len(truth) >= 10, "ground truth too small to quantify recall"
    cand = plans.QUERIES["llm_minhash_lsh_pairs"].fn(spark, SF_ORACLE).collect()
    cset = {(r.doc_a, r.doc_b) for r in cand}
    recall = len(truth & cset) / len(truth)
    assert recall >= 0.9, f"LSH candidate recall {recall:.2f} < 0.9 floor"
