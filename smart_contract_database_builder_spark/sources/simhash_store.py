"""Write-time SimHash fingerprint store — the third member of the
write-once family (``pq_store.py`` for ANN codes, ``minhash_store.py``
for LSH bands, this for SimHash fingerprints).

``llm_simhash_hamming_pairs`` derives its block keys from per-document
64-bit SimHash fingerprints; computing those is a corpus-wide pass
(tokenize → distinct → one md5 per token → 64 vote folds) that at
100 TB dominates the query and repeats on the same unchanged corpus
every time the Hamming lens runs. In the production layout the
fingerprint pass runs ONCE at ingest: one ``(doc_id, simhash)`` row
per document — two short columns, never the text — and the read path's
block explode + bucket assembly works on that tiny relation.

The stored fingerprints are BIT-IDENTICAL to the query-time pipeline's
(the writer runs ``llm_simhash_documents``'s own expressions), so a
read-path query returns exactly the query-time answer and reuses its
DuckDB oracle unchanged — write-time fingerprinting is a physical-
layout change, not a semantic one.

Same crash-safety discipline as the siblings: the build lands in a
tmp sibling dir, ``_STORE_COMPLETE`` is written after the parquet
write, and the whole directory publishes with one atomic rename.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Files per store — fingerprints are two short columns per document,
#: so a handful of evenly-sized files suffices at any corpus size
#: where the dedup family itself is runnable.
_FP_FILES = 8


def write_simhash_fps(fps: DataFrame, path: str) -> None:
    """Persist the (doc_id, simhash) fingerprint relation."""
    fps.repartition(_FP_FILES).write.parquet(path, mode="overwrite")


def read_simhash_fps(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def mark_simhash_store_complete(base: str) -> None:
    """DONE marker — called strictly AFTER the fingerprint write."""
    with open(os.path.join(base, "_STORE_COMPLETE"), "w") as fh:
        fh.write("fps\n")


def simhash_store_complete(base: str) -> bool:
    """True iff a prior build ran to completion (the parquet
    ``_SUCCESS`` alone never passes the reuse gate)."""
    return os.path.exists(os.path.join(base, "_STORE_COMPLETE"))
