"""Write-time hyperplane-bucket store (S23) — the fourth member of the
write-once family (``pq_store.py`` for IVF-PQ codes, ``minhash_store``
for LSH bands, ``simhash_store`` for Hamming fingerprints; this for
the embedding-cosine admission/pair geometry).

``llm_incremental_embedding_admission`` derives the CORPUS side's
hyperplane bucket bits, fixed-point vectors and norms per run — a
corpus-wide pass (64 decimal casts + 8 plane dots per vector) that at
10⁹ vectors dominates every admission batch and repeats on the same
unchanged corpus. In the production layout that encode pass runs ONCE
at ingest:

- one ``(vec_id, bucket, sv, nrm)`` row per vector — the quantized
  vector ships with its bucket because the exact-cosine VERIFY needs
  full fixed-point precision (unlike the PQ path, where 8-byte codes
  suffice for ranked retrieval, an admission SLA verifies exactly);
- the relation persists as a catalog table ``bucketBy(bucket)`` — the
  probe join's shuffle is pre-paid at write time, so an admission
  batch co-locates against the corpus side exchange-free on the
  bucket key.

Stored rows are BIT-IDENTICAL to the query-time pipeline's (the
writer runs the same ``_iscale``/plane-dot expressions), so a
store-read admission returns exactly the query-time answer and reuses
its DuckDB oracle unchanged. Same crash-safety discipline as the
siblings: tmp-sibling build, ``_STORE_COMPLETE`` after the write, one
atomic publish rename; files survive the session, the catalog entry
does not — a fresh session re-ATTACHES with the same bucket-spec DDL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Fixed at write time — it IS the physical layout (the bucketing.py
#: sizing rule: buckets ~ table_bytes / 128 MiB at target scale).
_ANN_BUCKETS = 8


def write_emb_buckets(rows: DataFrame, table: str, path: str) -> None:
    """Persist the (vec_id, bucket, sv, nrm) relation as a bucketed
    catalog table (pre-write repartition aligns tasks with buckets —
    the small-files discipline of ``write_bucketed``)."""
    from pyspark.sql import functions as F

    (
        rows.repartition(_ANN_BUCKETS, F.col("bucket"))
        .write.format("parquet")
        .bucketBy(_ANN_BUCKETS, "bucket")
        .sortBy("bucket")
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def attach_emb_buckets(spark: SparkSession, table: str, path: str) -> None:
    """Re-attach an existing bucket store to the session catalog with
    the writer's bucket spec (the catalog metadata is what lets the
    planner drop the probe join's corpus-side exchange). Schema is
    read from the files so a writer-side change can never register a
    mismatched table."""
    schema = spark.read.parquet(path).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
    spark.sql(
        f"CREATE TABLE `{table}` ({cols}) USING parquet "
        f"CLUSTERED BY (`bucket`) SORTED BY (`bucket`) "
        f"INTO {_ANN_BUCKETS} BUCKETS LOCATION '{path}'"
    )


def mark_emb_bucket_store_complete(base: str) -> None:
    """DONE marker — strictly AFTER the table write (pq_store
    discipline: a crash mid-write never leaves a store that passes
    the reuse gate)."""
    with open(os.path.join(base, "_STORE_COMPLETE"), "w") as fh:
        fh.write("buckets\n")


def emb_bucket_store_complete(base: str) -> bool:
    return os.path.exists(os.path.join(base, "_STORE_COMPLETE"))
