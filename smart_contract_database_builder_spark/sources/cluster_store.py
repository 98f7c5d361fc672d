"""Write-time near-dup CLUSTER store — the third instance of the
write-time-derived-layout pattern (``pq_store.py`` for ANN,
``minhash_store.py`` for LSH bands).

The connected-components relation ``(doc, cluster_id)`` over the LSH
candidate graph is consumed by several independent queries — cluster
membership (``llm_neardup_clusters``), best-representative selection,
the leakage-aware train/val/test split — and each used to re-run the
iterative CC solve per query. The solve is cheap relative to the
signature pass (the edge relation is ~|duplicated docs|, far smaller
than the corpus) but it is an ITERATIVE driver-looped job, so at 100 TB
re-running it per analytics query wastes both cluster time and driver
round-trips. Persisting the label relation once per (corpus
fingerprint, candidate-generator codec, CC codec) makes every consumer
a single parquet scan.

Keying discipline: the store path embeds the SAME corpus fingerprint
as the band store plus both codec versions, so a regenerated corpus, a
changed signature pipeline, or a changed CC algorithm can never
silently serve stale clusters. Completeness is gated on a marker
written strictly after the label write (the ``pq_store.py``
discipline). Rooted under ``store_root()`` (per-user 0700, symlink-
rejecting) like every persisted store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Label-relation file count: the relation is two short columns and
#: ~|duplicated docs| rows, so a handful of evenly-sized files is
#: right anywhere the band store itself fits.
_CLUSTER_FILES = 8


def write_cluster_map(comp: DataFrame, path: str) -> None:
    """Persist the (doc, cluster_id) component relation, then the
    store-level DONE marker — strictly in that order, so a crash
    mid-write can never leave a store that passes the reuse gate.
    Built in a sibling tmp dir and published by one atomic rename
    (``store_root.build_tmp``/``publish_build``), so a concurrent
    builder of the same store can never interleave part-files."""
    from .store_root import build_tmp, publish_build

    tmp = build_tmp(path)
    comp.repartition(_CLUSTER_FILES).write.parquet(
        os.path.join(tmp, "components"), mode="overwrite"
    )
    with open(os.path.join(tmp, "_STORE_COMPLETE"), "w") as fh:
        fh.write("components\n")
    publish_build(tmp, path)


def read_cluster_map(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "components"))


def cluster_store_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_STORE_COMPLETE"))
