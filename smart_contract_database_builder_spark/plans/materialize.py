"""Materialization and plan-shape helpers shared across plan modules.

Two mechanisms, chosen by the SIZE CLASS of the relation (optimization
guide §5, r17 VERDICT #1):

- ``pin(df)`` — RELIABLE checkpoint for CORPUS-PROPORTIONAL relations
  (token/shingle/gram streams, per-vector encodes, distinct-value
  domains that grow with the fact table). ``localCheckpoint`` stores
  blocks on executors only and truncates lineage, so at 100 TB a single
  lost executor kills the query and executor-local disk may simply not
  fit the relation. ``pin`` instead writes the relation ONCE to the
  checkpoint directory — on a cluster that is a reliable, replicated
  filesystem (HDFS / object store), locally the engine scratch dir —
  so executor loss re-reads instead of failing, and the bytes live
  where capacity is provisioned. The relation is persisted for the
  duration of the checkpoint write (so the subtree computes ONCE, not
  twice — ``RDD.doCheckpoint`` otherwise re-runs the lineage to write
  the files) and unpersisted immediately (no CacheManager entry
  outlives the call: nothing is memoized across invocations — each
  call recomputes from the parquet inputs).

- ``localCheckpoint`` (used directly at the call sites) — for BOUNDED
  relations (O(dims²) moments, O(days) dailies, O(K) centroids, packed
  1-row cell tables) and for ITERATIVE loop states, where lineage
  truncation is the point (plan growth) and a lost block is cheap to
  re-run from the query restart. Each call site carries its size-class
  rationale; the r18 disposition table in OPTIMIZATION_r18.md lists
  every site.

``pin`` never caches across runs: checkpoint files are written fresh
per invocation (RDD-instance keyed, not plan keyed) and reclaimed by
the ContextCleaner (``spark.cleaner.referenceTracking.cleanCheckpoints``
is set by the engine session) when the plan is released.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        try:
            from ..sources.store_root import scratch_dir

            root = scratch_dir()
        except Exception:  # unwritable store root: Spark's default tmp
            import tempfile

            root = tempfile.gettempdir()
        sc.setCheckpointDir(os.path.join(root, "checkpoints"))


def fan_out_if_narrow(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the cluster's parallelism — but ONLY
    when the upstream scan yields fewer partitions than cores.

    Why it exists: a CPU-heavy map-side kernel (the 8-way min-md5
    MinHash partial aggregate, the fixed-point ANN rescale, the
    bootstrap's per-row digest fan-out) runs in the SCAN stage, before
    any exchange — so its parallelism is the scan's split count, not
    the cluster's. A handful of small parquet files (or any
    unsplittable input: gzip, one mega row-group) pins millions of hash
    evaluations to a few tasks while the rest of the cluster idles.
    Fanning out the *pre-explode* rows costs one shuffle of the raw
    rows — the cheapest relation in the pipeline — and buys full-width
    execution of everything downstream of it.

    At 100 TB the scan arrives in thousands of splits and this helper
    is an explicit no-op (the condition, not the operator, is the
    contract: it never ADDS an exchange to a plan that is already
    wide). Round-robin keeps sizes uniform regardless of key
    distribution; results are partitioning-independent.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _reliable_wanted(df: DataFrame) -> bool:
    """Reliable checkpoint on a real cluster manager; executor-local
    blocks under ``local[*]``.

    The hazard ``pin`` exists for — a lost executor invalidating
    lineage-truncated executor-local blocks mid-query — does not exist
    in local mode: driver and executor share one process, so "executor
    loss" is job death either way, and the reliable write would buy
    only a serialize-to-disk round trip per call (~0.5-1 s per
    corpus-proportional relation at bench SF, measured). On yarn/k8s/
    standalone the write goes to the configured checkpoint dir
    (replicated FS) and executor loss re-reads instead of failing.
    ``spark.scdb.materialize.reliable`` overrides either way (tests
    pin both modes).
    """
    conf = df.sparkSession.conf.get("spark.scdb.materialize.reliable", None)
    if conf is not None:
        return conf.lower() == "true"
    return not df.sparkSession.sparkContext.master.startswith("local")


def pin(df: DataFrame) -> DataFrame:
    """Materialize a corpus-proportional, multi-consumer relation once,
    recoverably at cluster scale (see module docstring). Eager: the
    relation computes here, exactly once, and every consumer reads the
    materialized blocks/files.
    """
    if not _reliable_wanted(df):
        return df.localCheckpoint(eager=True)
    _ensure_checkpoint_dir(df)
    # Persist across the checkpoint write so the lineage runs once
    # (count job fills the cache, the checkpoint writer re-reads it),
    # then drop the cache entry immediately: no state survives the call.
    df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        out = df.checkpoint(eager=True)
    finally:
        df.unpersist()
    return out
