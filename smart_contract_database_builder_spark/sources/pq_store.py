"""Write-time IVF-PQ encoding — the production layout for the ANN
family (r8 VERDICT item #5).

``llm_ivfpq_topk`` computes cell assignment and PQ codes at QUERY time,
which the 100× probe showed is the dominant cost (a corpus-linear
encode pass per query: 20× time at 100× data). In the production
layout — FAISS's on-disk shape, re-expressed as a parquet layout Spark
partition-prunes natively — the encode pass runs ONCE at ingest:

- ``codes/`` — one row per vector: ``(vec_id, c0..c{M-1})``, written
  ``partitionBy("cell")`` so the coarse cell IS the physical partition
  key. A query probing ``nprobe`` cells scans ``nprobe/k`` of the
  corpus (``PartitionFilters`` in the scan, directories never opened),
  and each scanned row is ~``M`` small ints, not a 64-float vector.
- ``cells/`` — the K-row coarse-quantizer table ``(cell, centroid)``,
  read back at query time for the ADC lookup tables (broadcast-sized).

Everything is the same exact int64 fixed-point arithmetic as the
query-time form (``ivf_quantized_cells`` / ``_pq_code_m``), so a
read-path query over this store returns BIT-IDENTICAL results to
``llm_ivfpq_topk`` — which is why the registered read-path query can
reuse that query's DuckDB oracle unchanged.

Imports of the PQ kernels are deferred to call time: ``plans.llm_ops``
imports ``sources.tables`` at module import, so a module-level import
here would cycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_pq_encoded(emb: DataFrame, path: str) -> None:
    """Encode ``(vec_id, embedding, label)`` rows into the partitioned
    IVF-PQ store at ``path``: compute the coarse-cell assignment and
    the ``_PQ_M`` sub-codes once, write codes parquet partitioned by
    cell plus the K-row cell table.

    Scale shape: the cell table is one packed broadcast row; assignment
    and encoding are pure map stages over one corpus scan; the only
    shuffle is the pre-write ``repartition("cell")`` that aligns tasks
    with output partitions (the same small-files discipline as
    ``write_bucketed``)."""
    from ..plans.llm_ops import (
        _PQ_M,
        _cell_dist2,
        _iscale,
        _pq_code_m,
        ivf_quantized_cells,
    )

    cells = ivf_quantized_cells(emb)
    packed = cells.agg(
        F.collect_list(F.struct("cell", "centroid")).alias("cells")
    )
    sv = emb.select(
        "vec_id", F.transform("embedding", lambda x: _iscale(x)).alias("sv")
    )
    assigned = sv.crossJoin(F.broadcast(packed)).select(
        "vec_id",
        "sv",
        "cells",
        F.array_min(
            F.transform(
                "cells",
                lambda c: F.struct(
                    _cell_dist2(F.col("sv"), c["centroid"]).alias("d2"),
                    c["cell"].alias("cell"),
                ),
            )
        )["cell"].alias("cell"),
    )
    codes = assigned.select(
        "vec_id",
        "cell",
        *[_pq_code_m(F.col("sv"), m).alias(f"c{m}") for m in range(_PQ_M)],
    )
    # cells/ BEFORE codes/, and a store-level DONE marker after both:
    # the reuse gate keys on the marker, so a build interrupted between
    # any two writes leaves a store that fails the gate and is rebuilt
    # instead of persisting forever with a missing table. Built in a
    # sibling tmp dir and published by one atomic rename (round 11),
    # so a concurrent builder of the same store can never interleave
    # part-files at the shared final path.
    import os

    from .store_root import build_tmp, publish_build

    tmp = build_tmp(path)
    cells.write.mode("overwrite").parquet(f"{tmp}/cells")
    (
        codes.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{tmp}/codes")
    )
    with open(os.path.join(tmp, "_STORE_COMPLETE"), "w") as fh:
        fh.write("cells+codes\n")
    publish_build(tmp, path)


def pq_store_complete(path: str) -> bool:
    """True iff a prior ``write_pq_encoded`` ran to completion — the
    store-level DONE marker is written strictly after BOTH tables, so
    a crash mid-build can never leave a store that passes this gate
    with a missing or partial table."""
    import os

    return os.path.exists(os.path.join(path, "_STORE_COMPLETE"))


def read_pq_codes(spark: SparkSession, path: str) -> DataFrame:
    """The partitioned codes table; filters on ``cell`` become
    ``PartitionFilters`` (directory pruning, no file I/O for unprobed
    cells)."""
    return spark.read.parquet(f"{path}/codes")


def read_pq_cells(spark: SparkSession, path: str) -> DataFrame:
    """The K-row coarse-quantizer table ``(cell, centroid)``."""
    return spark.read.parquet(f"{path}/cells")
