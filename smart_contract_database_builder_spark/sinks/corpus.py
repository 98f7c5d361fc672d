"""Training-corpus export layout (the terminal stage of F31/F33).

A curated corpus leaves the engine as TRAINING SHARDS: one file per
shard, rows inside each file already in the seeded training order, so
the data loader streams files sequentially with zero shuffling at read
time. The layout contract:

- ``shard=<k>/`` partition directories (partition pruning lets a loader
  or a resume pick up a single shard);
- exactly one parquet file per shard (``repartition`` on the shard
  column before ``partitionBy`` — without it every upstream task would
  write a sliver into every shard: the small-files explosion);
- rows within a file sorted by the in-shard position
  (``sortWithinPartitions(shard, pos)`` — parquet preserves row order
  within a file, so file order IS training order; sorting by the
  partition column FIRST matters: the dynamic-partition writer requires
  its input ordered by the partition column and injects its own
  non-global sort when it is not, and Spark's external sort is not
  guaranteed stable once it spills, which could silently break the
  pos ordering at scale).

At 100 TB this is the same code with shards sized to the writer
parallelism; each task owns whole shards, writes are append-free and
deterministic, and re-running the export over the same input yields
byte-identical shard contents (no RNG anywhere in the path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    ordered: DataFrame,
    path: str,
    shard_col: str = "shard",
    pos_col: str = "pos_in_shard",
) -> None:
    """Write a training-ordered relation (e.g. ``llm_training_order``
    joined back to its payload) as one sorted parquet file per shard."""
    (
        ordered.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, pos_col)
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(path)
    )


def write_partitioned_corpus(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("lang", "source"),
    files_per_partition: int = 1,
) -> None:
    """Hive-partitioned corpus export (``lang=en/source=s1/...``) — the
    layout that makes per-language/per-source reprocessing a PARTITION
    PRUNE instead of a corpus scan (a later ``analyze --sf-dir`` or a
    per-language recuration touches only its directories; the scan
    shows ``PartitionFilters``, not a filter over all rows).

    Same small-files discipline as the shard writer: repartition by the
    partition columns first so each task owns whole partitions —
    otherwise every upstream task writes a sliver into every partition
    directory (tasks × partitions files). ``files_per_partition``
    scales writer parallelism for hot partitions at 100 TB (salt the
    repartition), while the default keeps one file per partition.
    """
    keys = [F.col(c) for c in partition_cols]
    shaped = (
        df.repartition(*keys)
        if files_per_partition == 1
        else df.repartition(
            *keys,
            # pmod, not abs(hash) % n: abs(Int.MinValue) stays negative
            # in JVM semantics, which would widen the salt domain to
            # [-(n-1), n-1] and overshoot files_per_partition (r7 ADVICE)
            F.pmod(F.hash(*df.columns), F.lit(files_per_partition)).alias("_s"),
        )
    )
    (
        shaped.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
