"""Write-time data layout: Z-order (Morton) clustering for data skipping.

At 100 TB the cheapest query is the one that never reads the file:
parquet carries per-row-group min/max statistics, and the reader skips
row groups whose range can't satisfy a pushed filter. Those statistics
are only selective if rows with similar values sit TOGETHER — a table
sorted by one column skips perfectly on that column and not at all on
any other. Z-ordering interleaves the bits of several columns into one
sort key, so a range predicate on ANY of the interleaved columns maps
to a bounded set of key ranges, and every co-clustered column keeps
usable min/max windows in every file (Delta's OPTIMIZE ZORDER BY, as a
plain expression over open parquet).

Everything here is a Catalyst expression — the key costs one map-side
projection and the one sort the write was already going to do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits kept per column in the interleaved key. 21 bits × 3 columns is
#: the int64 ceiling; 16 is plenty for file-level skipping (65k cells
#: per dimension).
_DEFAULT_BITS = 16


def _rank_quantize(df: DataFrame, cols: list[str], bits: int) -> DataFrame:
    """Map each column to its [0, 2^bits) RANK-space cell: percent_rank
    scaled up. Rank space (not value space) makes the interleave robust
    to skew — a heavy-hitter value occupies many cells instead of
    collapsing the whole column into one.

    Scale note: percent_rank is a per-column global sort at build time.
    That is the cost of any clustering rewrite (Delta's OPTIMIZE pays
    the same); it is a one-time write-amplification, not a query cost.
    """
    from pyspark.sql.window import Window

    out = df
    top = (1 << bits) - 1
    for c in cols:
        w = Window.orderBy(F.col(c))
        cell = F.least(
            F.lit(top),
            F.floor(F.percent_rank().over(w) * (1 << bits)).cast("long"),
        )
        out = out.withColumn(f"_z_{c}", cell)
    return out


def zorder_key(cells: list[Column | str], bits: int = _DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of the given integer cell
    columns into one Morton key (bit j of column i lands at position
    j * n_cols + i). Pure integer shift/or expression — no UDF."""
    cols = [F.col(c) if isinstance(c, str) else c for c in cells]
    n = len(cols)
    key = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, j * n + i).cast("long")
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = _DEFAULT_BITS,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    rank-quantize each column, interleave, range-repartition + sort by
    the key so every output file owns a contiguous Morton range — which
    is what gives EVERY clustered column tight per-file min/max stats.
    """
    keyed = _rank_quantize(df, cols, bits).withColumn(
        "_zkey", zorder_key([f"_z_{c}" for c in cols], bits)
    )
    writer = (
        keyed.repartitionByRange(F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *[f"_z_{c}" for c in cols])
        .write.mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


#: Compaction target: one output file per this many input bytes (the
#: 128 MiB parquet sweet spot — big enough to amortize footer/open
#: costs, small enough to split and to keep row-group stats selective).
_COMPACT_TARGET_BYTES = 128 * 1024 * 1024


def _dir_bytes(spark, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API — works
    for any scheme Spark can read (file://, hdfs://, s3a://), which is
    what a maintenance tool must support; a local os.walk would not."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_bytes: int = _COMPACT_TARGET_BYTES,
    order_by: list[str] | None = None,
) -> int:
    """Small-files compaction (Delta `OPTIMIZE` for open parquet):
    rewrite a directory of however-many fragments into
    ceil(total_bytes / target) files. Returns the file count written.

    The small-files problem is the classic slow killer of a streaming
    or incremental-ingest table at scale: a 100 TB table ingested in
    per-minute micro-batches accretes millions of KB-sized files, and
    every downstream scan pays listing + open + footer-decode per
    fragment while row-group statistics degenerate to one tiny group
    per file. Compaction is pure write-amplification paid once.

    With ``order_by`` the rewrite RANGE-partitions + sorts on those
    columns, so the output keeps (or establishes) contiguous per-file
    min/max windows — the data-skipping layout `write_zordered`
    documents; without it, a round-robin repartition just evens out
    file sizes.
    """
    import math

    n_files = max(1, math.ceil(_dir_bytes(spark, src) / target_file_bytes))
    df = spark.read.parquet(src)
    if order_by:
        shaped = df.repartitionByRange(n_files, *order_by).sortWithinPartitions(
            *order_by
        )
    else:
        shaped = df.repartition(n_files)
    shaped.write.mode("overwrite").parquet(dst)
    return n_files
