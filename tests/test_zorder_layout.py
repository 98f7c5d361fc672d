"""Z-order layout: key correctness vs a pure-Python Morton model, and
the actual data-skipping claim measured from parquet footer statistics
(rows-only — a write-time layout tool has no relational oracle)."""

from __future__ import annotations

import glob
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_contract_database_builder_spark.functions.layout import (
    write_zordered,
    zorder_key,
)
from smart_contract_database_builder_spark.sources.tables import load_table

from conftest import SF_ORACLE


def _py_morton(vals: list[int], bits: int) -> int:
    key = 0
    for j in range(bits):
        for i, v in enumerate(vals):
            key |= ((v >> j) & 1) << (j * len(vals) + i)
    return key


def test_zorder_key_matches_python_model(spark):
    rows = [(5, 9), (0, 0), (65535, 65535), (12345, 54321), (1, 2)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", zorder_key(["a", "b"], 16).alias("k")
    ).collect()
    for r in got:
        assert r.k == _py_morton([r.a, r.b], 16), (r.a, r.b)


def _file_ranges(path: str, col: str) -> list[tuple]:
    """Per-file (min, max) of col from parquet footers — what a reader
    prunes on."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                    hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def _files_hit(ranges: list[tuple], lo, hi) -> int:
    return sum(1 for a, b in ranges if not (b < lo or a > hi))


def test_zorder_layout_skips_on_every_clustered_column(spark, tmp_path):
    """A single-column sort skips perfectly on that column and not at
    all on any other; the Z-order layout must let a range predicate on
    EITHER clustered column prune a majority of files."""
    orders = load_table(spark, SF_ORACLE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n = orders.count()
    per_file = max(25, n // 64)  # ~64 files either way

    flat = str(tmp_path / "sorted_by_orderkey")
    (
        orders.repartitionByRange(F.col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", str(per_file))
        .parquet(flat)
    )
    zo = str(tmp_path / "zordered")
    write_zordered(
        orders, zo, ["o_custkey", "o_totalprice"],
        max_records_per_file=per_file,
    )
    # same rows, different layout
    assert spark.read.parquet(zo).count() == n

    stats = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.expr("percentile(o_totalprice, 0.48)"),
        F.expr("percentile(o_totalprice, 0.52)"),
    ).collect()[0]
    ck_lo, ck_hi = stats[0], stats[0] + (stats[1] - stats[0]) // 25
    tp_lo, tp_hi = stats[2], stats[3]

    for col, lo, hi in (
        ("o_custkey", ck_lo, ck_hi),
        ("o_totalprice", tp_lo, tp_hi),
    ):
        flat_ranges = _file_ranges(flat, col)
        zo_ranges = _file_ranges(zo, col)
        assert len(flat_ranges) >= 4 and len(zo_ranges) >= 4
        flat_hit = _files_hit(flat_ranges, lo, hi) / len(flat_ranges)
        zo_hit = _files_hit(zo_ranges, lo, hi) / len(zo_ranges)
        # the orderkey-sorted layout cannot skip on either clustered
        # column (~every file intersects); z-order must prune most
        assert flat_hit > 0.9, (col, flat_hit)
        assert zo_hit <= 0.5, (
            f"z-order layout failed to skip on {col}: "
            f"{zo_hit:.0%} of files hit (flat layout: {flat_hit:.0%})"
        )


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """A fragment-heavy directory compacts to the byte-target file
    count with identical rows; an order_by compaction leaves
    non-overlapping per-file min/max windows (the data-skipping
    property the rewrite exists to restore)."""
    from smart_contract_database_builder_spark.functions.layout import (
        compact_parquet,
    )

    src = str(tmp_path / "frags")
    orders = load_table(spark, SF_ORACLE, "orders")
    orders.repartition(64).write.parquet(src)  # 64 tiny fragments
    n_src = len(glob.glob(f"{src}/part-*.parquet"))
    assert n_src >= 64

    dst = str(tmp_path / "compact")
    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    files = glob.glob(f"{dst}/part-*.parquet")
    assert len(files) == n == 1  # well under one 1 GiB target

    got = spark.read.parquet(dst)
    assert got.count() == orders.count()
    assert set(got.columns) == set(orders.columns)

    dst2 = str(tmp_path / "compact_sorted")
    # force a multi-file sorted layout via a tiny byte target
    n2 = compact_parquet(
        spark, src, dst2, target_file_bytes=64 * 1024,
        order_by=["o_orderkey"],
    )
    assert n2 > 1
    ranges = []
    for f in sorted(glob.glob(f"{dst2}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            "o_orderkey"
        )
        lo = min(md.row_group(g).column(idx).statistics.min
                 for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max
                 for g in range(md.num_row_groups))
        ranges.append((lo, hi))
    ranges.sort()
    for (_, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, "sorted compaction produced overlapping files"
    total = sum(
        spark.read.parquet(f).count() for f in glob.glob(f"{dst2}/part-*.parquet")
    )
    assert total == orders.count()


def test_partitioned_corpus_layout_and_pruning(spark, tmp_path):
    """write_partitioned_corpus: hive directory layout per (lang,
    source), one file per partition, row parity, and — the point — a
    lang/source predicate on read-back becomes a PartitionFilter (no
    data rows outside the pruned directories are touched)."""
    import glob
    import os

    from smart_contract_database_builder_spark.sinks.corpus import (
        write_partitioned_corpus,
    )
    from smart_contract_database_builder_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, SF_ORACLE, "documents")
    out = str(tmp_path / "part_corpus")
    write_partitioned_corpus(docs, out)

    dirs = glob.glob(os.path.join(out, "lang=*", "source=*"))
    assert dirs, "no hive partition directories written"
    for d in dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    sel = back.filter((back.lang == "en") & (back.source == "s1"))
    plan = sel._sc._jvm.PythonSQLUtils.explainString(
        sel._jdf.queryExecution(), "simple"
    )
    assert "PartitionFilters" in plan and "lang" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "lang/source predicate did not prune partitions"
    want = docs.filter(
        (docs.lang == "en") & (docs.source == "s1")
    ).count()
    assert sel.count() == want
