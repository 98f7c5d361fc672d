"""Layout contract of the training-shard export sink."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from smart_contract_database_builder_spark import plans
from smart_contract_database_builder_spark.sinks.corpus import (
    write_training_shards,
)
from smart_contract_database_builder_spark.sources.tables import load_table

from conftest import SF_SMOKE


def test_training_shards_layout_and_order(spark, tmp_path):
    order = plans.QUERIES["llm_training_order"].fn(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    ordered = order.join(docs, "doc_id")
    out = str(tmp_path / "shards")
    write_training_shards(ordered, out)

    shard_dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(shard_dirs) == 8
    for d in shard_dirs:
        files = [f for f in glob.glob(os.path.join(d, "*.parquet"))]
        # exactly ONE file per shard — no small-files explosion
        assert len(files) == 1, d
        # file order IS training order
        import pyarrow.parquet as pq

        pos = pq.read_table(files[0], columns=["pos_in_shard"])[
            "pos_in_shard"
        ].to_pylist()
        assert pos == sorted(pos), d
        assert pos[0] == 1 and pos[-1] == len(pos), d

    # the export is lossless: same docs, same assignment
    back = spark.read.parquet(out)
    assert back.count() == ordered.count()
    a = {(r.doc_id, r.shard, r.pos_in_shard) for r in back.collect()}
    b = {(r.doc_id, r.shard, r.pos_in_shard) for r in ordered.collect()}
    assert a == b

    # determinism: a re-export produces byte-identical shard files
    out2 = str(tmp_path / "shards2")
    write_training_shards(ordered, out2)
    for d in shard_dirs:
        f1 = glob.glob(os.path.join(d, "*.parquet"))[0]
        f2 = glob.glob(
            os.path.join(out2, os.path.basename(d), "*.parquet")
        )[0]
        assert open(f1, "rb").read() == open(f2, "rb").read()


def test_shard_partition_pruning(spark, tmp_path):
    order = plans.QUERIES["llm_training_order"].fn(spark, SF_SMOKE)
    out = str(tmp_path / "shards")
    write_training_shards(order, out)
    one = spark.read.parquet(out).filter(F.col("shard") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan
    assert one.count() > 0
