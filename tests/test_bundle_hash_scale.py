"""Bundle-hash mega-group guard — the collect_list analogue of the LSH
bucket caps.

``ref_bundle_hash_by_source`` aggregates per-file digests per source; a
flat collect_list would make one aggregate row grow linearly with the
bucket (10M files → one 320 MB row). The two-level prefix re-hash bounds
every row at bucket_size/256. These tests pin the arithmetic against a
pure-Python replica on a synthetic mega-group and prove the level-1
split actually happens.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_contract_database_builder_spark.plans.reference_model import (
    bundle_hash_by_source,
)


def _py_bundle(texts: list[str]) -> tuple[str, int]:
    """Driver-side replica of the two-level digest (no whitespace in the
    synthetic texts, so contract_id == md5(text))."""
    hs = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    buckets: dict[str, list[str]] = {}
    for h in hs:
        buckets.setdefault(h[:2], []).append(h)
    bds = [
        hashlib.md5("".join(sorted(v)).encode()).hexdigest()
        for v in buckets.values()
    ]
    return hashlib.md5("".join(sorted(bds)).encode()).hexdigest(), len(hs)


def _mega_group(spark, n_docs: int):
    return spark.range(n_docs).select(
        F.lit("mega").alias("source"),
        F.concat(F.lit("doc-body-"), F.col("id")).alias("text"),
    )


def test_mega_group_matches_python_replica(spark):
    n = 4096
    rows = bundle_hash_by_source(_mega_group(spark, n)).collect()
    assert len(rows) == 1
    want_id, want_n = _py_bundle([f"doc-body-{i}" for i in range(n)])
    assert rows[0]["bundle_id"] == want_id
    assert rows[0]["n_files"] == want_n == n


def test_mega_group_is_split_across_prefix_buckets(spark):
    # The level-1 relation must hold many bounded rows, not one giant
    # one: with 4096 uniform md5 digests all 256 prefixes are hit with
    # overwhelming probability, so no aggregate row ever sees more than
    # a small fraction of the group.
    docs = _mega_group(spark, 4096)
    lvl1 = (
        docs.select("source", F.md5("text").alias("h"))
        .withColumn("pfx", F.substring("h", 1, 2))
        .groupBy("source", "pfx")
        .count()
    )
    counts = [r["count"] for r in lvl1.collect()]
    assert len(counts) > 200  # split really happened
    assert max(counts) < 4096 / 32  # every row far below the group size


def test_order_insensitive_under_repartitioning(spark):
    docs = _mega_group(spark, 512)
    a = bundle_hash_by_source(docs).collect()[0]
    b = bundle_hash_by_source(docs.repartition(13)).collect()[0]
    assert a["bundle_id"] == b["bundle_id"]
    assert a["n_files"] == b["n_files"]
