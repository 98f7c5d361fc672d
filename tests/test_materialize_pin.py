"""plans/materialize.pin: mode selection and result fidelity.

``pin`` materializes a multi-consumer relation once. Locally it must be
an executor-local checkpoint (driver and executor share the process, so
reliable files buy nothing but a serialize round trip); under the
``spark.scdb.materialize.reliable`` override (the cluster behavior,
where the master check flips it on automatically) it must write real
checkpoint files to the session checkpoint dir. Both modes must return
exactly the input relation's rows.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from smart_contract_database_builder_spark.plans.materialize import pin


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pin_local_mode_keeps_rows_and_skips_checkpoint_files(spark):
    spark.conf.unset("spark.scdb.materialize.reliable")
    df = spark.range(0, 1000).select(
        "id", (F.col("id") % 7).alias("k"), F.md5(F.col("id").cast("string")).alias("h")
    )
    before = _rows(df)
    out = pin(df)
    assert _rows(out) == before
    # local master ⇒ executor-local blocks; no reliable checkpoint dir
    # is forced into existence by the call
    assert spark.sparkContext.master.startswith("local")


def test_pin_reliable_override_writes_checkpoint_files(spark):
    spark.conf.set("spark.scdb.materialize.reliable", "true")
    try:
        df = spark.range(0, 500).select(
            "id", F.md5(F.col("id").cast("string")).alias("h")
        )
        before = _rows(df)
        out = pin(df)
        assert _rows(out) == before
        ckdir = spark.sparkContext.getCheckpointDir()
        assert ckdir is not None
        local = ckdir[len("file:"):] if ckdir.startswith("file:") else ckdir
        found = []
        for root, _dirs, files in os.walk(local):
            found.extend(files)
        assert found, f"no checkpoint files under {ckdir}"
    finally:
        spark.conf.unset("spark.scdb.materialize.reliable")


def test_pin_reliable_result_is_recomputed_per_call(spark):
    """Two pins of the same plan must be independent materializations
    (RDD-instance keyed, never plan keyed) — the no-cross-run-caching
    property the bench relies on."""
    spark.conf.set("spark.scdb.materialize.reliable", "true")
    try:
        df = spark.range(0, 100).select("id")
        a, b = pin(df), pin(spark.range(0, 100).select("id"))
        assert _rows(a) == _rows(b)
        assert a.rdd.id() != b.rdd.id()
    finally:
        spark.conf.unset("spark.scdb.materialize.reliable")
