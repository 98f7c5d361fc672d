"""Scale-layout evidence: strict-mode parse failure (P8 FAILFAST ≙ the
reference's panic path), partition pruning on a type-partitioned
contract store, and predicate pushdown on point lookups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_contract_database_builder_spark import fixtures
from smart_contract_database_builder_spark.sinks.duckdb_sink import (
    contracts_storage_shape,
)
from smart_contract_database_builder_spark.sources import contracts as C


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_failfast_mode_raises_on_corrupt_row(spark):
    """P8 strict mode: without --ignore-errors the reference panics on a
    parse failure (main.rs:106-111); FAILFAST from_json is the Spark
    equivalent."""
    df = spark.createDataFrame(
        [(1, '{"a": 1}'), (2, "not json")], "id int, content string"
    )
    strict = df.select(
        F.from_json("content", "struct<a:int>", {"mode": "FAILFAST"}).alias("p")
    )
    with pytest.raises(Exception, match="FAILFAST|Malformed|malformed"):
        strict.collect()


def test_partitioned_contract_store_prunes(spark, tmp_path):
    """Writing the contract store partitioned by source_type turns type
    predicates into partition pruning — the scan plan must show the
    partition filter and a pruned partition count, not a full scan."""
    parsed = C.parse_folder_contracts(fixtures.contract_files_df(spark))
    out = str(tmp_path / "contracts")
    contracts_storage_shape(parsed).write.partitionBy("source_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("source_type") == "single_sol")
    plan = _explain(back)
    assert "PartitionFilters" in plan
    assert back.count() == 2
    # only the single_sol partition directory is read
    scan_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "source_type" in scan_line


def test_point_lookup_predicate_reaches_scan(spark, tmp_path):
    """P2: the id-equality point lookup must push into the parquet scan
    (PushedFilters), mirroring the reference's PK index lookup
    (db.rs:109-120)."""
    parsed = C.parse_folder_contracts(fixtures.contract_files_df(spark))
    out = str(tmp_path / "flat")
    contracts_storage_shape(parsed).write.parquet(out)
    some_id = contracts_storage_shape(parsed).take(1)[0]["id"]
    q = spark.read.parquet(out).filter(F.col("id") == some_id).limit(1)
    plan = _explain(q)
    assert "PushedFilters" in plan
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "id" in pushed and "IsNotNull" in pushed or "EqualTo" in pushed
    assert q.count() == 1


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Bucketing both join sides on the key makes the sort-merge join
    shuffle-free — the co-location technique for repeated big-big joins
    at scale. The joined plan must contain NO Exchange above the scans."""
    from smart_contract_database_builder_spark.sources.tables import load_table
    from conftest import SF_ORACLE

    orders = load_table(spark, SF_ORACLE, "orders").limit(2000)
    lineitem = load_table(spark, SF_ORACLE, "lineitem").limit(5000)
    # force the sort-merge path: at test size the tables would
    # auto-broadcast, hiding the bucketing effect under scrutiny
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        (orders.write.mode("overwrite")
         .option("path", str(tmp_path / "b_orders"))
         .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .saveAsTable("b_orders"))
        (lineitem.write.mode("overwrite")
         .option("path", str(tmp_path / "b_lineitem"))
         .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .saveAsTable("b_lineitem"))
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).select(
            "l_orderkey", "o_totalprice"
        )
        plan = _explain(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_aggregation_matches_plain(spark):
    """Salted two-phase aggregation returns exactly the plain groupBy
    result — the skew-mitigation rewrite must be value-neutral."""
    from pyspark.sql import functions as SF

    from smart_contract_database_builder_spark.functions.skew import salted_agg
    from smart_contract_database_builder_spark.sources.tables import load_table
    from conftest import SF_ORACLE

    orders = load_table(spark, SF_ORACLE, "orders")
    plain = {
        r["o_orderstatus"]: (r["n"], r["total"])
        for r in orders.groupBy("o_orderstatus")
        .agg(SF.count(SF.lit(1)).alias("n"),
             SF.sum(SF.col("o_totalprice").cast("decimal(18,2)")).alias("total"))
        .collect()
    }
    salted = {
        r["_key"]: (r["n"], r["total"])
        for r in salted_agg(
            orders,
            "o_orderstatus",
            {
                "n": ("count", SF.count(SF.lit(1))),
                "total": (
                    "sum",
                    SF.sum(SF.col("o_totalprice").cast("decimal(18,2)")),
                ),
            },
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_rejects_unmergeable_kinds(spark):
    """A non-decomposable aggregate (or a bare Column with no declared
    merge kind) must raise, not silently re-sum — the failure mode the
    explicit (kind, expr) signature exists to close."""
    from pyspark.sql import functions as SF

    import pytest as _pytest

    from smart_contract_database_builder_spark.functions.skew import salted_agg
    from smart_contract_database_builder_spark.sources.tables import load_table
    from conftest import SF_ORACLE

    orders = load_table(spark, SF_ORACLE, "orders")
    with _pytest.raises(ValueError, match="avg_price"):
        salted_agg(orders, "o_orderstatus", {"avg_price": ("avg", SF.avg("o_totalprice"))})
    with _pytest.raises(ValueError, match="n"):
        salted_agg(orders, "o_orderstatus", {"n": SF.count(SF.lit(1))})

    # min/max kinds merge correctly (the whitelist's other half)
    got = {
        r["_key"]: (r["lo"], r["hi"])
        for r in salted_agg(
            orders,
            "o_orderstatus",
            {
                "lo": ("min", SF.min("o_totalprice")),
                "hi": ("max", SF.max("o_totalprice")),
            },
            n_salts=4,
        ).collect()
    }
    want = {
        r["o_orderstatus"]: (r["lo"], r["hi"])
        for r in orders.groupBy("o_orderstatus")
        .agg(SF.min("o_totalprice").alias("lo"), SF.max("o_totalprice").alias("hi"))
        .collect()
    }
    assert got == want


def test_grouping_shapes_shares_one_preagg_exchange(spark):
    """agg_grouping_shapes pre-aggregates the fact table once; the three
    union branches (rollup/cube/sets) must reuse that exchange instead
    of re-scanning — pinned so the single-scan plan can't regress."""
    from smart_contract_database_builder_spark import plans
    from conftest import SF_SMOKE

    df = plans.QUERIES["agg_grouping_shapes"].fn(spark, SF_SMOKE)
    df.collect()  # AQE inserts ReusedExchange in the FINAL adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 2, plan


def test_ann_bucket_partitioned_layout_prunes(spark, tmp_path):
    """The ANN scale story: the hyperplane bucket (or IVF cell) becomes
    a WRITE-TIME partition key, so a query probing one bucket reads
    1/2^planes of the corpus via partition pruning — assert the pruning
    actually happens in the plan and in the rows read."""
    from smart_contract_database_builder_spark.plans.llm_ops import (
        _bucket_expr,
        _iscale,
    )
    from smart_contract_database_builder_spark.sources.tables import load_table
    from conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = str(tmp_path / "emb_by_bucket")
    emb.select(
        "vec_id", "embedding", F.transform("embedding", _iscale).alias("sv")
    ).select("vec_id", "embedding", _bucket_expr().alias("bucket")).write.partitionBy(
        "bucket"
    ).parquet(out)

    layout = spark.read.parquet(out)
    one = layout.filter(F.col("bucket") == layout.select("bucket").first()[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan
    n_total = layout.count()
    n_one = one.count()
    assert 0 < n_one < n_total


def test_stratified_sample_pushes_group_limit_below_shuffle(spark):
    """llm_stratified_sample's scale claim: the rank-filter window must
    plan as WindowGroupLimit with a PARTIAL pass before the exchange —
    each map task keeps at most N rows per stratum, so a skewed stratum
    never ships its full contents through the shuffle."""
    from smart_contract_database_builder_spark import plans
    from conftest import SF_SMOKE

    df = plans.QUERIES["llm_stratified_sample"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan, plan
    # and the scan reads only the two needed columns
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan, plan


def test_hot_key_split_join_is_value_neutral(spark):
    """hot_key_split_join (skew rewrite) must return exactly the plain
    join's rows, and its hot branch must plan as a broadcast join."""
    from smart_contract_database_builder_spark.functions.skew import (
        hot_key_split_join,
    )
    from smart_contract_database_builder_spark.sources.tables import load_table
    from conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events").select(
        F.col("user_id").alias("c_custkey"), "event_type", "value"
    )
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    hot = [r.c_custkey for r in events.groupBy("c_custkey").count()
           .orderBy(F.desc("count")).limit(3).collect()]

    split = hot_key_split_join(events, cust, "c_custkey", hot)
    plain = events.join(cust, "c_custkey")
    assert sorted(map(tuple, split.collect())) == sorted(
        map(tuple, plain.collect())
    )
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """At 100 TB, Spark's runtime Bloom-filter injection rewrites a
    selective dim-filter ⋈ fact join so the fact scan drops non-joining
    rows BEFORE the shuffle (`might_contain` on the join key, built by
    a `bloom_filter_agg` over the filtered creation side). The feature
    is size-gated — the 10 GB application-side default means sf0.1
    never triggers it in production configs — so this pin drops the
    gate to zero to prove the mechanism: the plan must contain the
    bloom nodes, and the pruned join must return row-for-row the same
    result as the unpruned one (a false-positive-only filter can drop
    nothing it shouldn't)."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from conftest import SF_ORACLE

    # builder.getOrCreate() returns the SHARED fixture session (configs
    # passed to the builder are ignored on an existing session), so set
    # the confs explicitly and restore the CAPTURED prior values — not
    # hardcoded defaults — so no unexpected conf leaks into later tests.
    base = (
        SparkSession.builder.master("local[4]")
        .appName("bloom-pin")
        .getOrCreate()
    )
    _mutated = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    _prior = {k: base.conf.get(k, None) for k in _mutated}
    for k, v in _mutated.items():
        base.conf.set(k, v)
    try:
        orders = base.read.parquet(f"{SF_ORACLE}/orders.parquet")
        lineitem = base.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
        sel = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
            "o_orderkey"
        )
        j = lineitem.join(sel, lineitem.l_orderkey == sel.o_orderkey)
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "simple"
        )
        assert "might_contain" in plan, "bloom filter was not injected"
        assert "bloom_filter_agg" in plan
        got = j.count()

        base.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        want = lineitem.join(sel, lineitem.l_orderkey == sel.o_orderkey).count()
        assert got == want, "bloom pruning changed the join result"
    finally:
        for k, prior in _prior.items():
            if prior is None:
                base.conf.unset(k)
            else:
                base.conf.set(k, prior)
