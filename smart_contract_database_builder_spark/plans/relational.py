"""Relational query surface (SURVEY.md §2.2-2.8) — all Catalyst-native.

Every query here is a declarative DataFrame plan: filters and projections
sit above the scan so Catalyst pushes them into the parquet reader, small
dimensions are explicitly broadcast, and aggregates run partial+final
automatically. No Python executes per-row in any of these.

Parity rules (see ``functions.numeric``): per-row double arithmetic is
emitted raw (IEEE-identical across engines); aggregates over money columns
run in exact DECIMAL and cast to DOUBLE at output, so value hashes match
the DuckDB oracle bit-for-bit regardless of summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import davg, dec, dsum, dsum_expr
from ..sources.tables import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship (Phase 0): revenue by region — J3 star join + A4 agg + O5 sort
# ---------------------------------------------------------------------------


@register(
    "flagship_revenue_by_region",
    oracle="""
    SELECT r.r_name AS region_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS line_count
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY revenue DESC
    """,
)
def flagship_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema revenue rollup: lineitem⋈orders⋈customer⋈nation⋈region.

    Scale shape: explicit ``broadcast()`` only on the genuinely bounded
    dims (nation: 25 rows, region: 5 rows — constant at any SF). The
    scaling tables (customer, orders, lineitem) join without hints: AQE /
    the autoBroadcastJoinThreshold pick broadcast while they fit and fall
    back to shuffle joins at cluster scale, where orders⋈customer shuffles
    on o_custkey and lineitem⋈orders on l_orderkey. Aggregation is partial
    (map-side) then final on 5 region keys, so the last shuffle is tiny.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    cust_region = (
        customer.select("c_custkey", "c_nationkey")
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")),
              customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    order_region = (
        orders.select("o_orderkey", "o_custkey")
        .join(cust_region, orders.o_custkey == cust_region.c_custkey)
        .select("o_orderkey", "r_name")
    )
    revenue = lineitem.select(
        "l_orderkey",
        (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("rev"),
    )
    return (
        revenue.join(order_region,
                     revenue.l_orderkey == order_region.o_orderkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            dsum_expr(F.col("rev")).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy(F.desc("revenue"))
    )


# ---------------------------------------------------------------------------
# A4: TPC-H Q1-style pricing summary (hash aggregation, partial+final)
# ---------------------------------------------------------------------------


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)   AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)      AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape over lineitem (REF A4 hash aggregation).

    The shipdate filter is pushed into the parquet scan; groupBy keys have
    tiny cardinality so the final shuffle moves only partial-agg rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_expr(disc_price).alias("sum_disc_price"),
            dsum_expr(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# P1-P3: projections, predicates, point lookup (reference db.rs:109-138)
# ---------------------------------------------------------------------------


@register(
    "filter_point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey = 42 LIMIT 1
    """,
)
def filter_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REF P2: equality point lookup (`WHERE id = ? LIMIT 1`, db.rs:109-120).

    Maps to a pushed-down parquet predicate; at scale, id-partitioned or
    bucketed layout turns this into partition pruning instead of a scan.
    """
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 42)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(1)
    )


@register(
    "filter_type_predicate",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice AS total_price
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 50000
    """,
)
def filter_type_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REF P3 enum-equality + range predicate, projected (REF P1).

    Both predicates and the 3-column projection reach the parquet scan
    (PushedFilters + pruned ReadSchema).
    """
    return (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 50000))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_totalprice").alias("total_price"),
        )
    )


@register(
    "filter_suffix_predicate",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE lower(source) LIKE '%3' AND n_chars >= 200
    """,
)
def filter_suffix_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REF P4/P5/F12 shape: case-folded suffix test + numeric predicate.

    The suffix '3' selects a non-empty strict subset of the corpus
    (sources are 'src0'..'src19', so 'src3'/'src13' match) — a 0-row
    result would make the oracle comparison vacuous.
    """
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.lower(F.col("source")).endswith("3") & (F.col("n_chars") >= 200))
        .select("doc_id", "lang", "n_chars")
    )


# ---------------------------------------------------------------------------
# J3-J4: joins (broadcast star join, semi, anti)
# ---------------------------------------------------------------------------


@register(
    "join_order_customer_nation",
    oracle="""
    SELECT o.o_orderkey, c.c_name, n.n_name AS nation_name,
           o.o_totalprice AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_totalprice > 100000
    """,
)
def join_order_customer_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT J3 equi-join chain.

    Only nation (25 rows, SF-constant) gets an explicit broadcast hint;
    customer scales with SF, so its join is left to the size threshold /
    AQE — broadcast while small, shuffle on o_custkey at cluster scale.
    """
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "o_orderkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            F.col("o_totalprice").alias("total_price"),
        )
    )


@register(
    "join_semi_anti_customers",
    oracle="""
    SELECT 'with_big_orders' AS rel, c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    UNION ALL
    SELECT 'without_big_orders' AS rel, c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 250000)
    """,
)
def join_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT J4 left-semi + left-anti joins in one tagged result — the
    existence check and its complement (the sink-dedup primitive,
    SURVEY.md §1.4) over the same high-value order subset.

    The >250000 threshold keeps BOTH partitions non-empty (every
    customer has *some* order, so an unfiltered anti-join would be
    vacuously empty); semi + anti rows partition the customer table.
    """
    customer = _t(spark, sf_dir, "customer")
    big_orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    semi = customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi"
    ).select(F.lit("with_big_orders").alias("rel"), "c_custkey", "c_name")
    anti = customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey, "left_anti"
    ).select(F.lit("without_big_orders").alias("rel"), "c_custkey", "c_name")
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# A5-A6: distinct cardinality, rollup/cube
# ---------------------------------------------------------------------------


@register(
    "agg_distinct_counts",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_customers_with_orders,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT A5 exact distinct counts (expand + two-phase agg in Spark)."""
    return _t(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_customers_with_orders"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_GROUPING_AGGS_SQL = """COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price"""


@register(
    "agg_grouping_shapes",
    oracle=f"""
    SELECT 'rollup' AS shape,
           COALESCE(o_orderstatus, 'ALL') AS order_status,
           COALESCE(o_orderpriority, 'ALL') AS order_priority,
           {_GROUPING_AGGS_SQL}
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'cube' AS shape,
           COALESCE(o_orderstatus, 'ALL') AS order_status,
           COALESCE(o_orderpriority, 'ALL') AS order_priority,
           {_GROUPING_AGGS_SQL}
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'sets' AS shape,
           COALESCE(o_orderstatus, 'ALL') AS order_status,
           COALESCE(o_orderpriority, 'ALL') AS order_priority,
           {_GROUPING_AGGS_SQL}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT A6, all three multi-grouping shapes in one tagged result:
    ROLLUP, CUBE, and explicit GROUPING SETS ((status), (priority)).

    Scale shape: the fact table is reduced ONCE to the full
    (status, priority) grain — |statuses|×|priorities| ≈ 30 rows at any
    SF — and each shape re-aggregates that tiny frame (sum-of-partial-
    sums in exact decimal, so results are identical to direct
    aggregation). The three union branches share a byte-identical
    pre-aggregation subplan, which Spark's ReuseExchange collapses to a
    single scan + partial agg; a naive per-shape aggregate would scan
    the fact table three times. Keys are COALESCE'd for oracle parity.
    """
    pre = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(dec("o_totalprice")).alias("pt"),  # stay exact decimal
        )
    )
    shaped = []
    for tag, grouped in (
        ("rollup", pre.rollup("o_orderstatus", "o_orderpriority")),
        ("cube", pre.cube("o_orderstatus", "o_orderpriority")),
        (
            "sets",
            pre.groupingSets(
                [["o_orderstatus"], ["o_orderpriority"]],
                "o_orderstatus",
                "o_orderpriority",
            ),
        ),
    ):
        shaped.append(
            grouped.agg(
                F.sum("pn").alias("n_orders"),
                F.sum("pt").cast("double").alias("total_price"),
            ).select(
                F.lit(tag).alias("shape"),
                F.coalesce("o_orderstatus", F.lit("ALL")).alias("order_status"),
                F.coalesce("o_orderpriority", F.lit("ALL")).alias("order_priority"),
                "n_orders",
                "total_price",
            )
        )
    out = shaped[0]
    for df in shaped[1:]:
        out = out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# W1-W3: window functions
# ---------------------------------------------------------------------------


@register(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, total_price, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice AS total_price,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT W1 ranking window; tie-broken by orderkey for determinism."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("total_price"),
            "rn",
        )
    )


@register(
    "window_running_revenue_by_date",
    oracle="""
    SELECT order_date,
           CAST(daily_revenue AS DOUBLE) AS daily_revenue,
           CAST(SUM(daily_revenue) OVER (ORDER BY order_date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_revenue
    FROM (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS daily_revenue
      FROM orders GROUP BY 1
    )
    """,
)
def window_running_revenue_by_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT W3 frame-spec running sum over a pre-aggregated (small) input.

    The global window runs on already-reduced daily rows — never the raw
    fact table — so the single-partition window stage sees only
    |distinct dates| rows regardless of SF. The running sum itself stays
    in exact decimal (window sum order is engine-internal otherwise).

    Date keys are emitted as 'yyyy-MM-dd' strings — DATE-typed outputs
    surface as different Python types from Spark vs DuckDB and break
    value-hash parity.
    """
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
        .agg(F.sum(dec("o_totalprice")).alias("daily_revenue_dec"))
    )
    w = Window.orderBy("order_date").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "order_date",
        F.col("daily_revenue_dec").cast("double").alias("daily_revenue"),
        F.sum("daily_revenue_dec").over(w).cast("double").alias("running_revenue"),
    )


@register(
    "window_lag_lead_first_last",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(value) OVER w AS first_value,
           LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT W2, the full analytic family in one pass: lag / lead / first /
    last per user ordered by event time (last over an explicit
    whole-partition frame — the default frame would degenerate to the
    current row). One shuffle on user_id serves all four functions."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
        F.last("value").over(w_full).alias("last_value"),
    )


# ---------------------------------------------------------------------------
# O5: order-by / top-k (TakeOrderedAndProject)
# ---------------------------------------------------------------------------


@register(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_totalprice AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT O5 top-k: Spark plans TakeOrderedAndProject (no full sort)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.col("o_totalprice").alias("total_price"))
    )


# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------


@register(
    "set_ops_customer_keys",
    oracle="""
    SELECT 'union' AS op, custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
      UNION
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    )
    UNION ALL
    SELECT 'intersect' AS op, custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    )
    UNION ALL
    SELECT 'except_all' AS op, custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    )
    """,
)
def set_ops_customer_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT set ops, all three families tagged in one result: UNION
    (distinct) of high-value key sets, INTERSECT of open∩filled buyers,
    and EXCEPT ALL with exact multiset semantics (a custkey appearing
    3× as 'F' and 1× as 'O' survives twice, matching DuckDB's bag
    difference)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    union_k = (
        orders.filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("custkey"))
        .union(
            customer.filter(F.col("c_acctbal") > 9000).select(
                F.col("c_custkey").alias("custkey")
            )
        )
        .distinct()
    )
    open_k = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    filled_k = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    tagged = [
        union_k.select(F.lit("union").alias("op"), "custkey"),
        open_k.intersect(filled_k).select(F.lit("intersect").alias("op"), "custkey"),
        filled_k.exceptAll(open_k).select(F.lit("except_all").alias("op"), "custkey"),
    ]
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# F17-F19: date/math/json scalar surface
# ---------------------------------------------------------------------------


@register(
    "scalar_date_parts_orders",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def scalar_date_parts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT F17 date scalars feeding an aggregation."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


@register(
    "scalar_math_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           ABS(l_discount - 0.05) AS disc_dev,
           SQRT(l_quantity) AS qty_sqrt
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT F18 arithmetic scalars, fully codegen'd; raw IEEE doubles
    (identical expression tree on both engines ⇒ identical bits)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    charge = (
        F.col("l_extendedprice")
        * (F.lit(1) - F.col("l_discount"))
        * (F.lit(1) + F.col("l_tax"))
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge.alias("charge"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
    )


@register(
    "scalar_json_props_events",
    oracle="""
    SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
)
def scalar_json_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT F19 / REF F7 JSON point access (`$.k`) feeding an aggregation.

    Filters on the *pre-cast* extracted string (both engines agree on
    extraction); the numeric cast is null-on-failure on both sides
    (Spark CAST ≙ DuckDB TRY_CAST), so a non-numeric props.k groups
    under NULL identically instead of silently diverging.
    """
    ev = _t(spark, sf_dir, "events")
    extracted = F.get_json_object("props", "$.k")
    return (
        ev.filter(extracted.isNotNull())
        .select(extracted.cast("bigint").alias("k_value"), "value")
        .groupBy("k_value")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )
