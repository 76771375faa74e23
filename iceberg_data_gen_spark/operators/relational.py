"""Relational query layer over the driver testdata (TPC-H-ish star schema).

Fills the SURVEY.md §2.2 ✘-categories the reference lacks: joins of every
flavor (broadcast/shuffle, semi, anti, as-of, range), hash aggregation with
distinct / rollup / cube / grouping sets, window functions, sorts / top-k,
set operations, and the scalar-function surface (string / date / math /
JSON / conditional).

Scale notes (100 TB posture)
----------------------------
* Everything is declarative DataFrame API — Catalyst handles predicate
  pushdown, column pruning, and join planning; AQE re-plans at runtime.
* Dimension tables (region, nation, supplier, part, customer at low SF)
  are explicitly ``broadcast()``-hinted where the star-schema shape makes
  the build side small relative to lineitem/orders; fact-fact joins
  (lineitem ⋈ orders) are left to sort-merge with AQE skew handling.
* Aggregates are computed with map-side partial aggregation for free
  (groupBy + agg lowers to HashAggregate(partial) → shuffle → final).
* Floating-point aggregates are rounded identically in the Spark and
  oracle forms so value hashes are stable across summation orders.

Reference parity note: the reference implements none of these operators
(SURVEY.md §2.2 — absent categories); they enter via the driver's
north-star extension (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_data_gen_spark.operators import register
from iceberg_data_gen_spark.operators.common import spread_scan
from iceberg_data_gen_spark.operators.common import tables as _t




def R2(c: Column) -> Column:
    return F.round(c, 2)


# dsum/dsum_sql moved to registration-free common.py (review r10) so
# modules that load BEFORE this one (analytics) can share them without
# triggering this module's @register side effects out of order;
# re-exported here because relational2/relational3 import them from this
# module's namespace.
from iceberg_data_gen_spark.operators.common import dsum, dsum_sql  # noqa: E402,F401


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                        AS sum_qty,
           {dsum_sql('l_extendedprice', 2)}                       AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 4)}    AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)}
                                                                  AS sum_charge,
           round(avg(l_quantity), 4)                              AS avg_qty,
           round({dsum_sql('l_extendedprice', 2)} / count(*), 6)  AS avg_price,
           round({dsum_sql('l_discount', 2)} / count(*), 6)       AS avg_disc,
           count(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: full-scan hash aggregation with computed measures.

    Plan shape at scale: parquet scan with l_shipdate pushed down +
    ReadSchema pruned to 7 columns → partial HashAggregate → exchange on
    (returnflag, linestatus) [tiny: 6 groups] → final HashAggregate.

    The scan is spread first (r13, guide §2.5): the single-row-group
    testdata layout ran the whole 600k-row partial aggregate on ONE task
    (measured 1.7s warm → ~0.4s spread).  The spread hashes on
    l_shipdate — a column the query already reads (so ReadSchema stays
    pruned to its 7 columns, plan-locked) with ~2,500 distinct values,
    ~80× the partition count (the §2.5 key-cardinality rule).  The
    filter still pushes down through the exchange (plan-locked), and
    every aggregate is order-insensitive at the bit level: the money
    sums are exact DECIMAL (dsum), and sum/avg of l_quantity sum small
    integers, exact in double under any order.
    """
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    lineitem = spread_scan(lineitem, sf_dir, "lineitem", "l_shipdate")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(dsum(F.col("l_extendedprice"), 2) / F.count(F.lit(1)), 6).alias(
                "avg_price"
            ),
            F.round(dsum(F.col("l_discount"), 2) / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql("l_extendedprice * l_discount")} AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.09
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: selective filter + scalar aggregate.

    All four predicates are parquet-pushable (min/max row-group skipping at
    scale); the aggregate is a single partial+final pair with no groups.
    """
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.09))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_distinct_agg",
    oracle=f"""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*)                  AS n_orders,
           {dsum_sql("o_totalprice", 2)} AS total
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation alongside plain aggregates (expand-based plan)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), 2).alias("total"),
    )


@register(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (grouping-sets expansion, one shuffle)."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_quantity").alias("sum_qty"),
    )


@register(
    "q_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round({dsum_sql("o_totalprice", 2)} / count(*), 6)
               AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(dsum(F.col("o_totalprice"), 2) / F.count(F.lit(1)), 6).alias("avg_price"),
    )


@register(
    "q_having",
    oracle=f"""
    SELECT o_custkey, count(*) AS n_orders,
           {dsum_sql("o_totalprice", 2)} AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 3
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + post-aggregation filter (HAVING)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("spend"),
        )
        .where(F.col("n_orders") >= 3)
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + aggregate + top-k.

    customer (filtered to one segment) is broadcast into orders; the
    orders⋈lineitem join shuffles on orderkey (both sides pre-filtered, so
    AQE can still downgrade it to broadcast at low SF).  The final top-10 is
    TakeOrderedAndProject — no global sort materialization.
    """
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    # r13 (guide §2.5): spread the under-parallel single-row-group scan;
    # the spread key IS the join key, so the exchange doubles as the
    # join-side partitioning.  dsum is exact decimal — order-insensitive.
    lineitem = spread_scan(lineitem, sf_dir, "lineitem", "l_orderkey")
    return (
        lineitem.where(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        .join(
            orders.where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            # no hint: customer SCALES with SF (review r9) — the
            # segment filter shrinks it, but a hard hint would still
            # force a billions-row broadcast at 100 TB; the planner's
            # size estimate / AQE broadcasts it whenever actually small
            customer.where(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join restricted to one region.

    Join order is chosen so the one fact-fact shuffle (lineitem⋈orders on
    orderkey) happens first on filtered inputs; region/nation/supplier/
    customer are all broadcast (dimension tables stay small at any SF in
    this star schema — supplier/customer scale but remain ≪ lineitem).
    """
    customer, orders, lineitem, supplier, nation, region = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    # r13: spread the degenerate scan on the first join's key (guide §2.5)
    lineitem = spread_scan(lineitem, sf_dir, "lineitem", "l_orderkey")
    asia_nations = (
        nation.join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        lineitem.join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # supplier/customer SCALE with SF: no hard hints (review r9) —
        # size-estimate/AQE broadcasts them while small; asia_nations is
        # bounded (≤25 rows) so its hint is a design invariant
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1993-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-01-01 00:00:00'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue ranking (join + agg + top-k)."""
    customer, orders, lineitem, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    # r13: spread the degenerate scan on the first join's key (guide §2.5)
    lineitem = spread_scan(lineitem, sf_dir, "lineitem", "l_orderkey")
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1993-10-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # customer scales with SF: unhinted (review r9); nation is a
        # bounded 25-row dimension, its hint stays
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", R2(F.col("c_acctbal")).alias("c_acctbal"), "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
    )
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers having at least one large order.

    Semi join never duplicates the left side, so no post-join distinct is
    needed — at scale this is one shuffle (or broadcast of the filtered
    orders keys) instead of join+dedup.
    """
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return customer.join(
        orders.where(F.col("o_totalprice") > 100000),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_semi",
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers that never ordered.

    Anti join is also the primitive our merge-on-read delete application
    uses (table ⟕ anti-join delete keys) — see
    iceberg_data_gen_spark/table/.
    """
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_outer_join",
    oracle="""
    SELECT n_name, count(c_custkey) AS n_customers,
           CAST(coalesce(sum(CAST(c_acctbal AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_bal
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving empty nations, with null-safe aggregate."""
    nation, customer = _t(spark, sf_dir, "nation", "customer")
    return (
        nation.join(customer, F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.coalesce(dsum(F.col("c_acctbal"), 2), F.lit(0.0)).alias("total_bal"),
        )
    )


@register(
    "q_range_join",
    oracle="""
    SELECT o.o_orderkey, count(e.event_id) AS n_events
    FROM orders o
    LEFT JOIN events e
      ON e.user_id = o.o_custkey
     AND e.ts >= o.o_orderdate
     AND e.ts < o.o_orderdate + INTERVAL 7 DAY
    WHERE o.o_orderkey % 10 = 0
    GROUP BY o.o_orderkey
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: events within 7 days after each order.

    The equality key (user_id = custkey) carries the shuffle; the range
    predicate is applied as a join residual, so this stays a hash/SMJ join
    on the equi-key rather than a cartesian — the scalable shape as long as
    per-key fan-out is bounded.
    """
    orders, events = _t(spark, sf_dir, "orders", "events")
    o = orders.where(F.col("o_orderkey") % 10 == 0)
    cond = (
        (F.col("user_id") == F.col("o_custkey"))
        & (F.col("ts") >= F.col("o_orderdate"))
        & (F.col("ts") < F.col("o_orderdate") + F.expr("INTERVAL 7 DAY"))
    )
    return (
        o.join(events, cond, "left")
        .groupBy("o_orderkey")
        .agg(F.count("event_id").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "q_window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   -- NULLS FIRST on the ASC tie-break = Spark's
                   -- default (r11 latent-tie pin)
                   ORDER BY o_totalprice DESC, o_orderkey NULLS FIRST
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number (deterministic tie-break).

    At scale Spark rewrites rank-filter windows into a partial top-k per
    partition before the shuffle (WindowGroupLimit), so this does not
    materialize full per-customer sorts.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", R2(F.col("o_totalprice")).alias("o_totalprice"), "rn")
    )


@register(
    "q_window_running",
    oracle="""
    -- NULLS FIRST pins DuckDB to Spark's ASC default (NULL sweep r11):
    -- a NULL o_orderdate otherwise sorts last here and first in Spark,
    -- shifting every running sum and lag in the partition
    SELECT o_custkey, o_orderkey,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 2) AS running_spend,
           lag(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST
           ) AS prev_orderkey
    FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + lag over a deterministic per-customer order.

    The frame sum accumulates in DECIMAL: engines disagree on in-frame
    float summation order (Spark runs the frame incrementally, DuckDB may
    use segment trees), and a raw double running sum can flip the .005
    rounding boundary on one engine only.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        R2(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
        ).alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


@register(
    "q_window_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           rank()       OVER (PARTITION BY p_brand
                              -- NULLS FIRST on the ASC tie-break =
                              -- Spark's default (r11 keys pass)
                              ORDER BY p_size DESC, p_partkey NULLS FIRST) AS size_rank,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC)            AS size_dense_rank,
           round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,4)))
                          OVER (PARTITION BY p_brand) AS DOUBLE)
                 / count(*) OVER (PARTITION BY p_brand), 2)                     AS brand_avg_price
    FROM part
    """,
)
def q_window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / unbounded partition aggregate in one pass."""
    (part,) = _t(spark, sf_dir, "part")
    wb = Window.partitionBy("p_brand")
    return part.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.rank().over(wb.orderBy(F.desc("p_size"), "p_partkey")).alias("size_rank"),
        F.dense_rank().over(wb.orderBy(F.desc("p_size"))).alias("size_dense_rank"),
        # exact DECIMAL sum / count instead of avg(): float accumulation
        # order inside a window frame differs across engines and can flip
        # the 2dp rounding at an exact half-cent mean
        F.round(
            F.sum(F.col("p_retailprice").cast("decimal(18,4)")).over(wb).cast("double")
            / F.count(F.lit(1)).over(wb),
            2,
        ).alias("brand_avg_price"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set ops
# ---------------------------------------------------------------------------


@register(
    "q_topk",
    oracle="""
    -- order in a subquery on the RAW column: DuckDB binds a same-named
    -- ORDER BY to the rounded SELECT alias, Spark's orderBy to the raw
    -- column — with >2dp prices straddling the LIMIT boundary the two
    -- would pick different row sets (review r9; latent on current
    -- 2dp-exact testdata)
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
    FROM (
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        -- NULLS FIRST on the ASC tie-breaks = Spark's default (r12
        -- keys-sweep audit): a NULL orderkey row tying on price at the
        -- LIMIT boundary would otherwise pick different row sets
        ORDER BY l_extendedprice DESC,
                 l_orderkey NULLS FIRST, l_linenumber NULLS FIRST
        LIMIT 25
    )
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — TakeOrderedAndProject, never a full sort at scale."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(25)
        .select("l_orderkey", "l_linenumber", R2(F.col("l_extendedprice")).alias("l_extendedprice"))
    )


@register(
    "q_set_ops",
    oracle="""
    WITH big_spenders AS (
        SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey
        HAVING sum(CAST(o_totalprice AS DECIMAL(18,2))) > 300000
    ),
    building AS (
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    SELECT custkey, 'union' AS src FROM (SELECT custkey FROM big_spenders UNION SELECT custkey FROM building)
    UNION ALL
    SELECT custkey, 'intersect' AS src FROM (SELECT custkey FROM big_spenders INTERSECT SELECT custkey FROM building)
    UNION ALL
    SELECT custkey, 'except' AS src FROM (SELECT custkey FROM big_spenders EXCEPT SELECT custkey FROM building)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct), INTERSECT, EXCEPT exercised in one result."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    big = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"))
        .where(F.col("spend") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    bld = customer.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return (
        big.union(bld).distinct().select("custkey", F.lit("union").alias("src"))
        .unionAll(big.intersect(bld).select("custkey", F.lit("intersect").alias("src")))
        # subtract() IS SQL EXCEPT; exceptAll().distinct() only matches it
        # while both inputs are duplicate-free
        .unionAll(big.subtract(bld).select("custkey", F.lit("except").alias("src")))
    )


# ---------------------------------------------------------------------------
# Scalar function surface
# ---------------------------------------------------------------------------


@register(
    "q_scalar_string_date_math",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderstatus)                         AS status_u,
           substr(o_orderpriority, 1, 1)                AS prio_code,
           length(o_orderpriority)                      AS prio_len,
           -- concat_ws, not concat (NULL sweep r11): Spark's concat_ws
           -- SKIPS NULL operands while concat() renders them as '' —
           -- a NULL o_orderstatus gave '1-URGENT' vs '-1-URGENT'
           concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
           EXTRACT(year FROM o_orderdate)               AS o_year,
           EXTRACT(month FROM o_orderdate)              AS o_month,
           EXTRACT(day FROM o_orderdate)                AS o_day,
           round(abs(o_totalprice - 150000.0), 2)       AS dist_from_150k,
           round(sqrt(o_totalprice), 4)                 AS price_sqrt,
           round(ln(o_totalprice + 1), 6)               AS price_ln,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                          AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_decoded,
           o_orderkey % 7                               AS key_mod7
    FROM orders
    WHERE o_orderkey <= 1000
    """,
)
def q_scalar_string_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date-extract / math / conditional scalar functions.

    All JVM built-ins inside one WholeStageCodegen span — no Python UDFs.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.where(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_u"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        R2(F.abs(F.col("o_totalprice") - 150000.0)).alias("dist_from_150k"),
        F.round(F.sqrt("o_totalprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("o_totalprice") + 1), 6).alias("price_ln"),
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_decoded"
        ),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
    )


@register(
    "q_json_events",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           round({dsum_sql('value', 2)} / count(*), 4) AS avg_value
    FROM events
    GROUP BY event_type
    """,
)
def q_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (get_json_object) + aggregate over the events table.

    ``avg_value`` accumulates in DECIMAL (events.value has <= 2 decimal
    places, so the sum is exact regardless of merge order) and divides by
    the count — a raw double avg() drifts with partition merge order and
    can flip round(.., 4) between engines.
    """
    (events,) = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        F.round(dsum(F.col("value"), 2) / F.count(F.lit(1)), 4).alias("avg_value"),
    )


@register(
    "q_time_bucket_events",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS bucket,
           event_type,
           count(*) AS n_events,
           round({dsum_sql('value', 2)}, 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_time_bucket_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch tumbling-window aggregation via hour truncation.

    The streaming twin (withWatermark + window()) lives in
    iceberg_data_gen_spark/streaming/; this batch form is the
    oracle-checkable equivalent.
    """
    (events,) = _t(spark, sf_dir, "events")
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(dsum(F.col("value"), 2), 4).alias("sum_value"),
    )
