"""Third wave of relational coverage: the remaining TPC-H shapes the
driver schema can express (Q8/Q9/Q13/Q15/Q16/Q17/Q21/Q22 adapted —
the testdata has no partsupp/comment/phone columns, so each query keeps
the reference shape on the columns that exist), plus lateral explode,
map functions, array higher-order functions, extended window frames
(ntile/percent_rank/cume_dist/nth_value; time-RANGE frames live in
q_window_time_range), INTERSECT ALL /
EXCEPT ALL, deterministic hash sampling, regexp functions, and cross
join.

Same design rules as relational.py: declarative DataFrame/SQL only,
broadcast hints for dimensions, aliases matched 1:1 with the oracle,
money sums accumulated in DECIMAL (dsum) so values are order-independent
and engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_data_gen_spark.operators import register
from iceberg_data_gen_spark.operators.common import iso_weekday
from iceberg_data_gen_spark.operators.common import tables as _t
from iceberg_data_gen_spark.operators.common import scratch_dir as _scratch
from iceberg_data_gen_spark.operators.relational import dsum, dsum_sql
from iceberg_data_gen_spark.session import load_tables




# ---------------------------------------------------------------------------
# Remaining TPC-H shapes
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle=f"""
    SELECT EXTRACT(year FROM o_orderdate) AS o_year,
           round({dsum_sql("CASE WHEN sn.n_name = 'NATION_3' "
                           "THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 4)}
                 / {dsum_sql('l_extendedprice * (1 - l_discount)', 4)}, 6) AS mkt_share
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = cn.n_regionkey AND r_name = 'AMERICA'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue per year.

    Both the numerator (conditional) and denominator accumulate in
    DECIMAL, so the final double ratio is identical across engines and
    partition orders.  All dimensions broadcast; lineitem streams.
    """
    lineitem, orders, customer, supplier, nation, region = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    return (
        # customer/supplier SCALE with SF — no hard hints (review r9,
        # the q3/q5/q10 rule applied here): size-estimate/AQE broadcasts
        # them while small; nation/region projections are bounded
        lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == "AMERICA")),
            F.col("r_regionkey") == F.col("cn_region"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(dsum(nat_rev, 4) / dsum(rev, 4), 6).alias("mkt_share"))
    )


@register(
    "q9_product_type_profit",
    oracle=f"""
    SELECT sn.n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey AND p_type = 'ECONOMY'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    GROUP BY 1, 2
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp/supplycost in the testdata, so profit
    reduces to discounted revenue): per supplier-nation × year for one
    product type."""
    lineitem, part, supplier, nation, orders = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders"
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        # part/supplier SCALE with SF (the type filter keeps a constant
        # FRACTION, not a bounded count) — no hard hints (review r9)
        lineitem.join(
            part.where(F.col("p_type") == "ECONOMY"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(rev, 4).alias("sum_profit"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over a filtered left outer join
    (customers with zero matching orders land in the c_count=0 bucket)."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max revenue in a window.

    The max is an aggregate broadcast back as a 1-row join (not an
    unpartitioned window), so the two-pass plan scales: pass 1 computes
    per-supplier revenue, pass 2 joins the broadcast global max.
    Equality on the DECIMAL-accumulated revenue is exact.
    """
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        # supplier SCALES with SF — no hard hint (review r9): after the
        # 1-row max join the LEFT side is ~1 row and AQE broadcasts THAT
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_rev"))
        .join(supplier, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_size IN (1, 5, 10, 15, 20, 25)
      -- NOT EXISTS, not NOT IN (r11 wave 4): one NULL s_suppkey in
      -- the exclusion list makes NOT IN UNKNOWN for EVERY row and
      -- empties the oracle, while Spark's left_anti ignores NULL
      -- build rows (the q_anti_join convention)
      AND NOT EXISTS (SELECT 1 FROM supplier
                      WHERE s_acctbal < 0 AND s_suppkey = l_suppkey)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts with a NOT IN exclusion
    list (anti join against the excluded suppliers)."""
    part, lineitem, supplier = _t(spark, sf_dir, "part", "lineitem", "supplier")
    excluded = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        # part and the supplier exclusion list SCALE with SF — no hard
        # hints (review r9); the planner broadcasts them while small
        lineitem.join(
            part.where(
                (F.col("p_brand") != "Brand#3")
                & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(excluded, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#2'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated average-quantity subquery, de-correlated into
    a per-part aggregate joined back to the fact (the plan Catalyst would
    build for the subquery form — written explicitly here so the
    broadcast of the small per-part aggregate is guaranteed).

    l_quantity values are small integers in doubles, so their sum/avg is
    exact and the 0.2× threshold is engine-identical.
    """
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    per_part_avg = lineitem.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        # part and the per-part threshold aggregate are PART-cardinality
        # (scale with SF) — no hard hints (review r9); the threshold join
        # reuses the l_partkey partitioning when it outgrows a broadcast
        lineitem.join(
            part.where(F.col("p_brand") == "Brand#2"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(per_part_avg, F.col("ap_key") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.coalesce(
                    F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), F.lit(0)
                ).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders o
    WHERE s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape ("suppliers who kept orders waiting", with
    shipdate−orderdate as the lateness signal since the testdata has no
    receipt/commit dates): late lineitems in multi-supplier orders where
    the line's supplier is the ONLY late one.

    The EXISTS / NOT EXISTS pair de-correlates into two per-order
    aggregates (distinct-supplier count; distinct-late-supplier count)
    joined back to the late rows — two shuffles on l_orderkey instead of
    two correlated subplans, and the form Spark can't express directly
    (non-equality correlation in NOT EXISTS is unsupported).  The
    per-order aggregates join WITHOUT broadcast hints (review r8: they
    are order-cardinality — billions of rows at 100 TB — and the
    aggregation already shuffled on l_orderkey, so the joins reuse that
    partitioning).  Review r9 extended the rule to supplier itself —
    it scales with SF, so its hard hint is gone too and the planner
    broadcasts it from its own size estimate while small.
    """
    supplier, lineitem, orders = _t(spark, sf_dir, "supplier", "lineitem", "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    late_rows = (
        lineitem.join(
            orders.where(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .where(late)
        .select("l_orderkey", "l_suppkey")
    )
    supp_per_order = lineitem.groupBy(F.col("l_orderkey").alias("so_key")).agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    late_supp_per_order = late_rows.groupBy(F.col("l_orderkey").alias("lo_key")).agg(
        F.countDistinct("l_suppkey").alias("n_late_supp")
    )
    return (
        late_rows.join(supp_per_order, F.col("so_key") == F.col("l_orderkey"))
        .join(late_supp_per_order, F.col("lo_key") == F.col("l_orderkey"))
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_dormant_customers",
    oracle="""
    WITH stats AS (
        SELECT count(*) AS cnt, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS total
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n_name, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey, stats
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > total
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders,
    per nation.

    The "above average" comparison is done as ``balance × count > sum``
    in DECIMAL — exact integer-style arithmetic on both engines — instead
    of comparing against a double average whose last-ulp value depends on
    summation order.  NOT EXISTS is a left anti join; the 1-row stats
    aggregate broadcasts.
    """
    customer, nation, orders = _t(spark, sf_dir, "customer", "nation", "orders")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    stats = customer.where(F.col("c_acctbal") > 0.0).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(bal).alias("total")
    )
    return (
        customer.crossJoin(F.broadcast(stats))
        .where(bal * F.col("cnt") > F.col("total"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Lateral explode / map / array higher-order functions
# ---------------------------------------------------------------------------


@register(
    "q_explode_lateral",
    oracle="""
    SELECT word, count(*) AS n_parts, count(DISTINCT p_brand) AS n_brands
    FROM (SELECT p_brand, unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    """,
)
def q_explode_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral view / explode: one row per word of p_name, re-aggregated.
    Explode is generate-side (no shuffle); only the groupBy shuffles."""
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.select("p_brand", F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct("p_brand").alias("n_brands"),
        )
    )


@register(
    "q_map_functions",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus   AS status_val,
           o_orderpriority AS prio_val,
           2               AS m_size,
           'prio,status'   AS keys_sorted
    FROM orders WHERE o_orderkey <= 200
    """,
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element_at + map_keys (emitted as scalars so the
    oracle stays engine-portable — map literals don't hash-compare
    identically across engines)."""
    (orders,) = _t(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("prio"), F.col("o_orderpriority")
    )
    return orders.where(F.col("o_orderkey") <= 200).select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_val"),
        F.element_at(m, "prio").alias("prio_val"),
        F.size(m).alias("m_size"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )


@register(
    "q_array_hof",
    oracle="""
    SELECT o_orderkey,
           array_to_string(range(1, (o_orderkey % 5) + 4), ',')                 AS seq,
           array_to_string(
               list_filter(range(1, (o_orderkey % 5) + 4), x -> x % 2 = 0), ',') AS evens,
           array_to_string(
               list_transform(range(1, (o_orderkey % 5) + 4), x -> x * x), ',') AS squares,
           CAST(list_sum(range(1, (o_orderkey % 5) + 4)) AS BIGINT)             AS total,
           array_to_string(
               list_slice(list_sort(range(1, (o_orderkey % 5) + 4), 'DESC'), 1, 2),
               ',')                                                             AS top2
    FROM orders WHERE o_orderkey <= 300
    """,
)
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: sequence / filter / transform /
    aggregate / sort / slice — all JVM-side lambda expressions.

    Array-valued columns are serialized with array_join at the output
    boundary only — the driver's value-hash canonicalizer cannot sort
    list-typed pandas columns, so both engines emit delimited strings
    (the lambdas themselves still run on real arrays)."""
    (orders,) = _t(spark, sf_dir, "orders")
    seq = F.sequence(F.lit(1).cast("long"), F.pmod("o_orderkey", F.lit(5)) + 3)

    def _s(arr):
        return F.array_join(F.transform(arr, lambda x: x.cast("string")), ",")

    return orders.where(F.col("o_orderkey") <= 300).select(
        "o_orderkey",
        _s(seq).alias("seq"),
        _s(F.filter(seq, lambda x: x % 2 == 0)).alias("evens"),
        _s(F.transform(seq, lambda x: x * x)).alias("squares"),
        F.aggregate(seq, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("total"),
        _s(F.slice(F.sort_array(seq, asc=False), 1, 2)).alias("top2"),
    )


# ---------------------------------------------------------------------------
# Window frames beyond rank/row_number
# ---------------------------------------------------------------------------


@register(
    "q_window_frames",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cum_dist,
           first_value(o_orderkey) OVER w AS first_key,
           nth_value(o_orderkey, 2) OVER w AS second_key
    FROM orders
    -- NULLS FIRST = Spark's ASC default (NULL sweep r11): a NULL
    -- o_totalprice otherwise lands in the last quartile in DuckDB and
    -- the first in Spark
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice NULLS FIRST, o_orderkey NULLS FIRST)
    """,
)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / first_value / nth_value over a
    tie-broken order (review r8: this query does NOT compute a RANGE
    frame — that surface lives in ``q_window_time_range``)."""
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


# ---------------------------------------------------------------------------
# Set ops (ALL variants), cross join, sampling, regexp
# ---------------------------------------------------------------------------


@register(
    "q_intersect_except_all",
    oracle="""
    WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
         b AS (SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT 'intersect_all' AS op, k, count(*) AS n FROM (
        SELECT k FROM a INTERSECT ALL SELECT k FROM b
    ) GROUP BY k
    UNION ALL
    SELECT 'except_all' AS op, k, count(*) AS n FROM (
        SELECT k FROM a EXCEPT ALL SELECT k FROM b
    ) GROUP BY k
    """,
)
def q_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set-ops: INTERSECT ALL / EXCEPT ALL preserve duplicate
    counts (min / difference of multiplicities) — checked via the
    per-key multiplicities after the op."""
    (orders,) = _t(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    b = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    ia = (
        a.intersectAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "k", "n")
    )
    ea = (
        a.exceptAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "k", "n")
    )
    return ia.unionAll(ea)


@register(
    "q_cross_join",
    oracle="""
    SELECT r_name, o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    """,
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product of two tiny relations (the only safe
    cross-join shape at scale: both sides bounded)."""
    region, orders = _t(spark, sf_dir, "region", "orders")
    return region.select("r_name").crossJoin(
        orders.select("o_orderstatus").distinct()
    )


@register(
    "q_sample_hash",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) <= '0c'
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% hash sample: md5 of the key is engine-portable
    and stable across runs/partitionings — unlike TABLESAMPLE, which is
    seed- and partition-layout-dependent.  This is the reproducible
    sampling primitive for pipeline debugging at scale."""
    (orders,) = _t(spark, sf_dir, "orders")
    h = F.md5(F.col("o_orderkey").cast("string").cast("binary"))
    return orders.where(F.substring(h, 1, 2) <= "0c").select("o_orderkey", "o_custkey")


@register(
    "q_regexp_functions",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '#(\\d+)', 1)                    AS digits,
           CAST(regexp_extract(c_name, '#(\\d+)', 1) AS BIGINT)    AS digits_num,
           len(regexp_extract_all(c_name, '\\d'))                  AS n_digit_chars,
           regexp_matches(c_name, '00$')                           AS ends_00,
           regexp_replace(c_name, '^Customer#0+', 'C')             AS short_name
    FROM customer
    """,
)
def q_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface: extract / extract-group cast / per-char count /
    boolean match / replace."""
    (customer,) = _t(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.regexp_extract("c_name", r"#(\d+)", 1).alias("digits"),
        F.regexp_extract("c_name", r"#(\d+)", 1).cast("bigint").alias("digits_num"),
        F.size(F.expr(r"regexp_extract_all(c_name, '\\d', 0)")).alias("n_digit_chars"),
        F.col("c_name").rlike("00$").alias("ends_00"),
        F.regexp_replace("c_name", r"^Customer#0+", "C").alias("short_name"),
    )


@register(
    "q_partitioned_scan",
    oracle="""
    SELECT EXTRACT(year FROM o_orderdate) AS o_year, o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997)
    GROUP BY 1, 2
    """,
)
def q_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned layout + partition pruning: orders re-written
    partitioned by year into a temp dir (executors write each partition
    directory in parallel), then scanned with a partition-key filter that
    Spark satisfies by PRUNING DIRECTORIES — the scan's PartitionFilters
    handle the year predicate and only 2 of the ~7 year directories are
    read (see tests/test_plans.py).  This is the table-layout half of the
    100 TB story: time-partitioned facts make time-bounded queries read
    only their slice."""

    (orders,) = _t(spark, sf_dir, "orders")
    path = _scratch("part-orders-")
    (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(path)
    )
    part = spark.read.parquet(path)
    return (
        part.where(F.col("o_year").isin(1996, 1997))
        .groupBy("o_year", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "q_skew_salted_agg",
    oracle="""
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation for skewed keys: documents per lang
    (5 languages → 5 hot reduce keys at any scale).

    Stage 1 aggregates on (lang, salt) — the hot key's rows spread over
    SALT reducers; stage 2 merges the SALT partials per lang (tiny).
    Counts/sums are associative so the result is identical to the direct
    groupBy, which is what the oracle computes.  This is the manual form
    of what AQE skew handling does for joins; for aggregations Spark's
    partial aggregation usually suffices, but when a single group's
    partials are themselves too hot (billions of rows per key feeding
    one reducer slot), salting is the standing fix.
    """
    SALT = 16
    (docs,) = _t(spark, sf_dir, "documents")
    stage1 = (
        docs.withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(SALT)))
        .groupBy("lang", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("n_chars").alias("pc"))
    )
    return stage1.groupBy("lang").agg(
        F.sum("pn").alias("n_docs"), F.sum("pc").cast("long").alias("total_chars")
    )


@register(
    "q_format_roundtrip",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderkey <= 1000
    GROUP BY o_orderstatus
    """,
)
def q_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/sink format surface: the same slice written to CSV (with
    header, explicit schema on read-back — CSV carries no types) and to
    JSON lines, read back, unioned and re-verified: both halves must
    agree with the parquet original, so the aggregate over either equals
    the oracle.  Exercises write → read for the two text formats the
    parquet-native pipeline still meets at its edges (exports, logs)."""

    (orders,) = _t(spark, sf_dir, "orders")
    sel = orders.where(F.col("o_orderkey") <= 1000).select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice")
    )
    base = _scratch("fmt-rt-")
    sel.write.mode("overwrite").option("header", True).csv(base + "/csv")
    sel.write.mode("overwrite").json(base + "/json")
    schema = "o_orderkey long, o_orderstatus string, o_totalprice decimal(18,2)"
    csv_back = spark.read.schema(schema).option("header", True).csv(base + "/csv")
    json_back = spark.read.schema(schema).json(base + "/json")
    # both text halves must reproduce the parquet slice exactly; explicit
    # raise (not `assert`) so the check survives python -O
    for fmt, back in (("csv", csv_back), ("json", json_back)):
        if not (back.exceptAll(sel).isEmpty() and sel.exceptAll(back).isEmpty()):
            raise ValueError(f"{fmt} round-trip diverged from the parquet slice")
    return csv_back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").cast("double").alias("total"),
    )


@register(
    "q_exchange_reuse",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey
    )
    SELECT a.o_custkey, a.spend, b.spend AS next_spend
    FROM spend a JOIN spend b ON b.o_custkey = a.o_custkey + 1
    """,
)
def q_exchange_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same aggregation consumed twice (each customer's spend joined
    to the NEXT customer's spend): Spark plans the scan + partial
    aggregate + shuffle ONCE and wires the second consumer to a
    ReusedExchange — identical subtrees are physically de-duplicated, so
    self-referential analytics don't pay twice.  The projection is kept
    symmetric (both consumers read exactly the same columns): asymmetric
    column pruning would specialize the two subtrees and forfeit the
    reuse.  Plan-asserted in tests/test_plans.py."""
    (orders,) = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        dsum(F.col("o_totalprice"), 2).alias("spend"),
    )
    a, b = spend.alias("a"), spend.alias("b")
    return a.join(b, F.col("b.o_custkey") == F.col("a.o_custkey") + 1).select(
        F.col("a.o_custkey").alias("o_custkey"),
        F.col("a.spend").alias("spend"),
        F.col("b.spend").alias("next_spend"),
    )


@register(
    "q_dpp_join",
    oracle="""
    WITH dim AS (
        SELECT * FROM (VALUES
            (1995,'drop'),(1996,'keep'),(1997,'keep'),(1998,'drop'),
            (1999,'drop'),(2000,'drop'),(2001,'drop')
        ) AS t(d_year, flag)
    )
    SELECT EXTRACT(year FROM o_orderdate) AS o_year, count(*) AS n_orders
    FROM orders JOIN dim ON EXTRACT(year FROM o_orderdate) = d_year
    WHERE flag = 'keep'
    GROUP BY 1
    """,
)
def q_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: a year-partitioned fact joined to a
    filtered dimension.  The dim filter is only known at runtime, so
    Catalyst injects a ``dynamicpruningexpression`` into the fact scan's
    PartitionFilters — the broadcast build side doubles as the partition
    filter and only the 2 'keep' year directories are read.  This is the
    mechanism that keeps star joins from scanning the whole fact table
    when the predicate lives on the dimension (plan-asserted)."""

    (orders,) = _t(spark, sf_dir, "orders")
    path = _scratch("dpp-orders-")
    (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(path)
    )
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(y, "keep" if y in (1996, 1997) else "drop") for y in range(1995, 2002)],
        "d_year int, flag string",
    )
    return (
        fact.join(dim, fact["o_year"] == dim["d_year"])
        .where(F.col("flag") == "keep")
        .groupBy("o_year")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q_null_semantics",
    oracle="""
    WITH v AS (
        SELECT c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS val
        FROM customer
    )
    SELECT c_mktsegment,
           count(*) AS n_rows,
           count(val) AS n_nonnull,
           CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(coalesce(sum(CAST(val AS DECIMAL(18,2))), 0) AS DOUBLE) AS sum_val,
           CAST(sum(CASE WHEN val IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS nullsafe_null_eq
    FROM v
    GROUP BY c_mktsegment
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic surface: negative balances nulled out, then
    count(*) vs count(col) (nulls excluded), explicit IS NULL counting,
    null-skipping sums, and null-safe equality (<=> / IS NOT DISTINCT
    FROM) — the semantics every aggregation at scale silently depends
    on."""
    (customer,) = _t(spark, sf_dir, "customer")
    val = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    v = customer.select("c_mktsegment", val.alias("val"))
    return v.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_nonnull"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0)).alias("n_null"),
        F.coalesce(F.sum(F.col("val").cast("decimal(18,2)")), F.lit(0))
        .cast("double")
        .alias("sum_val"),
        F.sum(F.when(F.col("val").eqNullSafe(F.lit(None)), 1).otherwise(0)).alias(
            "nullsafe_null_eq"
        ),
    )


@register(
    "q_window_time_range",
    oracle="""
    SELECT o_orderkey, o_custkey,
           count(*) OVER w AS n_last7d,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS spend_last7d
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey
        ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
    )
    """,
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: each order's trailing-7-day order count and
    spend for its customer.  The frame is value-based (epoch seconds), so
    ties share a frame and gaps shrink it — the rolling-window shape
    feature pipelines use for recency aggregates.  DECIMAL accumulation
    keeps the windowed sums order-independent within tied frames."""
    (orders,) = _t(spark, sf_dir, "orders")
    epoch = F.unix_timestamp("o_orderdate")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch.cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_last7d"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_last7d"),
    )


@register(
    "q_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 30000.0) AS INT) AS bucket,
           count(*) AS n,
           CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
           CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order values (30k buckets): one hash
    aggregation where the bucket id is pure arithmetic — the constant-
    memory distribution profile that drives salting/partitioning
    decisions at scale (min/max per bucket confirm the bucket edges)."""
    (orders,) = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 30000.0).cast("int")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(dec).cast("double").alias("lo"),
        F.max(dec).cast("double").alias("hi"),
    )


# one SQL text, two engines: the recursive-CTE and LATERAL queries are
# written in the dialect intersection so the ORACLE IS THE QUERY —
# the strongest possible differential check for these surfaces
_RECURSIVE_SQL = f"""
WITH RECURSIVE n(i) AS (
    SELECT 0
    UNION ALL
    SELECT i + 1 FROM n WHERE i < 79
),
spine AS (
    SELECT make_date(1995 + CAST((i - (i % 12)) / 12 AS INT), 1 + (i % 12), 1) AS month
    FROM n
),
rev AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           {dsum_sql('o_totalprice', 2)} AS revenue,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1
)
SELECT s.month, coalesce(r.revenue, 0.0) AS revenue,
       coalesce(r.n_orders, 0) AS n_orders
FROM spine s LEFT JOIN rev r ON s.month = r.month
"""


@register("q_recursive_cte", oracle=_RECURSIVE_SQL)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): an 80-month calendar
    spine generated by recursion, left-joined to monthly revenue so
    orderless months surface as zero rows — the gap-free time dimension
    every reporting stack needs.  The SAME SQL text runs on Spark and
    on DuckDB as its own oracle (dialect-intersection SQL, decimal
    money sum for engine exactness)."""
    load_tables(spark, sf_dir, ("orders",))  # view-registers orders
    return spark.sql(_RECURSIVE_SQL)


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.price
FROM customer c,
LATERAL (
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey NULLS FIRST
    LIMIT 2
) t
"""


@register("q_lateral_topk", oracle=_LATERAL_SQL)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY ... LIMIT: each
    customer's two most expensive orders — the top-k-per-entity shape
    written the SQL-standard way instead of a window.  Catalyst
    decorrelates the lateral into a ranked join (no per-customer
    re-execution); the identical SQL text is the DuckDB oracle."""
    # load_tables already view-registers every table it loads
    load_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_LATERAL_SQL)


@register(
    "q_dynamic_partition_overwrite",
    oracle=f"""
    WITH base AS (SELECT * FROM events WHERE event_id <= 2000),
    final AS (
      -- IS DISTINCT FROM (NULL sweep r11): NULL-type events live in the
      -- __HIVE_DEFAULT_PARTITION__, which the dynamic overwrite never
      -- touches — `<> 'click'` silently dropped them from the oracle
      SELECT event_type, value FROM base
      WHERE event_type IS DISTINCT FROM 'click'
      UNION ALL
      SELECT event_type, value * 2 AS value FROM base WHERE event_type = 'click'
    )
    SELECT event_type, count(*) AS n, round({dsum_sql('value', 2)}, 4) AS sum_value
    FROM final GROUP BY event_type
    """,
)
def q_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (Hive/Iceberg ``INSERT OVERWRITE``
    semantics, ``partitionOverwriteMode=dynamic`` as a WRITE option — no
    session-level conf mutation): events land partitioned by
    ``event_type``; a second write overwrites ONLY the partitions it
    touches ('click', values doubled) and every other partition survives
    untouched.  The read-back aggregate proves partition isolation.

    At scale this is the idempotent-backfill primitive: re-running a
    day/type slice replaces exactly that slice, no table-wide rewrite,
    no read-modify-write of unrelated partitions."""

    e = load_tables(spark, sf_dir, ("events",))["events"].where(
        F.col("event_id") <= 2000
    )
    base = _scratch("dpo-") + "/events"
    e.select("event_id", "value", "event_type").write.partitionBy(
        "event_type"
    ).mode("overwrite").parquet(base)
    (
        e.where(F.col("event_type") == "click")
        .select("event_id", (F.col("value") * 2).alias("value"), "event_type")
        .write.partitionBy("event_type")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(base)
    )
    back = spark.read.parquet(base)
    # DECIMAL accumulation: value (and the doubled click values) has <= 2
    # decimal places, so the sum is exact regardless of merge order.
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(dsum(F.col("value"), 2), 4).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# TPC-H completion: Q2 / Q11 / Q20 (partsupp derived from lineitem)
# ---------------------------------------------------------------------------
#
# The testdata has no partsupp table, so these three queries derive the
# supplier-part relation from lineitem: ps_supplycost := the minimum unit
# price (l_extendedprice / l_quantity) ever charged for that (part,
# supplier) pair.  IEEE double division and min() are order-independent
# and bit-identical across engines, so equality joins on the derived cost
# are hash-exact.

_PARTSUPP_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(l_extendedprice / l_quantity) AS ps_supplycost
    FROM lineitem GROUP BY 1, 2
"""


def _partsupp(lineitem: DataFrame) -> DataFrame:
    return lineitem.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL})
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
    FROM part, partsupp, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size = 15 AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_supplycost = (
          SELECT min(ps2.ps_supplycost)
          FROM partsupp ps2, supplier s2, nation n2, region r2
          WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
            AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE')
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: cheapest regional supplier per selected part.

    The correlated min-cost subquery is de-correlated into a per-part
    MIN over the region-restricted partsupp joined back as an equality
    join — one shuffle on ps_partkey for the aggregate, which the
    min-cost join reuses at scale (only the bounded nation/region
    projections carry hard broadcast hints; the supplier/part-cardinality
    sides rely on size-estimate/AQE broadcasts while small — review r9).
    Completes the 22-query TPC-H set together with q11/q20 below
    (reference has no query layer; SURVEY.md §2.2).
    """
    part, lineitem, supplier, nation, region = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "nation", "region"
    )
    eu_supp = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # eu_supp is SUPPLIER-cardinality (a region keeps a constant fifth,
    # not a bounded count) — no hard hint (review r9)
    regional = _partsupp(lineitem).join(
        eu_supp, F.col("ps_suppkey") == F.col("s_suppkey")
    )
    min_cost = regional.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    wanted = part.where((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    return (
        # wanted (part-filtered) and min_cost (per-part aggregate) are
        # PART-cardinality — no hard hints (review r9); the min_cost
        # join reuses the ps_partkey shuffle when it outgrows a broadcast
        regional.join(wanted, F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            min_cost,
            (F.col("mc_partkey") == F.col("ps_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost")
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH national AS (
        SELECT l_partkey AS ps_partkey,
               {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS part_value
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY 1
    )
    SELECT ps_partkey, part_value
    FROM national
    WHERE part_value > (SELECT 0.001 * CAST(sum(CAST(part_value AS DECIMAL(18,4)))
                                            AS DOUBLE) FROM national)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose national inventory value exceeds a fraction
    of the nation's total (value stand-in: national suppliers' net spend
    per part, since the derived ps_supplycost is an arbitrary double
    whose decimal cast rounds differently across engines — price and
    discount are 2-decimal, so their product is exact at scale 4).

    The HAVING-against-global-total becomes a 1-row broadcast cross
    join — the per-part aggregate shuffles once on l_partkey and the
    global total reduces from that same aggregate, so the fact table is
    read once.  DECIMAL accumulation keeps both sums engine-exact; the
    0.001 multiply happens in double on both sides identically.
    """
    lineitem, supplier, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    nat_supp = supplier.join(
        F.broadcast(nation.where(F.col("n_name") == "NATION_7")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    national = (
        # nat_supp is SUPPLIER-cardinality (one nation = a constant
        # 1/25th, not a bounded count) — no hard hint (review r9)
        lineitem.join(nat_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("part_value"))
    )
    # the global total ALSO accumulates in DECIMAL: part_value is an
    # exact 4-decimal double, but a plain double sum of those is
    # merge-order-dependent and a part at the cutoff's ulp window would
    # classify differently across engines
    threshold = national.agg(
        (
            F.lit(0.001)
            * F.sum(F.col("part_value").cast("decimal(18,4)")).cast("double")
        ).alias("cutoff")
    )
    return (
        national.join(F.broadcast(threshold))
        .where(F.col("part_value") > F.col("cutoff"))
        .select("ps_partkey", "part_value")
    )


@register(
    "q20_potential_promotion",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT recent.l_suppkey
        FROM (SELECT l_suppkey, l_partkey,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS recent_qty
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
              GROUP BY 1, 2) recent
        JOIN (SELECT l_suppkey, l_partkey,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
              FROM lineitem GROUP BY 1, 2) alltime
          ON recent.l_suppkey = alltime.l_suppkey
         AND recent.l_partkey = alltime.l_partkey
        WHERE recent.l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND recent.recent_qty > 0.3 * alltime.total_qty)
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers with surplus of promotable parts (availqty
    stand-in: a supplier qualifies when its 1996 shipments of a
    'small%'-named part exceed 30% of its all-time shipments of it).

    The nested IN subqueries become two LEFT SEMI joins: parts filter
    (broadcast) into the per-(supplier, part) aggregates, then the
    qualifying supplier set semi-joined into the nation-filtered
    supplier dimension.  Both quantity aggregates shuffle on the same
    (l_suppkey, l_partkey) key, so AQE plans them off one exchange.
    """
    supplier, nation, lineitem, part = _t(
        spark, sf_dir, "supplier", "nation", "lineitem", "part"
    )
    small_parts = part.where(F.col("p_name").like("small%")).select("p_partkey")
    keys = [F.col("l_suppkey"), F.col("l_partkey")]
    recent = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(*keys)
        .agg(dsum(F.col("l_quantity"), 2).alias("recent_qty"))
    )
    alltime = lineitem.groupBy(
        F.col("l_suppkey").alias("a_suppkey"), F.col("l_partkey").alias("a_partkey")
    ).agg(dsum(F.col("l_quantity"), 2).alias("total_qty"))
    qualifying = (
        # small_parts is PART-cardinality — no hard hint (review r9)
        recent.join(small_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            alltime,
            (F.col("l_suppkey") == F.col("a_suppkey"))
            & (F.col("l_partkey") == F.col("a_partkey")),
        )
        .where(F.col("recent_qty") > 0.3 * F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        # qualifying is SUPPLIER-cardinality — no hard hint (review r9)
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


# last q_bucketed_join generation per session (appId -> uuid tag): the
# next invocation drops this pair so unique-named scratch tables do not
# accumulate in the catalog (review r9)
_BJOIN_LAST: dict[str, str] = {}


@register(
    "q_bucketed_join",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_items,
           {dsum_sql('l_extendedprice', 2)} AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style bucketed tables + co-located join: both sides written
    ``bucketBy(8, key).sortBy(key)``, so the subsequent sort-merge join
    needs NO Exchange on either side (asserted in tests/test_plans.py) —
    bucket i of orders joins bucket i of lineitem where it sits.

    This is the amortize-the-shuffle move for 100 TB fact-fact joins:
    pay one bucketed write, then every downstream join/aggregation on the
    bucket key is exchange-free.  The merge hint forces SMJ so the plan
    exercises bucketing rather than broadcasting the (test-scale-small)
    orders side; the only exchange left is the final tiny groupBy.
    """

    import uuid

    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    base = _scratch("bucketed-")
    # UNIQUE catalog names per invocation (review r9): fixed bjoin_*
    # names were shared mutable state — a concurrent invocation's
    # overwrite could re-point the table between this call's write and
    # read, and a stale entry survived pointing at a cleaned scratch dir.
    # The PREVIOUS invocation's pair is dropped here (its DataFrame
    # consumers have long evaluated by the next call), bounding the
    # session's catalog growth to one live generation.
    tag = uuid.uuid4().hex[:12]
    prev = _BJOIN_LAST.pop(spark.sparkContext.applicationId, None)
    if prev is not None:
        for name in ("orders", "lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS bjoin_{name}_{prev}")
    _BJOIN_LAST[spark.sparkContext.applicationId] = tag
    # r14 (VERDICT r13 #3, guide §6 + §1.1 empirical loop): an adaptive
    # bucket count off defaultParallelism was TRIED and measured SLOWER
    # at this corpus — interleaved A/Bs (min-of-5): nb=8 1.11-1.50 s,
    # nb=32 1.77 s (2×32 tiny files cost more than 8-way write
    # parallelism saves at 600k rows), nb=4 1.46 s, nb=2 2.04 s.  The
    # constant 8 is the measured optimum at fixture scale; at
    # production the count is sized from table bytes / target file
    # size (§6: 128 MB - 1 GB per bucket file) — a data-volume rule no
    # core-count constant expresses, so wiring it to the session's
    # cores was the wrong adaptivity axis.  One file per bucket
    # (repartition count == bucket count), both tables share the count
    # so bucket i joins bucket i where it sits, read exchange-free
    # (plan-locked).
    n_buckets = 8
    sides = (
        ("orders", orders.select("o_orderkey", "o_orderpriority"), "o_orderkey"),
        ("lineitem", lineitem.select("l_orderkey", "l_extendedprice"), "l_orderkey"),
    )
    for name, df, key in sides:
        (
            df.repartition(n_buckets, F.col(key))  # one file per bucket
            .write.mode("overwrite")
            .option("path", f"{base}/{name}")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(f"bjoin_{name}_{tag}")
        )
    o = spark.table(f"bjoin_orders_{tag}")
    li = spark.table(f"bjoin_lineitem_{tag}")
    return (
        o.hint("merge")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice"), 2).alias("revenue"),
        )
    )


@register(
    "q_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS fk_edge,
           (SELECT count(*) FROM lineitem) AS n_rows,
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_partkey -> part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'lineitem.l_suppkey -> supplier',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM supplier s
                               WHERE s.s_suppkey = l.l_suppkey))
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = c.c_nationkey))
    """,
)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-QA referential-integrity report: orphan counts for every
    FK edge of the star schema in one result set — the check a warehouse
    load runs before publishing a snapshot.

    Each CHILD TABLE is one pass (r13 — was one pass per FK EDGE, which
    scanned lineitem three times, guide §1.2 "don't compute things you
    throw away"): every edge of a child attaches via its own broadcast
    LEFT join to the parent's DISTINCT key column in the same plan, one
    aggregate counts all of that child's orphan columns at once, and
    ``stack`` unpivots the single row back into the per-edge report
    rows (exact same rows as before — integer counts, no fanout since
    parents are distinct).  No collects, no subqueries, the whole
    report is one lazy UNION plan.  The distinct matters (review r8): a
    CORRUPT parent with duplicate keys would otherwise fan out child
    rows and inflate n_rows — on exactly the broken snapshot an
    integrity check exists to report on."""
    lineitem, orders, part, supplier, customer, nation = _t(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "customer", "nation"
    )

    def child_pass(child: DataFrame, edges: list[tuple[str, str, DataFrame, str]]):
        """One scan of *child* covering every (name, ck, parent, pk) edge."""
        joined = child.select(*[ck for _, ck, _, _ in edges])
        for _, ck, parent, pk in edges:
            joined = joined.join(
                # no hard hint (review r9): the parent key sets include
                # SF-scaling tables (orders/part/supplier/customer), so a
                # forced broadcast is a driver OOM at 100 TB; the planner
                # broadcasts the distinct key column while small
                parent.select(pk).distinct(),
                F.col(ck) == F.col(pk),
                "left",
            )
        one = joined.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(F.col(pk).isNull().cast("long")).alias(f"o_{i}")
                for i, (_, _, _, pk) in enumerate(edges)
            ],
        )
        stack_args = ", ".join(
            f"'{name}', n_rows, o_{i}" for i, (name, _, _, _) in enumerate(edges)
        )
        return one.selectExpr(
            f"stack({len(edges)}, {stack_args}) AS (fk_edge, n_rows, n_orphans)"
        )

    passes = [
        child_pass(
            lineitem,
            [
                ("lineitem.l_orderkey -> orders", "l_orderkey", orders, "o_orderkey"),
                ("lineitem.l_partkey -> part", "l_partkey", part, "p_partkey"),
                ("lineitem.l_suppkey -> supplier", "l_suppkey", supplier, "s_suppkey"),
            ],
        ),
        child_pass(
            orders, [("orders.o_custkey -> customer", "o_custkey", customer, "c_custkey")]
        ),
        child_pass(
            customer,
            [("customer.c_nationkey -> nation", "c_nationkey", nation, "n_nationkey")],
        ),
    ]
    out = passes[0]
    for e in passes[1:]:
        out = out.unionAll(e)
    return out


@register(
    "q_skew_salted_join",
    oracle=f"""
    SELECT d.lang,
           count(*) AS n_docs,
           {dsum_sql('w.weight', 4)} AS weighted_docs
    FROM documents d
    JOIN (SELECT 'en' AS lang, 1.00 AS weight UNION ALL
          SELECT 'de', 1.25 UNION ALL
          SELECT 'fr', 1.25 UNION ALL
          SELECT 'es', 1.50 UNION ALL
          SELECT 'zh', 2.00) w
      ON w.lang = d.lang
    GROUP BY d.lang
    """,
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted (replicated) join for HOT KEYS: documents join a per-lang
    weight table on ``lang`` — 5 distinct keys, so a plain shuffle join
    sends ALL rows of a language through one reducer slot.

    The salt pattern: replicate the SMALL side SALT times (explode), salt
    the BIG side with hash(doc_id) % SALT, join on (key, salt) — the hot
    key's rows now spread across SALT reducer slots.  Result identical
    to the plain join (each big-side row matches exactly its own salt
    replica), which is what the oracle computes.  This is the manual
    form of AQE's skew-join splitting, needed when skew is known ahead
    of time or AQE's per-partition thresholds don't trigger.

    (With a 5-row build side Spark would broadcast anyway — the point is
    the PLAN SHAPE, asserted shuffle-join-safe in tests: at 100 TB the
    "weights" side is a million-row model table and broadcast is off
    the table.)
    """
    SALT = 16
    (docs,) = _t(spark, sf_dir, "documents")
    weights = docs.sparkSession.createDataFrame(
        [("en", 1.00), ("de", 1.25), ("fr", 1.25), ("es", 1.50), ("zh", 2.00)],
        "lang string, weight double",
    )
    salted_small = weights.select(
        "lang", "weight", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1))).alias("salt")
    )
    salted_big = docs.select(
        F.col("lang").alias("d_lang"),
        F.pmod(F.xxhash64("doc_id"), F.lit(SALT)).cast("int").alias("salt"),
    )
    joined = salted_big.hint("shuffle_hash").join(
        salted_small,
        (F.col("d_lang") == F.col("lang")) & (salted_big["salt"] == salted_small["salt"]),
    )
    return joined.groupBy(F.col("d_lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        dsum(F.col("weight"), 4).alias("weighted_docs"),
    )


@register(
    "q_benford_digits",
    oracle="""
    WITH d AS (
        SELECT o_orderstatus,
               substr(CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR), 1, 1)
                   AS first_digit
        FROM orders
        WHERE o_totalprice > 0
    )
    SELECT o_orderstatus, first_digit,
           count(*) AS n,
           CAST(count(*) AS DOUBLE)
               / sum(count(*)) OVER (PARTITION BY o_orderstatus) AS share
    FROM d
    GROUP BY o_orderstatus, first_digit
    """,
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screening of order amounts per status — the
    classic anomaly/fraud QA scan a finance pipeline runs on new feeds
    (fabricated amounts skew the leading-digit distribution).

    The first digit comes from the DECIMAL(15,2) string rendering —
    fixed-point formatting is identical across engines, unlike float
    repr or log10-based digit math (log10 is not IEEE-exact).  One
    aggregation + one partition-total window; integer counts and a
    single exact division."""
    (orders,) = _t(spark, sf_dir, "orders")

    d = orders.where(F.col("o_totalprice") > 0).select(
        "o_orderstatus",
        F.substring(F.col("o_totalprice").cast("decimal(15,2)").cast("string"), 1, 1)
            .alias("first_digit"),
    )
    counts = d.groupBy("o_orderstatus", "first_digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus")
    return counts.select(
        "o_orderstatus",
        "first_digit",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w)).alias("share"),
    )


@register(
    "q_group_concat_topk",
    oracle="""
    WITH ranked AS (
        -- c_name NULLS FIRST (NULL sweep r11, seed-17 pass): on an
        -- acctbal TIE a NULL-name customer takes the rank-3 slot in
        -- Spark (ASC default NULLS FIRST) but lost it in DuckDB
        -- (NULLS LAST) — same balance sum, different serialized names
        SELECT n_name, c_name, c_acctbal,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY c_acctbal DESC,
                                           c_name NULLS FIRST) AS rk
        FROM customer JOIN nation ON n_nationkey = c_nationkey
    )
    SELECT n_name,
           -- coalesce (r11 wave 4): an all-NULL top-3 name list
           -- serializes to NULL in DuckDB but '' via Spark's
           -- array_join (the q_array_agg hole, here too)
           coalesce(array_to_string(list(c_name ORDER BY rk), '|'), '')
               AS top3_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS top3_balance
    FROM ranked WHERE rk <= 3
    GROUP BY n_name
    """,
)
def q_group_concat_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k-per-group serialized as a report column: the 3 richest
    customers per nation as an ordered delimited string plus their
    combined balance — the leaderboard-cell shape BI exports want.

    The rank filter compiles to WindowGroupLimit (running top-3 per
    reducer, plan-asserted class), the ordered list is rebuilt
    deterministically from (rank, name) structs via array_sort —
    collect_list alone is order-nondeterministic under parallel merge —
    and the balance accumulates in DECIMAL."""
    customer, nation = _t(spark, sf_dir, "customer", "nation")

    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_name"))
    ranked = (
        customer.join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
    )
    return ranked.groupBy("n_name").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rk", "c_name"))),
                lambda s: s["c_name"],
            ),
            "|",
        ).alias("top3_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("top3_balance"),
    )


@register(
    "q_revenue_mom_change",
    oracle=f"""
    -- NO window in this oracle (NULL sweep r11): DuckDB 1.0's window
    -- sort over a GROUP BY output whose INPUT rows carry NULL group-key
    -- sources misplaces one peer group NONDETERMINISTICALLY — measured
    -- run-to-run flips with NULLS FIRST, NULLS LAST, threads=1, and
    -- even a coalesce-to-sentinel non-null key.  The lag is therefore
    -- spelled as a predecessor join (max month strictly below mine)
    -- over the ~|months|-row aggregate — window-free, deterministic.
    -- The sentinel keeps b.mkey < a.mkey well-defined for the NULL
    -- month and orders it first, matching Spark's NULLS FIRST default.
    WITH monthly AS (
        -- CASE, not coalesce: DuckDB 1.0 wrongly NULL-propagates
        -- coalesce(CAST(date_trunc(x) AS DATE), <const>) over table
        -- columns (constant inputs fold correctly; the columnar path
        -- returns NULL) — measured in this repo's NULL sweep r11
        SELECT CASE WHEN o_orderdate IS NULL THEN DATE '0001-01-01'
                    ELSE CAST(date_trunc('month', o_orderdate) AS DATE)
               END AS mkey,
               {dsum_sql('o_totalprice', 2)} AS revenue
        FROM orders
        GROUP BY 1
    ),
    prevs AS (
        SELECT a.mkey, max(b.mkey) AS pkey
        FROM monthly a LEFT JOIN monthly b ON b.mkey < a.mkey
        GROUP BY a.mkey
    )
    SELECT nullif(a.mkey, DATE '0001-01-01') AS month, a.revenue,
           p.revenue AS prev_revenue,
           a.revenue - p.revenue AS abs_change,
           round((a.revenue - p.revenue) / p.revenue, 6) AS rel_change
    FROM monthly a
    JOIN prevs pr ON pr.mkey = a.mkey
    LEFT JOIN monthly p ON p.mkey = pr.pkey
    """,
)
def q_revenue_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue deltas — the KPI-trend query every BI
    layer runs.  Aggregation first (months are few), THEN the unbounded
    lag window over the tiny monthly table: the unpartitioned window is
    fine precisely because it sees |months| rows, not the fact table —
    the inverse of q_curriculum_order's problem.  DECIMAL-accumulated
    revenue; the relative change is one exact division rounded at the
    output boundary."""
    (orders,) = _t(spark, sf_dir, "orders")

    monthly = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(dsum(F.col("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        (F.col("revenue") - prev).alias("abs_change"),
        F.round((F.col("revenue") - prev) / prev, 6).alias("rel_change"),
    )


@register(
    "q_dim_denormalize",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment,
           n_name AS nation, r_name AS region,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    """,
)
def q_dim_denormalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake → star denormalization: flatten the
    customer→nation→region chain into one conformed dimension — the ETL
    step that trades a little storage for removing two joins from every
    downstream query.  Both lookup sides broadcast (nation/region are
    tiny at any scale); acctbal is normalized through
    DECIMAL(18,2) (then emitted as double — pandas renders Decimal and
    float differently) so the flattened dim is exact for later
    aggregation."""
    customer, nation, region = _t(spark, sf_dir, "customer", "nation", "region")
    return (
        customer.join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.col("c_acctbal").cast("decimal(18,2)").cast("double").alias("acctbal"),
        )
    )


@register(
    "q_weekday_seasonality",
    oracle=f"""
    SELECT CAST(isodow(o_orderdate) AS INT) AS iso_weekday,
           count(*) AS n_orders,
           {dsum_sql('o_totalprice', 2)} AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def q_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order/revenue seasonality by ISO weekday (1=Monday..7=Sunday) —
    the weekly-pattern profile capacity planning reads.

    Calendar-function portability is the trap here: Spark's dayofweek is
    1=Sunday while DuckDB's isodow is 1=Monday, so both engines are
    normalized onto the ISO numbering explicitly.  One aggregation,
    DECIMAL revenue."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy(iso_weekday("o_orderdate").alias("iso_weekday")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "q_customer_rfm",
    oracle=f"""
    WITH per_cust AS (
        -- o_custkey IS NOT NULL (r11 wave 4, entity rule) — and it
        -- keeps NULL group-key source rows away from the windows
        -- below, the DuckDB 1.0 window-over-GROUP-BY trigger
        SELECT o_custkey AS custkey,
               max(o_orderdate) AS last_order,
               count(*) AS frequency,
               {dsum_sql('o_totalprice', 2)} AS monetary
        FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
    ),
    binned AS (
        -- NULLS FIRST = Spark's ASC default (r11 wave 4): a customer
        -- whose every date/price is NULL otherwise bins 5 in DuckDB
        -- and 1 in Spark; probed deterministic 25x with non-null
        -- group keys
        SELECT custkey,
               ntile(5) OVER (ORDER BY last_order NULLS FIRST, custkey)
                   AS r_bin,
               ntile(5) OVER (ORDER BY frequency, custkey) AS f_bin,
               ntile(5) OVER (ORDER BY monetary NULLS FIRST, custkey)
                   AS m_bin,
               monetary
        FROM per_cust
    )
    SELECT r_bin, f_bin, m_bin,
           count(*) AS n_customers,
           {dsum_sql('monetary', 2)} AS segment_value
    FROM binned
    GROUP BY r_bin, f_bin, m_bin
    """,
)
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quintile bins of recency / frequency / monetary
    per customer, rolled up to segment sizes and value — the marketing
    segmentation every warehouse ships.

    Pattern notes: the fact table aggregates FIRST (one shuffle), the
    three ntile windows run over the small per-customer table, and every
    window order carries custkey as the tie-break — ntile over a
    non-total order is nondeterministic under parallel merge, the
    classic silent-flakiness bug in segmentation jobs.  Monetary
    accumulates in DECIMAL twice (per customer, then per segment)."""
    (orders,) = _t(spark, sf_dir, "orders")

    # entity rule (r11 wave 4 — see the oracle comment)
    per_cust = (
        orders.where(F.col("o_custkey").isNotNull())
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            dsum(F.col("o_totalprice"), 2).alias("monetary"),
        )
    )
    binned = per_cust.select(
        "custkey",
        "monetary",
        F.ntile(5).over(Window.orderBy("last_order", "custkey")).alias("r_bin"),
        F.ntile(5).over(Window.orderBy("frequency", "custkey")).alias("f_bin"),
        F.ntile(5).over(Window.orderBy("monetary", "custkey")).alias("m_bin"),
    )
    return binned.groupBy("r_bin", "f_bin", "m_bin").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum(F.col("monetary"), 2).alias("segment_value"),
    )


@register(
    "q_abc_pareto",
    oracle=f"""
    WITH per_part AS (
        SELECT l_partkey AS partkey,
               {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT partkey, revenue,
               CAST(sum(CAST(revenue AS DECIMAL(18,4))) OVER () AS DOUBLE)
                   AS total_rev,
               CAST(sum(CAST(revenue AS DECIMAL(18,4)))
                        OVER (ORDER BY revenue DESC, partkey
                              ROWS UNBOUNDED PRECEDING) AS DOUBLE) - revenue
                   AS cum_before
        FROM per_part
    )
    SELECT CASE WHEN cum_before < 0.8  * total_rev THEN 'A'
                WHEN cum_before < 0.95 * total_rev THEN 'B'
                ELSE 'C' END AS abc_class,
           count(*) AS n_parts,
           {dsum_sql('revenue', 4)} AS class_revenue
    FROM ranked
    GROUP BY 1
    """,
)
def q_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue contribution
    (A: first 80% of revenue, B: next 15%, C: tail) — the inventory-
    analytics classic.

    Same exclusive-cumsum boundary rule as q_top_p_per_source so exactly
    the boundary part crosses each threshold; revenue is DECIMAL-exact
    at every level, and the 0.8/0.95 products are single exact double
    multiplies, so the class assignment cannot flip between engines.
    The unpartitioned windows run over the per-part aggregate, not the
    fact table."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = lineitem.groupBy(F.col("l_partkey").alias("partkey")).agg(
        dsum(rev, 4).alias("revenue")
    )
    w_tot = Window.partitionBy()
    w_run = Window.orderBy(F.desc("revenue"), F.asc("partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = per_part.select(
        "partkey",
        "revenue",
        # DECIMAL window accumulation: engines disagree on float summation
        # order inside window frames (incremental vs segment-tree)
        F.sum(F.col("revenue").cast("decimal(18,4)")).over(w_tot)
        .cast("double").alias("total_rev"),
        (
            F.sum(F.col("revenue").cast("decimal(18,4)")).over(w_run).cast("double")
            - F.col("revenue")
        ).alias("cum_before"),
    )
    cls = (
        F.when(F.col("cum_before") < 0.8 * F.col("total_rev"), "A")
        .when(F.col("cum_before") < 0.95 * F.col("total_rev"), "B")
        .otherwise("C")
    )
    return ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        dsum(F.col("revenue"), 4).alias("class_revenue"),
    )


@register(
    "q_supplier_hhi",
    oracle="""
    WITH per_supp AS (
        SELECT s_nationkey,
               l_suppkey,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS rev
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        GROUP BY s_nationkey, l_suppkey
    )
    SELECT s_nationkey AS nationkey,
           count(*) AS n_suppliers,
           round(CAST(sum(CAST(rev AS DECIMAL(28,4)) * rev) AS DOUBLE)
                 / (CAST(sum(rev) AS DOUBLE) * CAST(sum(rev) AS DOUBLE)),
                 10) AS hhi
    FROM per_supp
    GROUP BY s_nationkey
    """,
)
def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration screening: the Herfindahl-Hirschman index of
    supplier revenue shares per nation (1/n = perfectly even, 1.0 =
    monopoly) — the concentration metric a supply-chain risk report
    tracks.

    Exactness: HHI = Σrev² / (Σrev)², with rev, rev², and both sums all
    accumulated in DECIMAL — squaring shares as doubles then summing
    would reintroduce partition-order float drift.  Only the final
    division is floating point, rounded to 10 dp at the output boundary —
    the engines' DECIMAL(38,8)->double conversions of the huge Σrev² can
    differ by one ulp.  Two
    aggregations, both map-side combinable."""
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    per_supp = (
        # supplier SCALES with SF — no hard hint (review r9)
        lineitem.join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(rev).cast("decimal(18,4)").alias("rev"))
    )
    return per_supp.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(
            F.sum(F.col("rev") * F.col("rev")).cast("double")
            / (F.sum("rev").cast("double") * F.sum("rev").cast("double")),
            10,
        ).alias("hhi"),
    )


@register(
    "q_ship_latency",
    oracle="""
    WITH j AS (
        SELECT o_orderpriority,
               date_diff('day', o_orderdate, l_shipdate) AS lat_days
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipdate >= o_orderdate
    )
    SELECT o_orderpriority,
           count(*) AS n_lines,
           CAST(sum(lat_days) AS BIGINT) AS total_days,
           quantile_cont(lat_days, 0.5) AS median_days,
           CAST(max(lat_days) AS BIGINT) AS max_days
    FROM j
    GROUP BY o_orderpriority
    """,
)
def q_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-latency SLA report: order-to-ship days per priority
    (count / total / exact median / max) — the operations dashboard
    behind every "are URGENT orders actually faster" question.

    Integer day diffs keep the sum exact; the median is the exact
    interpolated percentile (identical in both engines); the fact-fact
    join shuffles once and the aggregate combines map-side."""
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    j = (
        lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "o_orderpriority",
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long").alias("lat_days"),
        )
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("lat_days").alias("total_days"),
        F.percentile("lat_days", 0.5).alias("median_days"),
        F.max("lat_days").alias("max_days"),
    )


@register(
    "q_market_basket_pairs",
    oracle="""
    WITH pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, count(*) AS support
    FROM pairs
    GROUP BY part_a, part_b
    HAVING count(*) >= 2
    """,
)
def q_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-purchase mining: part pairs appearing together in
    at least two orders — the support table association rules start
    from.

    The pair join is EQUI-KEYED on l_orderkey with the a<b triangle
    predicate as residual, so the blowup is Σ k²/2 over per-order line
    counts (k≈4 here) — bounded per basket, never |lineitem|².  At
    100 TB the same plan holds because baskets stay small; a hot
    mega-basket would get the salting treatment of q_skew_salted_join."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    a = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = lineitem.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
    )


@register(
    "q_repeat_purchase_interval",
    oracle="""
    WITH seq AS (
        SELECT o_custkey,
               date_diff('day',
                         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap_days
        FROM orders
    )
    SELECT count(*) AS n_intervals,
           CAST(sum(gap_days) AS BIGINT) AS total_gap_days,
           quantile_cont(gap_days, 0.5) AS median_gap_days,
           CAST(min(gap_days) AS BIGINT) AS min_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days
    FROM seq WHERE gap_days IS NOT NULL
    """,
)
def q_repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: the distribution of day gaps between a
    customer's consecutive orders — the behavioral input to churn and
    replenishment models.

    One hash exchange on customer for the lag window; integer day gaps
    make the sum exact and the median is the exact interpolated
    percentile.  The final global summary is a 1-row aggregate over the
    per-interval rows."""
    (orders,) = _t(spark, sf_dir, "orders")

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long").alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    return seq.agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("gap_days").alias("total_gap_days"),
        F.percentile("gap_days", 0.5).alias("median_gap_days"),
        F.min("gap_days").alias("min_gap_days"),
        F.max("gap_days").alias("max_gap_days"),
    )


@register(
    "q_discount_quantity_corr",
    oracle="""
    WITH m AS (
        SELECT p_brand,
               CAST(l_discount AS DECIMAL(18,2)) AS x,
               CAST(l_quantity AS DECIMAL(18,2)) AS y
        FROM lineitem JOIN part ON p_partkey = l_partkey
    ),
    s AS (
        SELECT p_brand,
               count(*) AS n,
               CAST(sum(x) AS DECIMAL(38,2))     AS sx,
               CAST(sum(y) AS DECIMAL(38,2))     AS sy,
               CAST(sum(x * y) AS DECIMAL(38,4)) AS sxy,
               CAST(sum(x * x) AS DECIMAL(38,4)) AS sxx,
               CAST(sum(y * y) AS DECIMAL(38,4)) AS syy
        FROM m GROUP BY p_brand
    )
    SELECT p_brand, n,
           round(
               (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
               8) AS corr_discount_qty
    FROM s
    """,
)
def q_discount_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of discount vs quantity per brand — the
    price-sensitivity probe, computed like q_ols_per_source from
    DECIMAL-exact sufficient statistics instead of the built-in corr()
    (whose float accumulation is partition-order-dependent and NOT
    reproducible across engines or runs).

    Both inputs are fixed-point (2-dp), so Σx, Σy, Σxy, Σx², Σy² are all
    exact; the closed-form correlation is then IEEE-exact arithmetic
    over identical operands, rounded at the output boundary only to
    absorb wide-decimal→double conversion ulps."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    x = F.col("l_discount").cast("decimal(18,2)")
    y = F.col("l_quantity").cast("decimal(18,2)")
    s = (
        # part SCALES with SF — no hard hint (review r9)
        lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .select("p_brand", x.alias("x"), y.alias("y"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    return s.select(
        "p_brand",
        "n",
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            8,
        ).alias("corr_discount_qty"),
    )


@register(
    "q_basket_size_distribution",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey, count(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT n_lines AS basket_size,
           count(*) AS n_orders,
           CAST(count(*) AS DOUBLE)
               / sum(count(*)) OVER () AS share
    FROM per_order
    GROUP BY n_lines
    """,
)
def q_basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size histogram: how many orders have k line items, with
    global shares — the order-mix profile pricing and fulfillment teams
    read, and the k² input to q_market_basket_pairs' cost model.

    Two aggregations (order grain, then size grain) plus one global-
    total window over the tiny histogram; integer counts, one exact
    division."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")

    per_order = lineitem.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    hist = per_order.groupBy(F.col("n_lines").alias("basket_size")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w = Window.partitionBy()
    return hist.select(
        "basket_size",
        "n_orders",
        (F.col("n_orders").cast("double") / F.sum("n_orders").over(w)).alias("share"),
    )


@register(
    "q_customer_order_gini",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey, count(*) AS n_orders
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT n_orders,
               -- NULLS FIRST = Spark's ASC default (r12 keys-sweep
               -- audit): the NULL-custkey group ties a real customer
               -- on n_orders only rarely, but when it does the rank i
               -- (and the Gini weight) would shift between engines
               row_number() OVER (ORDER BY n_orders,
                                  o_custkey NULLS FIRST) AS i,
               count(*) OVER ()            AS n,
               sum(n_orders) OVER ()       AS total
        FROM per_cust
    )
    SELECT CAST(max(n) AS BIGINT) AS n_customers,
           CAST(max(total) AS BIGINT) AS n_orders,
           CAST(sum((2 * i - n - 1) * n_orders) AS DOUBLE)
               / (max(n) * max(total)) AS gini
    FROM ranked
    """,
)
def q_customer_order_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality of customer activity: the Gini coefficient of orders
    per customer (0 = everyone orders equally, →1 = a few whales) — the
    concentration number a marketplace health report leads with.

    Computed with the rank formula Σ(2i−n−1)xᵢ / (n·Σx) over the SMALL
    per-customer aggregate: the numerator is a pure INTEGER sum (no
    float accumulation anywhere), the one division is exact, and the
    rank order is total (count, custkey).  The unpartitioned windows see
    |customers| rows, not orders — same aggregate-first discipline as
    q_revenue_mom_change."""
    (orders,) = _t(spark, sf_dir, "orders")

    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    w_rank = Window.orderBy("n_orders", "o_custkey")
    w_all = Window.partitionBy()
    ranked = per_cust.select(
        "n_orders",
        F.row_number().over(w_rank).alias("i"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("n_orders").over(w_all).alias("total"),
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_customers"),
        F.max("total").cast("long").alias("n_orders"),
        (
            F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("n_orders")).cast("double")
            / (F.max("n") * F.max("total"))
        ).alias("gini"),
    )


@register(
    "q_cumulative_order_volume",
    oracle=f"""
    -- NO window in this oracle (NULL sweep r11): the running totals
    -- are an inequality self-join over the ~|months|-row aggregate —
    -- DuckDB 1.0's window-over-GROUP-BY is nondeterministic when the
    -- aggregate input carries NULL group-key sources (see
    -- q_revenue_mom_change for the measured failure).  Sentinel-first
    -- == Spark's NULLS FIRST default order.
    WITH monthly AS (
        -- CASE, not coalesce: DuckDB 1.0 wrongly NULL-propagates
        -- coalesce(CAST(date_trunc(x) AS DATE), <const>) over table
        -- columns (constant inputs fold correctly; the columnar path
        -- returns NULL) — measured in this repo's NULL sweep r11
        SELECT CASE WHEN o_orderdate IS NULL THEN DATE '0001-01-01'
                    ELSE CAST(date_trunc('month', o_orderdate) AS DATE)
               END AS mkey,
               count(*) AS n_orders,
               {dsum_sql('o_totalprice', 2)} AS revenue
        FROM orders GROUP BY 1
    )
    SELECT nullif(a.mkey, DATE '0001-01-01') AS month, a.n_orders,
           CAST(sum(b.n_orders) AS BIGINT) AS cum_orders,
           CAST(sum(CAST(b.revenue AS DECIMAL(18,2))) AS DOUBLE) AS cum_revenue
    FROM monthly a JOIN monthly b ON b.mkey <= a.mkey
    GROUP BY a.mkey, a.n_orders
    """,
)
def q_cumulative_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running business volume: cumulative orders and revenue by month —
    the growth curve behind every "orders to date" chart.

    Aggregate-first (fact table collapses to |months| rows in one
    shuffle), then integer and DECIMAL running windows over the tiny
    monthly table — the cumulative revenue re-enters DECIMAL inside the
    frame because engines disagree on float summation order in window
    frames."""
    (orders,) = _t(spark, sf_dir, "orders")

    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), 2).alias("revenue"),
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return monthly.select(
        "month",
        "n_orders",
        F.sum("n_orders").over(w).cast("long").alias("cum_orders"),
        F.sum(F.col("revenue").cast("decimal(18,2)")).over(w).cast("double")
        .alias("cum_revenue"),
    )


@register(
    "q_segment_mix_by_region",
    oracle="""
    SELECT r_name AS region, c_mktsegment,
           count(*) AS n_customers,
           CAST(count(*) AS DOUBLE)
               / sum(count(*)) OVER (PARTITION BY r_name) AS segment_share
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY r_name, c_mktsegment
    """,
)
def q_segment_mix_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer market-segment mix per region with within-region shares —
    the composition cross-tab a territory review opens with.  Broadcast
    snowflake joins, one aggregation, one per-region total window,
    integer counts and an exact division."""
    customer, nation, region = _t(spark, sf_dir, "customer", "nation", "region")

    counts = (
        customer.join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(F.col("r_name").alias("region"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    w = Window.partitionBy("region")
    return counts.select(
        "region",
        "c_mktsegment",
        "n_customers",
        (F.col("n_customers").cast("double") / F.sum("n_customers").over(w))
        .alias("segment_share"),
    )


@register(
    "q_price_by_size_band",
    oracle=f"""
    SELECT CAST(p_size // 10 AS INT) AS size_band,
           count(*) AS n_parts,
           {dsum_sql('p_retailprice', 2)} AS total_price,
           round({dsum_sql('p_retailprice', 2)} / count(*), 6) AS avg_price
    FROM part
    GROUP BY 1
    """,
)
def q_price_by_size_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average retail price by part-size decade band — a pricing-curve
    summary whose mean is DECIMAL-sum / integer-count (a bare avg() of
    doubles is partition-order-dependent), rounded once at the output
    boundary."""
    (part,) = _t(spark, sf_dir, "part")
    band = F.floor(F.col("p_size") / 10).cast("int")
    total = dsum(F.col("p_retailprice"), 2)
    return part.groupBy(band.alias("size_band")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        total.alias("total_price"),
        F.round(total / F.count(F.lit(1)), 6).alias("avg_price"),
    )
