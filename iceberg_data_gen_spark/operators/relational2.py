"""Second wave of relational coverage: subqueries (correlated scalar,
EXISTS, IN), pivot/unpivot, GROUPING SETS, exact percentiles, array/map
construction, extended string/date scalar functions, and more TPC-H
shapes (Q4/Q7/Q12/Q14/Q18/Q19 adapted to the driver schema).

Same design rules as relational.py: declarative DataFrame/SQL only,
broadcast hints ONLY on sides bounded by design (nation/region
projections, 1-row aggregates — review r9: customer/supplier/part scale
with SF and rely on size-estimate/AQE broadcasts), aliases matched 1:1
with the oracle, floats rounded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_data_gen_spark.operators import register
from iceberg_data_gen_spark.operators.common import iso_weekday
from iceberg_data_gen_spark.operators.common import tables as _t
from iceberg_data_gen_spark.operators.relational import R2, dsum, dsum_sql
from iceberg_data_gen_spark.session import load_tables


# ---------------------------------------------------------------------------
# TPC-H shapes
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → LEFT SEMI join with a
    non-equi residual (late-shipped orders per priority)."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    semi = o.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           EXTRACT(year FROM l.l_shipdate) AS l_year,
           -- price×(1-discount) is an exact 4-decimal value, so DECIMAL(18,4)
           -- accumulation is lossless and order-independent; no final round
           -- (engines disagree on .005 ties: HALF_UP vs half-even)
           {dsum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM supplier s, lineitem l, orders o, customer c, nation sn, nation cn
    WHERE s.s_suppkey = l.l_suppkey
      AND o.o_orderkey = l.l_orderkey
      AND c.c_custkey = o.o_custkey
      AND s.s_nationkey = sn.n_nationkey
      AND c.c_nationkey = cn.n_nationkey
      AND sn.n_name < cn.n_name
    GROUP BY sn.n_name, cn.n_name, EXTRACT(year FROM l.l_shipdate)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between nation pairs by year."""
    supplier, lineitem, orders, customer, nation = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        # supplier/customer SCALE with SF — no hard hints (review r9,
        # the q3/q5/q10 rule applied to this file): size-estimate/AQE
        # broadcasts them while small; the nation projections sn/cn are
        # bounded (≤25 rows), their hints are design invariants
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(
            F.broadcast(cn),
            (F.col("c_nationkey") == F.col("cn_key"))
            & (F.col("supp_nation") < F.col("cust_nation")),
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


@register(
    "q12_line_status_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
               AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
               AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_line_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counting after a fact-fact join."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT round(100.00 * {dsum_sql(
        "CASE WHEN p_type LIKE 'PROMO%' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
                 / {dsum_sql("l_extendedprice * (1 - l_discount)")},
                 4) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotional revenue share (the planner broadcasts part
    into lineitem while it is small; no hard hint — part scales with SF)."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        # part SCALES with SF — no hard hint (review r9); the planner
        # broadcasts it from its own size estimate while small
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        # DECIMAL accumulation (dsum) on both sums: plain double sums are
        # merge-order-dependent and can flip the 4dp rounding at a
        # boundary between engines
        .agg(F.round(100.0 * dsum(promo) / dsum(rev), 4).alias("promo_revenue"))
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           sum(l_quantity) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN-subquery on an aggregate → semi join against the
    aggregated keys (one extra shuffle over lineitem, no row explosion)."""
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big_orders = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        orders.join(
            big_orders.withColumnRenamed("l_orderkey", "bo_key"),
            F.col("o_orderkey") == F.col("bo_key"),
            "left_semi",
        )
        # customer SCALES with SF — no hard hint (review r9)
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            R2(F.col("o_totalprice")).alias("o_totalprice"),
            "total_qty",
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT round({dsum_sql("l_extendedprice * (1 - l_discount)")}, 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 30)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 40)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 50))
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join residual (tests that the common
    p_partkey = l_partkey conjunct still drives a hash join while the
    disjunction stays a residual filter)."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")

    def band(brand, s_lo, s_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & (F.col("l_quantity") >= q_lo)
            & (F.col("l_quantity") <= q_hi)
        )

    cond = band("Brand#1", 1, 15, 1, 30) | band("Brand#2", 10, 30, 10, 40) | band(
        "Brand#3", 20, 50, 20, 50
    )
    return (
        # part SCALES with SF — no hard hint (review r9)
        lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.round(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Subquery forms (correlated scalar / scalar / IN) — via Spark SQL views
# ---------------------------------------------------------------------------

# ONE SQL text per identical-on-both-engines query (r11 wave 4): these
# four queries pasted the same ~10-line string into the oracle kwarg AND
# the spark.sql body — the relational3 _RECURSIVE_SQL/_LATERAL_SQL
# shared-constant pattern exists precisely so an edit cannot
# desynchronize the pair.

_SCALAR_SUBQ_SQL = f"""
    SELECT p_partkey, p_name, round(p_retailprice, 2) AS p_retailprice
    FROM part
    WHERE p_retailprice > (SELECT {dsum_sql("p_retailprice")} / count(*)
                           FROM part) * 1.5
    """

_CORRELATED_SUBQ_SQL = """
    SELECT c_custkey, c_name,
           (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
           round(CAST((SELECT coalesce(sum(CAST(o_totalprice AS DECIMAL(18,4))), 0)
                       FROM orders o WHERE o.o_custkey = c.c_custkey) AS DOUBLE), 2)
               AS spend
    FROM customer c
    """

_IN_SUBQ_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (
        SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA', 'EUROPE')
    )
    """


@register("q_scalar_subquery", oracle=_SCALAR_SUBQ_SQL)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (broadcast single-value join).

    The threshold accumulates in DECIMAL (dsum playbook, review r8): a
    raw double avg() merges partials in partition order, so the two
    engines could land on thresholds differing in the last ulp and flip
    MEMBERSHIP of parts sitting within an ulp of avg*1.5 — a rowcount
    mismatch, not just a value drift.  The exact sum → one double
    division is bit-identical on both sides."""
    load_tables(spark, sf_dir, ("part",))
    return spark.sql(_SCALAR_SUBQ_SQL)


@register("q_correlated_scalar_subquery", oracle=_CORRELATED_SUBQ_SQL)
def q_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries — Catalyst de-correlates both into
    ONE left outer aggregate join (inspect: no per-row subquery plans).

    ``spend`` accumulates in DECIMAL before the round (dsum playbook,
    review r8): round(sum(double), 2) at a .005 boundary flips between
    engines with partial-merge order; the exact sum makes the rounded
    cents identical."""
    load_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_CORRELATED_SUBQ_SQL)


@register("q_in_subquery", oracle=_IN_SUBQ_SQL)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery → left semi join."""
    load_tables(spark, sf_dir, ("supplier", "nation", "region"))
    return spark.sql(_IN_SUBQ_SQL)


# ---------------------------------------------------------------------------
# Pivot / unpivot / grouping sets / percentiles
# ---------------------------------------------------------------------------


@register(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS F,
           round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on linestatus (explicit value list → deterministic columns)."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    p = (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )
    return p.select(
        "l_returnflag",
        R2(F.coalesce(F.col("F"), F.lit(0.0))).alias("F"),
        R2(F.coalesce(F.col("O"), F.lit(0.0))).alias("O"),
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice' AS metric, round(p_retailprice, 2) AS value FROM part
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack() — wide → long without a shuffle."""
    (part,) = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.expr(
            "stack(2, 'size', CAST(p_size AS DOUBLE), "
            "'retailprice', round(p_retailprice, 2)) AS (metric, value)"
        ),
    )


_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """


@register("q_grouping_sets", oracle=_GROUPING_SETS_SQL)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() indicators."""
    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "q_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (sort-based aggregate; both engines
    use linear interpolation so values agree)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95"),
    )


@register(
    "q_approx_stats",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS approx_orders_ok,
           TRUE AS approx_median_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches (HLL distinct, approx percentile) — the
    constant-memory scale path for cardinality/quantile estimation.

    Raw sketch outputs are engine-specific (DuckDB's HLL ≠ Spark's) and
    ``percentile_approx`` is even partition-layout-dependent (measured:
    the same data repartitioned 200-way shifts the estimate), so the raw
    values can never hash-match an oracle.  Instead the query emits
    ε-BOUND WITNESSES (VERDICT r7 #1): booleans asserting each sketch
    landed inside an error band computed from Spark's own exact
    aggregates, which the oracle pins to literal TRUE — a sketch drifting
    out of band flips the boolean and fails the driver's hash gate.

    Bands (measured at sf0.001/sf0.01, ``l_returnflag`` groups):
    * HLL default rsd=0.05, observed error ≤ 8.7%, band 15% (3σ);
      approx_count_distinct is merge-order-independent (register max),
      so the value is a pure function of the data — verified identical
      under repartition(200).
    * percentile_approx accuracy=10000 guarantees rank error ≤ 1e-4·n
      even across merges; band = exact p45..p55 (rank ±0.05), observed
      margin ~500× the guarantee.
    """
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    agg = lineitem.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey").alias("__approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("__approx_med"),
        F.percentile(F.col("l_extendedprice"), F.lit(0.45)).alias("__p45"),
        F.percentile(F.col("l_extendedprice"), F.lit(0.55)).alias("__p55"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("__approx_orders") - F.col("exact_orders"))
            <= 0.15 * F.col("exact_orders")
        ).alias("approx_orders_ok"),
        (
            (F.col("__approx_med") >= F.col("__p45"))
            & (F.col("__approx_med") <= F.col("__p55"))
        ).alias("approx_median_ok"),
    )


# ---------------------------------------------------------------------------
# Array / map construction + extended scalar functions
# ---------------------------------------------------------------------------


@register(
    "q_array_agg",
    oracle="""
    -- FILTER drops NULL names (NULL sweep r11): Spark's collect_list
    -- never collects NULLs, but DuckDB's list() keeps them — the
    -- serialized string matched (array_to_string skips NULLs) while
    -- len() counted one extra per NULL c_name.  coalesce closes the
    -- one-deeper hole (r11 review): a group whose EVERY name is NULL
    -- makes the filtered list() NULL, while Spark's collect_list is an
    -- empty array ('' / 0).
    SELECT n_name,
           coalesce(array_to_string(list(c_name ORDER BY c_name)
                                    FILTER (c_name IS NOT NULL), '|'),
                    '') AS customers,
           coalesce(len(list(c_name ORDER BY c_name)
                        FILTER (c_name IS NOT NULL)), 0) AS n_customers
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation with deterministic ordering (collect_list is
    order-nondeterministic → always sort before comparing/serving).

    The posting list is serialized with array_join at the output boundary
    only — the driver's value-hash canonicalizer cannot sort list-typed
    pandas columns, so array-valued results are emitted as delimited
    strings on both engines."""
    nation, customer = _t(spark, sf_dir, "nation", "customer")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.array_sort(F.collect_list("c_name")).alias("arr"))
        .select(
            "n_name",
            F.array_join("arr", "|").alias("customers"),
            F.size("arr").cast("long").alias("n_customers"),
        )
    )


@register(
    "q_string_functions_ext",
    oracle="""
    SELECT s_suppkey,
           lpad(s_name, 20, '.')            AS name_padded,
           reverse(s_name)                  AS name_rev,
           replace(s_name, '#', '-')        AS name_repl,
           -- CASE guard (NULL sweep r11): DuckDB's split_part returns
           -- '' for a NULL input string; Spark's split_part propagates
           -- NULL
           CASE WHEN s_name IS NULL THEN NULL
                ELSE split_part(s_name, '#', 2) END AS name_num,
           strpos(s_name, '#')              AS hash_pos,
           left(s_name, 8)                  AS name_left,
           repeat('ab', 3)                  AS abab,
           levenshtein(s_name, 'Supplier#000000001') AS lev
    FROM supplier
    """,
)
def q_string_functions_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string surface: pad/reverse/replace/split_part/instr/
    left/repeat/levenshtein."""
    (supplier,) = _t(spark, sf_dir, "supplier")
    return supplier.select(
        "s_suppkey",
        F.lpad("s_name", 20, ".").alias("name_padded"),
        F.reverse("s_name").alias("name_rev"),
        F.replace("s_name", F.lit("#"), F.lit("-")).alias("name_repl"),
        F.split_part("s_name", F.lit("#"), F.lit(2)).alias("name_num"),
        F.instr("s_name", "#").alias("hash_pos"),
        F.left("s_name", F.lit(8)).alias("name_left"),
        F.repeat(F.lit("ab"), 3).alias("abab"),
        F.levenshtein("s_name", F.lit("Supplier#000000001")).alias("lev"),
    )


@register(
    "q_date_functions_ext",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)            AS due_date,
           CAST(last_day(o_orderdate) AS DATE)                     AS month_end,
           CAST(date_trunc('month', o_orderdate) AS DATE)          AS month_start,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT)          AS q,
           CAST(EXTRACT(isodow FROM o_orderdate) AS INT)           AS iso_dow,
           CAST(EXTRACT(week FROM o_orderdate) AS INT)             AS iso_week
    FROM orders WHERE o_orderkey <= 500
    """,
)
def q_date_functions_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended date surface; day-of-week normalized to ISO (Mon=1) since
    engines disagree on week-start conventions."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.where(F.col("o_orderkey") <= 500).select(
        "o_orderkey",
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        F.last_day("o_orderdate").alias("month_end"),
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.to_date("o_orderdate")).alias(
            "days_to_eoy"
        ),
        F.quarter("o_orderdate").alias("q"),
        iso_weekday("o_orderdate").alias("iso_dow"),
        F.weekofyear("o_orderdate").alias("iso_week"),
    )