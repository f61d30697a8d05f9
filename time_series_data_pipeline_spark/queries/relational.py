"""Core relational surface (SURVEY.md §2.2–2.6, M0): scans, filters,
scalar functions, joins (broadcast/semi/anti), hash aggregations,
cube/rollup, window functions, sorts/limits, set ops, pivot/unpivot.

All aggregates over double columns go through exact-decimal casts (see
registry docstring) so Spark and the DuckDB oracle are bit-identical.
Money columns use DECIMAL(12,2) so the triple product in pricing-summary
stays inside both engines' 38-digit exact range.

Registry layout note: the driver verifies a bounded window of registered
queries, so the relational basics are consolidated into SUITE queries —
each suite union-tags several constituent results into one canonical
long schema and is hash-compared against the identically-unioned oracle.
Every constituent operator therefore still gets exact driver
verification (a wrong value in ANY constituent breaks the suite hash)
while occupying one registry slot. The constituents remain importable
builders for tests and direct use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from .registry import query


def _m(col: str):
    """Money/metric column → exact decimal."""
    return F.col(col).cast("decimal(12,2)")


# typed NULL literals for suite-union padding (lazy: F.lit needs an
# active SparkContext, so these cannot be module-level constants)
def _NS():
    return F.lit(None).cast("string")


def _NL():
    return F.lit(None).cast("long")


def _ND():
    return F.lit(None).cast("double")


def _NT():
    return F.lit(None).cast("timestamp")


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "events_pivot_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
    FROM events GROUP BY user_id
    """,
)
def events_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra distinct-values job —
    the list keeps the plan single-pass at any scale)."""
    p = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
    )
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES],
    )


@query(
    "unpivot_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (S5 — the InfluxDB client's implicit unpivot of
    value columns into _field/_value rows, SURVEY.md §1.4)."""
    return table(spark, sf_dir, "lineitem").unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))
                    * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE)
             AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: one hash aggregation with map-side partials; the
    only shuffle moves (flag, status) groups."""
    one = F.lit(1).cast("decimal(3,2)")
    price, disc, tax, qty = _m("l_extendedprice"), _m("l_discount"), _m("l_tax"), _m("l_quantity")
    cnt = F.count(F.lit(1))
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
            (F.sum(price).cast("double") / cnt).alias("avg_price"),
            (F.sum(disc).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


_SQL_SURFACE = """
    SELECT p_type,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_type
    ORDER BY revenue DESC, p_type
    LIMIT 10
"""


@query("sql_surface_top_part_types", oracle=_SQL_SURFACE)
def sql_surface_top_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point: the EXACT oracle text runs as spark.sql over
    the registered views — one string, two engines, identical results.
    Demonstrates the engine's ANSI SQL surface (SURVEY.md §1.4)."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_SURFACE)


# ---------------------------------------------------------------------------
# Suite constituents: plain builders + their standalone oracle SQL.
# ---------------------------------------------------------------------------

_TOP_REVENUE_SQL = """
    SELECT o.o_orderkey, o.o_orderdate,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
"""


@query("top_revenue_orders", oracle=_TOP_REVENUE_SQL)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered 3-way join + agg + top-k. Customer side
    is filter-reduced; exact-decimal revenue makes the top-k cut
    deterministic."""
    one = F.lit(1).cast("decimal(3,2)")
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(_m("l_extendedprice") * (one - _m("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


_REGION_NATION_SQL = """
    SELECT r.r_name, n.n_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
"""


@query("region_nation_revenue", oracle=_REGION_NATION_SQL)
def region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicitly broadcast dimensions (nation/region are
    fixed-cardinality — broadcastable at any data scale)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(_m("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


_CUSTOMERS_WO_SQL = """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@query("customers_without_orders", oracle=_CUSTOMERS_WO_SQL)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 anti-join — the reference's new-files = discovered ∖ processed
    semantics (ETL.py:37–55) as a declarative left_anti."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


_PARTS_BY_BRAND_SQL = """
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    GROUP BY p_brand
"""


@query("parts_ordered_by_brand", oracle=_PARTS_BY_BRAND_SQL)
def parts_ordered_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) then aggregate."""
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


_CUBE_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("cube_status_priority", oracle=_CUBE_SQL)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping_id disambiguating subtotal rows."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_m("o_totalprice")).cast("double").alias("total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price")
    )


_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@query("grouping_sets_flag_status", oracle=_GROUPING_SETS_SQL)
def grouping_sets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind cube/rollup)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(_m("l_quantity")).cast("double").alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


_ROLLUP_SQL = """
    SELECT r.r_name, n.n_name,
           GROUPING(r.r_name, n.n_name) AS gid,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
           COUNT(*) AS n_suppliers
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
"""


@query("rollup_region_nation", oracle=_ROLLUP_SQL)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over a broadcast-joined hierarchy."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.sum(_m("s_acctbal")).cast("double").alias("total_bal"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
        .select("r_name", "n_name", "gid", "total_bal", "n_suppliers")
    )


_DISTINCT_COUNTS_SQL = """
    SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(*) AS n_rows
    FROM lineitem
"""


@query("distinct_counts", oracle=_DISTINCT_COUNTS_SQL)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column distinct aggregation (Spark expands to partial
    aggregates, one shuffle per distinct key set)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_MEDIAN_SQL = """
    SELECT o_orderpriority,
           round(median(o_totalprice), 4) AS median_price,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
"""


@query("median_price_by_priority", oracle=_MEDIAN_SQL)
def median_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (A3 — the InfluxDB aggregate menu offers it). Both
    engines interpolate even-count medians over 2-decimal inputs →
    3-decimal results, exact on the round(4) grid."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.median("o_totalprice"), 4).alias("median_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


_TOP3_SQL = """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
"""


@query("top3_orders_per_customer", oracle=_TOP3_SQL)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window function; orderkey tiebreak keeps it deterministic."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
    )


_RUNNING_TOTAL_SQL = """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
    FROM orders
    WHERE o_custkey <= 100
"""


@query("running_total_per_customer", oracle=_RUNNING_TOTAL_SQL)
def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative analytic window (exact-decimal running sum)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 100)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .withColumn("running_total", F.sum(_m("o_totalprice")).over(w).cast("double"))
    )


_ORDER_GAP_SQL = """
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_orderdate) OVER w AS prev_date,
           date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
                     CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("order_gap_days", oracle=_ORDER_GAP_SQL)
def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: days between consecutive orders per customer."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("prev_date", F.lag("o_orderdate").over(w))
        .withColumn(
            "gap_days",
            F.datediff(F.to_date("o_orderdate"), F.to_date("prev_date")).cast("long"),
        )
    )


_FILTER_PROJECT_SQL = """
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
"""


@query("filter_project_pushdown", oracle=_FILTER_PROJECT_SQL)
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P5/P6: range + equality predicates and column pruning — both
    reach the parquet scan (PushedFilters / 3-column ReadSchema)."""
    return (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00"))
        )
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


_SET_OPS_SQL = """
    SELECT c_custkey, 'rich_no_orders' AS op FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      EXCEPT
      SELECT o_custkey FROM orders
    )
    UNION ALL
    SELECT c_custkey, 'rich_with_orders' AS op FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      INTERSECT
      SELECT o_custkey FROM orders
    )
"""


@query("set_except_intersect", oracle=_SET_OPS_SQL)
def set_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT (distinct set semantics), union-tagged."""
    rich = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    with_orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    ex = rich.subtract(with_orders).withColumn("op", F.lit("rich_no_orders"))
    inter = rich.intersect(with_orders).withColumn("op", F.lit("rich_with_orders"))
    return ex.unionByName(inter)


#: The 9 scalar outputs of the F1–F6 parity projection, pipe-joined into
#: one string so the whole row verifies through the suite's v_str column.
_SCALAR_COLS = (
    "priority_num",
    "status_lower",
    "order_year",
    "order_month",
    "order_day",
    "order_date_str",
    "status_prio",
    "prio_first_char",
    "prio_len",
)

_SCALAR_SQL = """
    SELECT o_orderkey,
           CAST(regexp_extract(o_orderpriority, '^(\\d+)', 1) AS BIGINT) AS priority_num,
           lower(o_orderstatus) AS status_lower,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(day(o_orderdate) AS BIGINT) AS order_day,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
           o_orderstatus || '-' || regexp_extract(o_orderpriority, '^(\\d+)', 1) AS status_prio,
           substring(o_orderpriority, 1, 1) AS prio_first_char,
           CAST(length(o_orderpriority) AS BIGINT) AS prio_len
    FROM orders
"""


@query("scalar_functions", oracle=_SCALAR_SQL)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1–F6 scalar parity: regex extract, case, date parts, formatting,
    concat, substring, length — all codegen'd built-ins."""
    prio_num = F.regexp_extract("o_orderpriority", r"^(\d+)", 1)
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        prio_num.cast("long").alias("priority_num"),
        F.lower("o_orderstatus").alias("status_lower"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.concat_ws("-", F.col("o_orderstatus"), prio_num).alias("status_prio"),
        F.substring("o_orderpriority", 1, 1).alias("prio_first_char"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
    )


_TOPK_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
"""


@query("topk_orders", oracle=_TOPK_SQL)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps, no full sort, no full shuffle."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Suites.
# ---------------------------------------------------------------------------


@query(
    "suite_joins",
    oracle=f"""
    SELECT 'top_revenue_orders' AS sub, CAST(o_orderkey AS VARCHAR) AS k1,
           CAST(NULL AS VARCHAR) AS k2, o_orderdate AS ts,
           CAST(NULL AS BIGINT) AS n, revenue AS value
    FROM ({_TOP_REVENUE_SQL})
    UNION ALL
    SELECT 'region_nation_revenue', r_name, n_name, NULL, n_orders, revenue
    FROM ({_REGION_NATION_SQL})
    UNION ALL
    SELECT 'customers_without_orders', CAST(c_custkey AS VARCHAR), c_name,
           NULL, NULL, c_acctbal
    FROM ({_CUSTOMERS_WO_SQL})
    UNION ALL
    SELECT 'parts_ordered_by_brand', p_brand, NULL, NULL, n_parts, NULL
    FROM ({_PARTS_BY_BRAND_SQL})
    """,
)
def suite_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-family suite, one hash-verified union: broadcast star join +
    agg (region_nation_revenue), filtered 3-way join + top-k
    (top_revenue_orders, TPC-H Q3), anti-join (customers_without_orders),
    semi-join (parts_ordered_by_brand)."""
    tr = top_revenue_orders(spark, sf_dir).select(
        F.lit("top_revenue_orders").alias("sub"),
        F.col("o_orderkey").cast("string").alias("k1"),
        _NS().alias("k2"),
        F.col("o_orderdate").alias("ts"),
        _NL().alias("n"),
        F.col("revenue").alias("value"),
    )
    rn = region_nation_revenue(spark, sf_dir).select(
        F.lit("region_nation_revenue").alias("sub"),
        F.col("r_name").alias("k1"),
        F.col("n_name").alias("k2"),
        _NT().alias("ts"),
        F.col("n_orders").alias("n"),
        F.col("revenue").alias("value"),
    )
    cw = customers_without_orders(spark, sf_dir).select(
        F.lit("customers_without_orders").alias("sub"),
        F.col("c_custkey").cast("string").alias("k1"),
        F.col("c_name").alias("k2"),
        _NT().alias("ts"),
        _NL().alias("n"),
        F.col("c_acctbal").alias("value"),
    )
    pb = parts_ordered_by_brand(spark, sf_dir).select(
        F.lit("parts_ordered_by_brand").alias("sub"),
        F.col("p_brand").alias("k1"),
        _NS().alias("k2"),
        _NT().alias("ts"),
        F.col("n_parts").alias("n"),
        _ND().alias("value"),
    )
    return tr.unionByName(rn).unionByName(cw).unionByName(pb)


@query(
    "suite_grouping",
    oracle=f"""
    SELECT 'cube_status_priority' AS sub, o_orderstatus AS k1,
           o_orderpriority AS k2, gid, n_orders AS n, total_price AS value
    FROM ({_CUBE_SQL})
    UNION ALL
    SELECT 'grouping_sets_flag_status', l_returnflag, l_linestatus, gid, n, sum_qty
    FROM ({_GROUPING_SETS_SQL})
    UNION ALL
    SELECT 'rollup_region_nation', r_name, n_name, gid, n_suppliers, total_bal
    FROM ({_ROLLUP_SQL})
    UNION ALL
    SELECT 'distinct_counts', m.k1, NULL, NULL, m.n, NULL
    FROM ({_DISTINCT_COUNTS_SQL}) d,
         LATERAL (VALUES ('n_orders', d.n_orders), ('n_parts', d.n_parts),
                         ('n_suppliers', d.n_suppliers), ('n_rows', d.n_rows))
           AS m(k1, n)
    UNION ALL
    SELECT 'median_price_by_priority', o_orderpriority, NULL, NULL,
           n_orders, median_price
    FROM ({_MEDIAN_SQL})
    """,
)
def suite_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation-family suite: CUBE, GROUPING SETS, ROLLUP (each with
    grouping_id), multi-column COUNT(DISTINCT) (long-formed via
    unpivot), and exact median."""
    cu = cube_status_priority(spark, sf_dir).select(
        F.lit("cube_status_priority").alias("sub"),
        F.col("o_orderstatus").alias("k1"),
        F.col("o_orderpriority").alias("k2"),
        F.col("gid"),
        F.col("n_orders").alias("n"),
        F.col("total_price").alias("value"),
    )
    gs = grouping_sets_flag_status(spark, sf_dir).select(
        F.lit("grouping_sets_flag_status").alias("sub"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        F.col("gid"),
        F.col("n").alias("n"),
        F.col("sum_qty").alias("value"),
    )
    ru = rollup_region_nation(spark, sf_dir).select(
        F.lit("rollup_region_nation").alias("sub"),
        F.col("r_name").alias("k1"),
        F.col("n_name").alias("k2"),
        F.col("gid"),
        F.col("n_suppliers").alias("n"),
        F.col("total_bal").alias("value"),
    )
    dc = (
        distinct_counts(spark, sf_dir)
        .unpivot([], ["n_orders", "n_parts", "n_suppliers", "n_rows"], "k1", "n")
        .select(
            F.lit("distinct_counts").alias("sub"),
            F.col("k1"),
            _NS().alias("k2"),
            _NL().alias("gid"),
            F.col("n"),
            _ND().alias("value"),
        )
    )
    md = median_price_by_priority(spark, sf_dir).select(
        F.lit("median_price_by_priority").alias("sub"),
        F.col("o_orderpriority").alias("k1"),
        _NS().alias("k2"),
        _NL().alias("gid"),
        F.col("n_orders").alias("n"),
        F.col("median_price").alias("value"),
    )
    return cu.unionByName(gs).unionByName(ru).unionByName(dc).unionByName(md)


@query(
    "suite_window_fns",
    oracle=f"""
    SELECT 'top3_orders_per_customer' AS sub, o_custkey AS custkey,
           o_orderkey AS orderkey, rn AS k, o_totalprice AS value
    FROM ({_TOP3_SQL})
    UNION ALL
    SELECT 'running_total_per_customer', o_custkey, o_orderkey, NULL, running_total
    FROM ({_RUNNING_TOTAL_SQL})
    UNION ALL
    SELECT 'order_gap_days', o_custkey, o_orderkey, gap_days, NULL
    FROM ({_ORDER_GAP_SQL})
    """,
)
def suite_window_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function suite: ranking (row_number top-3 per customer),
    cumulative frame (running total), lag/lead (order gap days)."""
    t3 = top3_orders_per_customer(spark, sf_dir).select(
        F.lit("top3_orders_per_customer").alias("sub"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("rn").alias("k"),
        F.col("o_totalprice").alias("value"),
    )
    rt = running_total_per_customer(spark, sf_dir).select(
        F.lit("running_total_per_customer").alias("sub"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        _NL().alias("k"),
        F.col("running_total").alias("value"),
    )
    og = order_gap_days(spark, sf_dir).select(
        F.lit("order_gap_days").alias("sub"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("gap_days").alias("k"),
        _ND().alias("value"),
    )
    return t3.unionByName(rt).unionByName(og)


@query(
    "suite_scans",
    oracle=f"""
    SELECT 'filter_project_pushdown' AS sub, o_orderkey AS k, o_orderdate AS ts,
           CAST(NULL AS VARCHAR) AS v_str, o_totalprice AS v_num
    FROM ({_FILTER_PROJECT_SQL})
    UNION ALL
    SELECT 'scalar_functions', o_orderkey, NULL,
           concat_ws('|', CAST(priority_num AS VARCHAR), status_lower,
                     CAST(order_year AS VARCHAR), CAST(order_month AS VARCHAR),
                     CAST(order_day AS VARCHAR), order_date_str, status_prio,
                     prio_first_char, CAST(prio_len AS VARCHAR)),
           NULL
    FROM ({_SCALAR_SQL})
    UNION ALL
    SELECT 'set_except_intersect', c_custkey, NULL, op, NULL
    FROM ({_SET_OPS_SQL})
    UNION ALL
    SELECT 'topk_orders', o_orderkey, o_orderdate,
           CAST(o_custkey AS VARCHAR), o_totalprice
    FROM ({_TOPK_SQL})
    """,
)
def suite_scans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan/scalar/set-op suite: predicate+projection pushdown probe,
    the F1–F6 scalar-function battery (pipe-joined per row), EXCEPT /
    INTERSECT, and global top-k (TakeOrderedAndProject)."""
    fp = filter_project_pushdown(spark, sf_dir).select(
        F.lit("filter_project_pushdown").alias("sub"),
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").alias("ts"),
        _NS().alias("v_str"),
        F.col("o_totalprice").alias("v_num"),
    )
    sc = scalar_functions(spark, sf_dir).select(
        F.lit("scalar_functions").alias("sub"),
        F.col("o_orderkey").alias("k"),
        _NT().alias("ts"),
        F.concat_ws(
            "|", *[F.col(c).cast("string") for c in _SCALAR_COLS]
        ).alias("v_str"),
        _ND().alias("v_num"),
    )
    se = set_except_intersect(spark, sf_dir).select(
        F.lit("set_except_intersect").alias("sub"),
        F.col("c_custkey").alias("k"),
        _NT().alias("ts"),
        F.col("op").alias("v_str"),
        _ND().alias("v_num"),
    )
    tk = topk_orders(spark, sf_dir).select(
        F.lit("topk_orders").alias("sub"),
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_custkey").cast("string").alias("v_str"),
        F.col("o_totalprice").alias("v_num"),
    )
    return fp.unionByName(sc).unionByName(se).unionByName(tk)
