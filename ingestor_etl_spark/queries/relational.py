"""Core relational queries over the star schema.

These exercise the engine's scan→filter→join→aggregate→sort spine
(SURVEY §2.5-§2.6 aggregations/sorts + §4 Catalyst mapping). All
money arithmetic goes through explicit decimal casts so Spark and
the DuckDB oracle produce bit-identical sums (decimal addition is
exact; double addition is order-dependent and is NOT used for
accumulation).

Scale notes (100 TB): every query here is a straight Catalyst plan —
filters and projections push into the parquet scan, `region`/
`nation` are broadcast (catalog.BROADCAST_TABLES), and the big
fact-fact joins shuffle on their natural keys with AQE handling
skew/coalescing. No UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.functions.scalar import dec
from ingestor_etl_spark.queries import register

# (1 - l_discount) / (1 + l_tax) as exact small decimals; the double
# rounds to the same 2-digit decimal in both engines. Lazy functions:
# Column construction needs an active SparkContext.
def _disc_price():
    one_minus_disc = (F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)).cast(
        "decimal(4,2)"
    )
    return (dec("l_extendedprice") * one_minus_disc).cast("decimal(16,4)")


def _charge():
    one_plus_tax = (F.lit(1).cast("decimal(4,2)") + dec("l_tax", 4, 2)).cast("decimal(4,2)")
    return (_disc_price() * one_plus_tax).cast("decimal(20,6)")

_SQL_ONE_MINUS_DISC = "CAST(1 - l_discount AS DECIMAL(4,2))"
_SQL_ONE_PLUS_TAX = "CAST(1 + l_tax AS DECIMAL(4,2))"
_SQL_DISC_PRICE = f"CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * {_SQL_ONE_MINUS_DISC} AS DECIMAL(16,4))"
_SQL_CHARGE = f"CAST({_SQL_DISC_PRICE} * {_SQL_ONE_PLUS_TAX} AS DECIMAL(20,6))"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({_SQL_CHARGE}) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("aggregation", "flagship"),
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary (flagship; SURVEY §2.5 A1-A3
    aggregation family). Single scan, map-side partial aggregation,
    6-group result."""
    l = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return (
        l.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(_charge()).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(dec("l_discount", 4, 2)).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "topk"),
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3-style: selective dim filter → fact join → grouped
    revenue → top-k. Deterministic tiebreak on l_orderkey."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "broadcast"),
)
def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5-style local-supplier revenue: two broadcast dims
    (region, nation — catalog.BROADCAST_TABLES) + three shuffled
    fact joins."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("semi-join",),
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4-style EXISTS as a left-semi join (the J7
    transaction-display-filter shape, sigshark.py:557-576)."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_revenue_forecast",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "pushdown"),
)
def q6_revenue_forecast(spark, sf_dir):
    """TPC-H Q6-style: all predicates push to the parquet scan
    (verify via .explain → PushedFilters), single global aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dec("l_extendedprice") * dec("l_discount", 4, 2)).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "topk_accounts",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 25
    """,
    tags=("sort", "limit", "broadcast"),
)
def topk_accounts(spark, sf_dir):
    """Global top-k with broadcast dim join (SURVEY §2.6 O1/O2 sort
    family): Spark plans TakeOrderedAndProject — no full sort."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .limit(25)
    )


@register(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS acctbal
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY 1, 2, 3, 5
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "topk"),
)
def q10_returned_revenue(spark, sf_dir):
    """TPC-H Q10-style: top customers by revenue lost to returns.
    nation broadcast, customer/orders/lineitem shuffle on their
    natural keys, decimal-exact revenue, top-20 via TakeOrdered."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .where(
            (F.col("l_returnflag") == "R")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("c_custkey", "c_name", "n_name", dec("c_acctbal").cast("double").alias("acctbal"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "acctbal")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100.00 * SUM(CASE WHEN p.p_type = 'PROMO' THEN {_SQL_DISC_PRICE}
                                  ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
           / CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS promo_revenue_pct,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS total_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    tags=("join", "aggregation"),
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14-style promo revenue share: conditional decimal
    aggregation over a part join within a shipdate window."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(_disc_price()).cast("double")
            ).alias("promo_revenue_pct"),
            F.sum(_disc_price()).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 270
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           epoch_us(o.o_orderdate) AS orderdate_us,
           CAST(o.o_totalprice AS DOUBLE) AS totalprice,
           b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice DESC, o_orderkey
    """,
    tags=("join", "having", "semi-aggregate"),
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18-style large-volume orders: aggregate-then-join —
    the HAVING pre-filter shrinks the build side before it ever
    meets orders/customer (classic 100 TB shape: reduce early)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_dec"))
        .where(F.col("qty_dec") > 270)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
            dec("o_totalprice").cast("double").alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
    )


@register(
    "rollup_returns",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
    tags=("aggregation", "rollup"),
)
def rollup_returns(spark, sf_dir):
    """Hierarchical ROLLUP totals (grouping-sets family — absent
    from the reference, table stakes for an analytics engine).
    Spark expands the rollup into grouping sets in a single
    aggregate; partial aggregation still applies."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "window_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS orderdate_us,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_revenue,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    WHERE o_custkey < 50
    ORDER BY o_custkey, order_seq
    """,
    tags=("window", "running-total"),
)
def window_running_revenue(spark, sf_dir):
    """Per-customer running revenue + order sequence — the window-
    function family (one shuffle on the partition key, decimal-exact
    accumulation)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").where("o_custkey < 50")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
            F.sum(dec("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")
            .alias("running_revenue"),
            F.row_number().over(w).alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
    )


# ------------------------------------------------------ SQL passthrough
_PASSTHROUGH_SQL = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
WHERE c_acctbal > 0
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register(
    "sql_passthrough",
    oracle=_PASSTHROUGH_SQL,
    tags=("relational", "sql"),
)
def sql_passthrough(spark, sf_dir):
    """The raw-SQL user surface: catalog.register_views exposes the
    tables as temp views and ONE ANSI-SQL string — byte-identical to
    the DuckDB oracle — runs through spark.sql. Proves a reference
    user can bring their SQL verbatim; Catalyst still plans it (the
    filter pushes into the scan like the DataFrame form)."""
    from ingestor_etl_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_PASSTHROUGH_SQL)


@register(
    "cube_revenue",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
             AS grp_id,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY grp_id, returnflag, linestatus
    """,
    tags=("aggregation", "cube", "grouping-sets"),
)
def cube_revenue(spark, sf_dir):
    """Full CUBE over (returnflag, linestatus) with GROUPING() subtotal
    flags — completes the grouping-sets family next to
    rollup_returns: all four subtotal combinations in ONE aggregate
    (Spark expands the cube into grouping sets with partial
    aggregation intact; the grp_id bitmask distinguishes a real
    'ALL' group from a hypothetical NULL-valued key, which COALESCE
    alone cannot). Output rows = |flags|·|statuses| + |flags| + |statuses|
    + 1 — bounded by the key domains, scan stays one pass."""
    l = load_table(spark, sf_dir, "lineitem")
    grp_id = (
        F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
    ).cast("bigint")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            grp_id.alias("grp_id"),
            F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "grp_id",
            "revenue",
            "n",
        )
        .orderBy("grp_id", "returnflag", "linestatus")
    )


@register(
    "datetime_functions",
    oracle="""
    SELECT o_orderkey,
           epoch_us(o_orderdate) AS odate_us,
           epoch_us(o_orderdate + INTERVAL 30 DAY) AS plus30d_us,
           epoch_us(o_orderdate + INTERVAL 3 MONTH) AS plus3mo_us,
           epoch_us(last_day(o_orderdate::DATE)::TIMESTAMP) AS month_end_us,
           epoch_us(date_trunc('quarter', o_orderdate)) AS quarter_us,
           CAST(date_diff('day', DATE '1995-01-01',
                          o_orderdate::DATE) AS BIGINT) AS days_since_95,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
             AS yyyymm
    FROM orders
    WHERE o_orderkey % 97 = 0
    ORDER BY o_orderkey
    """,
    tags=("datetime", "sql-surface"),
)
def datetime_functions(spark, sf_dir):
    """Calendar-function surface (§2.7 datetime family completed):
    day/month interval arithmetic, month-end, quarter truncation,
    date difference, ISO day-of-week, day-of-year, and a yyyymm
    partition key — each paired with the exact DuckDB twin so the
    calendar edge cases (month-length clamping in add-months, ISO
    Monday=1 numbering, leap days) are oracle-pinned, not assumed.
    One narrow projection; the filter prunes at the scan."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0)
    d = F.col("o_orderdate")
    as_us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    return (
        o.select(
            "o_orderkey",
            as_us(d).alias("odate_us"),
            as_us(d + F.expr("INTERVAL 30 DAYS")).alias("plus30d_us"),
            as_us(F.add_months(d, 3).cast("timestamp")).alias("plus3mo_us"),
            as_us(F.last_day(d).cast("timestamp")).alias("month_end_us"),
            as_us(F.date_trunc("quarter", d)).alias("quarter_us"),
            F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
            .cast("bigint")
            .alias("days_since_95"),
            F.dayofweek(F.date_sub(d.cast("date"), 1)).cast("bigint").alias("iso_dow"),
            F.dayofyear(d).cast("bigint").alias("doy"),
            (F.year(d) * 100 + F.month(d)).cast("bigint").alias("yyyymm"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(abs(l_quantity - 25) AS DOUBLE) AS abs_dev,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_ceil,
           CAST(floor(l_tax * 100 - 3.5) AS BIGINT) AS tax_floor_neg,
           round(l_extendedprice / 7, 2) AS price_div7,
           round(0.0 - l_discount - 0.005, 2) AS neg_half_round,
           CAST(l_partkey % 7 AS BIGINT) AS pk_mod,
           CAST(((l_partkey % 7) + 7) % 7 AS BIGINT) AS pk_pmod,
           CAST((0 - l_partkey) % 7 AS BIGINT) AS negk_mod,
           CAST(l_suppkey // 3 AS BIGINT) AS sk_div,
           CAST(sqrt(l_quantity) * sqrt(l_quantity) >= l_quantity - 1e-9
                AS BOOLEAN) AS sqrt_sane,
           CAST(sign(l_quantity - 25) AS BIGINT) AS qty_sign
    FROM lineitem
    WHERE l_orderkey % 193 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("math", "sql-surface"),
)
def math_functions(spark, sf_dir):
    """Arithmetic-function surface with the cross-engine edge cases
    PINNED: % keeps the dividend's sign in both engines (negk_mod),
    the pmod identity is spelled explicitly, integer division
    truncates, ceil/floor on negatives, and .5-rounding on negative
    values (Spark HALF_UP = DuckDB half-away-from-zero — they agree,
    and neg_half_round proves it on real data rather than assuming
    it). One pruned-scan projection."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 193 == 0)
    q = F.col("l_quantity")
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            F.abs(q - 25).cast("double").alias("abs_dev"),
            F.ceil(F.col("l_discount") * 100).cast("bigint").alias("disc_ceil"),
            F.floor(F.col("l_tax") * 100 - 3.5).cast("bigint").alias("tax_floor_neg"),
            F.round(F.col("l_extendedprice") / 7, 2).alias("price_div7"),
            F.round(F.lit(0.0) - F.col("l_discount") - 0.005, 2).alias(
                "neg_half_round"
            ),
            (F.col("l_partkey") % 7).cast("bigint").alias("pk_mod"),
            F.pmod(F.col("l_partkey"), F.lit(7)).cast("bigint").alias("pk_pmod"),
            ((F.lit(0) - F.col("l_partkey")) % 7).cast("bigint").alias("negk_mod"),
            F.expr("l_suppkey div 3").cast("bigint").alias("sk_div"),
            (
                F.sqrt(q) * F.sqrt(q) >= q - 1e-9
            ).alias("sqrt_sane"),
            F.signum(q - 25).cast("bigint").alias("qty_sign"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "conditional_functions",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'WAS-URGENT')
             AS priority_tag,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_band,
           greatest(o_custkey % 100, o_orderkey % 100) AS g,
           least(o_custkey % 100, o_orderkey % 100) AS l,
           CAST(CASE WHEN o_orderkey % 10 = 0 THEN NULL
                     ELSE o_totalprice END IS NULL AS BOOLEAN) AS masked,
           COALESCE(CASE WHEN o_orderkey % 10 = 0 THEN NULL
                         ELSE CAST(o_totalprice AS DECIMAL(12,2)) END,
                    CAST(-1 AS DECIMAL(12,2)))::DOUBLE AS price_or_default,
           CAST(o_totalprice / NULLIF(o_custkey % 5, 0) IS NULL AS BOOLEAN)
             AS div_guarded_null
    FROM orders
    WHERE o_orderkey % 151 = 0
    ORDER BY o_orderkey
    """,
    tags=("conditional", "sql-surface"),
)
def conditional_functions(spark, sf_dir):
    """Conditional/null-handling surface: NULLIF + COALESCE
    composition, searched CASE bands, greatest/least, NULL masking,
    decimal-typed defaults and the NULLIF-guarded division idiom
    (divide-by-zero → NULL, not error, in both engines). Narrow
    pruned-scan projection."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 151 == 0)
    masked_price = F.when(
        F.col("o_orderkey") % 10 == 0, F.lit(None)
    ).otherwise(F.col("o_totalprice").cast("decimal(12,2)"))
    return (
        o.select(
            "o_orderkey",
            F.coalesce(
                F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")),
                F.lit("WAS-URGENT"),
            ).alias("priority_tag"),
            F.when(F.col("o_totalprice") > 200000, "big")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("small")
            .alias("size_band"),
            F.greatest(F.col("o_custkey") % 100, F.col("o_orderkey") % 100).alias("g"),
            F.least(F.col("o_custkey") % 100, F.col("o_orderkey") % 100).alias("l"),
            masked_price.isNull().alias("masked"),
            F.coalesce(masked_price, F.lit(-1).cast("decimal(12,2)"))
            .cast("double")
            .alias("price_or_default"),
            (F.col("o_totalprice") / F.nullif(F.col("o_custkey") % 5, F.lit(0)))
            .isNull()
            .alias("div_guarded_null"),
        )
        .orderBy("o_orderkey")
    )
