"""Subquery / anti-join / set-operation relational queries.

Widens the relational surface beyond the reference (which has no
query engine at all — SURVEY §2.6 notes set ops and windows are
absent there) with the operator families any analytics engine must
carry: correlated scalar subqueries (decorrelated as aggregate-then-
join), NOT-IN/NOT-EXISTS anti joins, EXISTS semi joins with non-equi
conditions, left-outer distribution counts, and INTERSECT / EXCEPT /
UNION.

Exactness convention: threshold comparisons against averages are
rewritten multiplicatively (``x * cnt > sum`` instead of
``x > sum/cnt``) on BOTH the Spark and the DuckDB side, so the
predicate is exact decimal arithmetic — no double division whose
rounding could flip a borderline row in one engine only.

Scale notes (100 TB): every query is a pure Catalyst plan. The
correlated subqueries become one extra aggregate on the fact table
feeding a shuffled equi-join on the correlation key (partial
aggregation applies; no per-row re-scan as naive decorrelation
would). Anti/semi joins run as sort-merge with the equi part of the
condition as the join key; the residual non-equi predicate stays a
post-join filter. The single-row aggregates (q22's average) are
broadcast, never shuffled.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.functions.scalar import dec
from ingestor_etl_spark.queries import register


@register(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("outer-join", "distribution"),
)
def q13_order_distribution(spark, sf_dir):
    """TPC-H Q13-style customer order-count distribution: left outer
    join with a join-condition filter (not a WHERE — null-extended
    rows must survive), then a two-level aggregation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey AS pp_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS sum_qty,
               COUNT(*) AS cnt_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN per_part ON pp_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt_qty < sum_qty
    """,
    tags=("correlated-subquery", "decorrelated"),
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17-style small-quantity revenue: the correlated scalar
    subquery (per-part average quantity) decorrelated into one
    aggregate over lineitem joined back on l_partkey. The textbook
    ``l_quantity < 0.2 * avg(...)`` is rewritten ``qty * 5 * cnt <
    sum`` so both engines compare exact decimals."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    per_part = l.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        F.sum(dec("l_quantity")).cast("decimal(20,2)").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("pp_partkey") == F.col("l_partkey"))
        .where(dec("l_quantity") * F.lit(5) * F.col("cnt_qty") < F.col("sum_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q22_idle_customers",
    oracle="""
    WITH pos AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS bal_sum,
               COUNT(*) AS bal_cnt
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(12,2)) * bal_cnt > bal_sum
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("anti-join", "scalar-subquery"),
)
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22-style: above-average-balance customers with no
    recent orders. The global average is a single-row aggregate
    cross-joined (broadcast — one row) into the filter, again in
    multiplicative exact form; the NOT EXISTS is a left-anti join
    against recent orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    pos = (
        c.where(F.col("c_acctbal") > 0)
        .agg(
            F.sum(dec("c_acctbal")).cast("decimal(20,2)").alias("bal_sum"),
            F.count(F.lit(1)).alias("bal_cnt"),
        )
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .where(dec("c_acctbal") * F.col("bal_cnt") > F.col("bal_sum"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 50)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
    tags=("anti-join", "count-distinct"),
)
def q16_supplier_variety(spark, sf_dir):
    """TPC-H Q16-style supplier variety per brand/type (adapted to
    this schema: lineitem stands in for partsupp): NOT IN over a
    filtered supplier set as a left-anti join, then COUNT(DISTINCT)
    — Spark plans it as a two-phase distinct aggregate. The
    excluded-supplier set is a constant FRACTION of suppliers (it
    scales with input), so it is not force-broadcast: the anti join
    keys both sides on suppkey and AQE upgrades to broadcast at
    runtime only when the filtered set actually fits."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 50)
    )
    bad_suppliers = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(bad_suppliers, F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


@register(
    "q21_blocking_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("semi-join", "anti-join", "non-equi"),
)
def q21_blocking_supplier(spark, sf_dir):
    """TPC-H Q21-style blocking supplier (adapted: l_shipdate stands
    in for receipt/commit dates): for finished multi-supplier orders,
    the supplier whose line shipped last. EXISTS → left-semi,
    NOT EXISTS → left-anti, both with an equi key (l_orderkey) plus
    residual non-equi predicates — Spark keeps the sort-merge join
    on the equi key and applies the residual as a join filter."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    l1 = l.alias("l1")
    l2 = l.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = l.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    return (
        l1.join(s, F.col("s_suppkey") == F.col("l1.l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l1.l_orderkey"))
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
            & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_supplycost
        FROM lineitem GROUP BY 1, 2
    ), eu AS (
        SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
        FROM supply
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    ), best AS (
        SELECT ps_partkey AS b_partkey, MIN(ps_supplycost) AS min_cost
        FROM eu GROUP BY 1
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           CAST(ps_supplycost AS DOUBLE) AS supplycost
    FROM eu
    JOIN best ON b_partkey = ps_partkey AND ps_supplycost = min_cost
    JOIN part ON p_partkey = ps_partkey
    WHERE p_type = 'STANDARD' AND p_size <= 15
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
    tags=("correlated-subquery", "min-of-group", "dim-join"),
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2-style minimum-cost supplier (adapted: with no
    partsupp table, supply cost is MIN(l_extendedprice) per
    (part, supplier) pair from lineitem). The correlated MIN
    subquery is decorrelated into a per-part aggregate over the
    region-filtered supply joined back on (partkey, cost).

    Scale: nation/region are tiny broadcasts; supply is one shuffle
    on (partkey, suppkey); the per-part MIN reuses the partkey-side
    of that exchange. The part filter prunes before the final join.
    Cost stays DECIMAL(12,2) end-to-end so the cost-equality join
    key is exact on both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    )
    supply = l.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(dec("l_extendedprice")).alias("ps_supplycost"))
    eu = (
        supply.join(s, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    best = eu.groupBy(F.col("ps_partkey").alias("b_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eu.join(
            best,
            (F.col("b_partkey") == F.col("ps_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(p, F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH v AS (
        SELECT l_partkey AS partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(value) AS DECIMAL(24,2)) AS total FROM v
    )
    SELECT partkey, CAST(value AS DOUBLE) AS value
    FROM v, tot
    WHERE value * 1000 > total
    ORDER BY value DESC, partkey
    """,
    tags=("scalar-subquery", "having-fraction"),
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11-style important parts (adapted: value is the
    lineitem revenue supplied from one region, partsupp being
    absent): parts whose share of the region's total supply value
    exceeds 1/1000, i.e. HAVING against a global scalar subquery.
    The fraction test is multiplicative (``value * 1000 > total``)
    so both engines compare exact decimals.

    Scale: one shuffle on l_partkey builds v; the global total is a
    single-row aggregate broadcast into the filter — never a second
    shuffle of v."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    v = (
        l.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(dec("l_extendedprice")).cast("decimal(20,2)").alias("value"))
    )
    tot = v.agg(F.sum("value").cast("decimal(24,2)").alias("total"))
    return (
        v.crossJoin(F.broadcast(tot))
        .where(F.col("value") * F.lit(1000) > F.col("total"))
        .select("partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.desc("value"), "partkey")
    )


@register(
    "q20_fresh_stock_suppliers",
    oracle="""
    WITH pp AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ), agg AS (
        SELECT l_suppkey, l_partkey,
            CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                           AND l_shipdate <  TIMESTAMP '1998-01-01'
                     THEN CAST(l_quantity AS DECIMAL(12,2))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(20,2)) AS qty97,
            CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS qty_all
        FROM lineitem JOIN pp ON p_partkey = l_partkey
        GROUP BY 1, 2
    ), good AS (
        SELECT l_suppkey, COUNT(*) AS n_parts
        FROM agg WHERE qty97 * 2 > qty_all GROUP BY 1
    )
    SELECT s_name, n_name, n_parts
    FROM good
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'AMERICA'
    ORDER BY s_name
    """,
    tags=("nested-subquery", "semi-join", "conditional-agg"),
)
def q20_fresh_stock_suppliers(spark, sf_dir):
    """TPC-H Q20-style supplier shortlist (adapted: 'availqty >
    half of shipped' becomes 'majority of this part's lifetime
    quantity shipped in 1997' — same nested-subquery shape, no
    partsupp needed): suppliers in one region having parts whose
    1997 share exceeds half, with the qualifying-part count. The
    half test is multiplicative (``qty97 * 2 > qty_all``) — exact
    decimals on both engines.

    Scale: the part-name filter prunes lineitem through a broadcast
    semi join BEFORE the (suppkey, partkey) aggregation shuffle; the
    conditional 1997 sum rides the same aggregate (no second scan);
    supplier/nation/region are broadcast dims."""
    l = load_table(spark, sf_dir, "lineitem")
    pp = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    in97 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    zero = F.lit(0).cast("decimal(12,2)")
    agg = (
        l.join(pp, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in97, dec("l_quantity")).otherwise(zero))
            .cast("decimal(20,2)")
            .alias("qty97"),
            F.sum(dec("l_quantity")).cast("decimal(20,2)").alias("qty_all"),
        )
    )
    good = (
        agg.where(F.col("qty97") * F.lit(2) > F.col("qty_all"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    return (
        good.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_name", "n_name", "n_parts")
        .orderBy("s_name")
    )


@register(
    "set_ops_cohorts",
    oracle="""
    WITH y96 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    ), y97 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT 'both' AS cohort, COUNT(*) AS n
      FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97) a
    UNION ALL
    SELECT 'either', COUNT(*)
      FROM (SELECT o_custkey FROM y96 UNION SELECT o_custkey FROM y97) b
    UNION ALL
    SELECT 'only_1996', COUNT(*)
      FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97) c
    UNION ALL
    SELECT 'only_1997', COUNT(*)
      FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y96) d
    ORDER BY cohort
    """,
    tags=("set-ops",),
)
def set_ops_cohorts(spark, sf_dir):
    """Customer-cohort retention via the full set-operation family:
    INTERSECT, UNION (distinct), and EXCEPT both ways over the 1996
    vs 1997 buyer sets. Each set op is one shuffle on o_custkey;
    the four single-row counts union into the result."""
    o = load_table(spark, sf_dir, "orders")

    def buyers(year: int):
        return (
            o.where(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y96, y97 = buyers(1996), buyers(1997)
    parts = [
        ("both", y96.intersect(y97)),
        ("either", y96.union(y97).distinct()),
        ("only_1996", y96.subtract(y97)),
        ("only_1997", y97.subtract(y96)),
    ]
    counted = [
        df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(name).alias("cohort"), "n")
        for name, df in parts
    ]
    out = counted[0]
    for piece in counted[1:]:
        out = out.unionByName(piece)
    return out.orderBy("cohort")
