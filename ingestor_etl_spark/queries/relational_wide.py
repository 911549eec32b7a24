"""Relational widening, third wave: Q7/Q12/Q15/Q19-style plans.

Families added: bidirectional symmetric join predicates (Q7's
nation-pair OR), conditional aggregation over a join (Q12),
aggregate-equals-max-of-aggregate scalar subqueries (Q15, compared
in exact decimal so ties resolve identically in both engines), and
disjunctive multi-column predicates spanning the join (Q19 — the
classic pushdown test: the per-table conjuncts of the OR must still
reach each scan).

Scale notes (100 TB): nation is broadcast; the Q15 max is a
single-row broadcast; Q19's OR is evaluated post-join but Catalyst
extracts the common ``p_partkey`` equi-key and per-side prefilters
(brand/size on part, quantity range on lineitem) so the join sees
only candidate rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.functions.scalar import dec
from ingestor_etl_spark.queries import register
from ingestor_etl_spark.queries.relational import _SQL_DISC_PRICE, _disc_price


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    tags=("join", "symmetric-predicate"),
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7-style trade volume between a nation pair, both
    directions, by ship year. The nation dimension joins twice
    (supplier side and customer side) — both broadcast; the
    disjunctive pair filter runs after both are attached."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        s.join(l, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q12_priority_lines",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("join", "conditional-aggregation"),
)
def q12_priority_lines(spark, sf_dir):
    """TPC-H Q12-style (adapted: l_returnflag stands in for the
    absent l_shipmode): high/low-priority line counts via
    conditional aggregation over the orders join."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(20,4)) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
    tags=("scalar-subquery", "max-of-aggregate"),
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15-style top supplier: revenue per supplier in a
    quarter, keep those equal to the max. The comparison stays in
    DECIMAL (exact) — a double round-trip could drop a tied winner
    in one engine only. The max is a one-row broadcast."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        F.sum(_disc_price()).cast("decimal(20,4)").alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(top))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("disjunctive-predicate", "pushdown"),
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19-style disjunctive filter spanning the join: three
    OR'd brand/size/quantity conjunctions. Catalyst derives the
    per-side implied filters (brand+size union on part, quantity
    union on lineitem) so each scan prunes before the join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH flat AS (
        SELECT year(o_orderdate) AS o_year,
               {_SQL_DISC_PRICE} AS volume,
               n1.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           CAST(SUM(volume) AS DOUBLE) AS total_volume
    FROM flat GROUP BY o_year ORDER BY o_year
    """,
    tags=("join", "market-share"),
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8-style market share: NATION_3 suppliers' slice of
    ASIA-customer revenue by order year. Six joins — region/nation
    broadcast twice (customer and supplier sides), facts shuffled on
    natural keys; the share is one double division of two exact
    decimal sums."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")))
    volume = _disc_price()
    nation3 = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(nation3).cast("double") / F.sum(volume).cast("double")).alias("mkt_share"),
            F.sum(volume).cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(SUM(CAST({_SQL_DISC_PRICE} AS DECIMAL(24,4))
                    - CAST(CAST(p_retailprice AS DECIMAL(12,2))
                           * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(24,4)))
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
    tags=("join", "like-filter"),
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9-style product-line profit by supplier nation and
    year (adapted: p_retailprice*quantity stands in for the absent
    partsupp supplycost). The LIKE filter pushes to the part scan
    as a string-contains; all money arithmetic stays decimal until
    the final double."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    amount = _disc_price().cast("decimal(24,4)") - (
        dec("p_retailprice") * dec("l_quantity")
    ).cast("decimal(24,4)")
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ----------------------------------------------------- bloom_join_filter
BLOOM_BITS = 1024
# 32 bits used per 64-bit word: keeps every shift < 32 so neither
# engine hits the 1<<63 sign bit (DuckDB overflow-checks shifts).
BLOOM_BPW = 32
BLOOM_WORDS = BLOOM_BITS // BLOOM_BPW


def _bloom_pos_sql(key: str, salt: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8) "
        f"AS BIGINT) % {BLOOM_BITS}"
    )


def _bloom_pos_spark(key_col, salt: str):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % BLOOM_BITS
    )


@register(
    "bloom_join_filter",
    oracle=f"""
    WITH keys AS (
      SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    pos AS (
      SELECT k, {_bloom_pos_sql('k', 'a')} AS p1, {_bloom_pos_sql('k', 'b')} AS p2
      FROM keys
    ),
    filt AS (
      SELECT {", ".join(
        f"CAST(bit_or(CASE WHEN p1 // {BLOOM_BPW} = {w} THEN (1::BIGINT << CAST(p1 % {BLOOM_BPW} AS INTEGER)) ELSE 0 END "
        f"| CASE WHEN p2 // {BLOOM_BPW} = {w} THEN (1::BIGINT << CAST(p2 % {BLOOM_BPW} AS INTEGER)) ELSE 0 END) AS BIGINT) AS w{w}"
        for w in range(BLOOM_WORDS))}
      FROM pos
    ),
    probe AS (
      SELECT l.l_orderkey,
             {_bloom_pos_sql('l.l_orderkey', 'a')} AS p1,
             {_bloom_pos_sql('l.l_orderkey', 'b')} AS p2,
             CAST(l.l_extendedprice AS DECIMAL(12,2)) AS price
      FROM lineitem l
    ),
    tested AS (
      SELECT p.*, (
        (CASE {" ".join(f"WHEN p1 // {BLOOM_BPW} = {w} THEN f.w{w}" for w in range(BLOOM_WORDS))} END
         & (1::BIGINT << CAST(p1 % {BLOOM_BPW} AS INTEGER))) <> 0
        AND
        (CASE {" ".join(f"WHEN p2 // {BLOOM_BPW} = {w} THEN f.w{w}" for w in range(BLOOM_WORDS))} END
         & (1::BIGINT << CAST(p2 % {BLOOM_BPW} AS INTEGER))) <> 0
      ) AS bloom_pass
      FROM probe p CROSS JOIN filt f
    ),
    joined AS (
      SELECT t.l_orderkey, t.price
      FROM tested t JOIN keys ON t.l_orderkey = keys.k
      WHERE t.bloom_pass
    )
    SELECT CAST((SELECT count(*) FROM keys) AS BIGINT) AS n_keys,
           CAST((SELECT
                  {" + ".join(f"CAST(bit_count(w{w}) AS BIGINT)" for w in range(BLOOM_WORDS))}
                 FROM filt) AS BIGINT) AS bits_set,
           CAST((SELECT count(*) FROM probe) AS BIGINT) AS n_lineitem,
           CAST((SELECT count(*) FROM tested WHERE bloom_pass) AS BIGINT)
             AS n_pass_bloom,
           CAST(count(*) AS BIGINT) AS n_true_match,
           CAST(CAST(sum(price) AS DECIMAL(16,2)) AS DOUBLE) AS matched_revenue
    FROM joined
    """,
    tags=("join", "bloom", "runtime-filter"),
)
def bloom_join_filter(spark, sf_dir):
    """Bloom-filter join pruning as explicit dataflow (the mechanism
    behind Spark's runtime filters / DPP, made inspectable): build a
    {bits}-bit, 2-hash Bloom filter over the selective dim-side keys
    (urgent orders), broadcast the CONSTANT-SIZE filter, pre-screen
    the fact scan before the shuffle join, then run the real join on
    survivors. The output row proves the mechanism end to end:
    bloom_pass count vs true matches (the difference IS the false-
    positive volume — deterministic here because the hash family is
    md5), plus the joined revenue, which is bit-identical to the
    unfiltered join by the no-false-negative property.

    Plan shape at 100 TB: the filter build is one aggregation of the
    SMALL side into {words} longs; the probe is a narrow map over
    the fact scan (broadcast 1-row filter, integer bit tests) that
    drops non-matching rows BEFORE they shuffle into the join —
    precisely the rows_pruned × network saving runtime filters buy;
    the per-row cost is two md5s + two AND/compare ops."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    keys = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("k")
    )
    pos = keys.select(
        "k",
        _bloom_pos_spark("k", "a").alias("p1"),
        _bloom_pos_spark("k", "b").alias("p2"),
    )

    def word_expr(w: int) -> str:
        return (
            f"cast(bit_or("
            f"(CASE WHEN p1 div {BLOOM_BPW} = {w} THEN shiftleft(1L, cast(p1 % {BLOOM_BPW} as int)) ELSE 0L END) | "
            f"(CASE WHEN p2 div {BLOOM_BPW} = {w} THEN shiftleft(1L, cast(p2 % {BLOOM_BPW} as int)) ELSE 0L END)"
            f") as bigint) AS w{w}"
        )

    filt = pos.selectExpr(*[word_expr(w) for w in range(BLOOM_WORDS)])
    # Repartition before the per-row double-md5 probe projection (the
    # testdata parquet is one row group → single-task scan; same
    # layout fix as dedup_ops._shingled), and materialize the tested
    # relation below — three report branches consume it, and without
    # the cache each one re-runs the md5 probe over the fact table
    # (measured 6.0 s → ~1.5 s for the whole query at sf0.1).
    probe = (
        lineitem.repartition(spark.sparkContext.defaultParallelism)
        .select(
            "l_orderkey",
            _bloom_pos_spark("l_orderkey", "a").alias("p1"),
            _bloom_pos_spark("l_orderkey", "b").alias("p2"),
            F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
        )
    )
    word_case = lambda p: "CASE " + " ".join(  # noqa: E731
        f"WHEN {p} div {BLOOM_BPW} = {w} THEN w{w}" for w in range(BLOOM_WORDS)
    ) + " END"
    pass_sql = (
        f"(({word_case('p1')} & shiftleft(1L, cast(p1 % {BLOOM_BPW} as int))) != 0) AND "
        f"(({word_case('p2')} & shiftleft(1L, cast(p2 % {BLOOM_BPW} as int))) != 0)"
    )
    from ingestor_etl_spark.plans.layout import materialize

    tested = materialize(
        probe.crossJoin(F.broadcast(filt)).withColumn(
            "bloom_pass", F.expr(pass_sql)
        )
    )
    joined = (
        tested.where("bloom_pass")
        .join(F.broadcast(keys), F.col("l_orderkey") == F.col("k"))
        .select("l_orderkey", "price")
    )
    n_keys = keys.agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    bits = filt.selectExpr(
        "cast(" + " + ".join(f"bit_count(w{w})" for w in range(BLOOM_WORDS))
        + " as bigint) AS bits_set"
    )
    n_li = tested.agg(F.count(F.lit(1)).cast("bigint").alias("n_lineitem"))
    n_pass = tested.where("bloom_pass").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pass_bloom")
    )
    res = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true_match"),
        F.sum("price").cast("decimal(16,2)").cast("double").alias("matched_revenue"),
    )
    return (
        n_keys.crossJoin(F.broadcast(bits))
        .crossJoin(F.broadcast(n_li))
        .crossJoin(F.broadcast(n_pass))
        .crossJoin(F.broadcast(res))
    )


bloom_join_filter.__doc__ = bloom_join_filter.__doc__.format(
    bits=BLOOM_BITS, words=BLOOM_WORDS
)
