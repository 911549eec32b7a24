"""Plan-shape + layout-helper tests: assert the physical plans we
designed for, not just the values."""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.plans.layout import (
    explode_hot_keys,
    plan_facts,
    salted_agg,
)
from ingestor_etl_spark.queries import load_all

REGISTRY = load_all()


def test_q5_plan_is_broadcast_only_with_pushdown(spark, sf_dir):
    facts = plan_facts(REGISTRY["q5_region_revenue"].fn(spark, sf_dir))
    assert facts["broadcast_joins"] >= 4  # all five dims broadcast
    assert facts["sort_merge_joins"] == 0
    # the date filter reaches the parquet scan
    assert any("o_orderdate" in f for f in facts["pushed_filters"])
    # lineitem scan is pruned to the consumed columns only
    li = [s for s in facts["read_schemas"] if "l_extendedprice" in s]
    assert li and "l_comment" not in li[0]


def test_q1_scan_prunes_columns(spark, sf_dir):
    facts = plan_facts(REGISTRY["q1_pricing_summary"].fn(spark, sf_dir))
    scans = [s for s in facts["read_schemas"] if "l_quantity" in s]
    assert scans and all("l_comment" not in s for s in scans)
    # codegen ids only annotate the AQE final plan post-execution,
    # so plan_facts' codegen_stages is best-effort; the agg itself
    # must be a single-exchange hash aggregate
    assert facts["n_exchanges"] <= 2


def test_exact_dedup_single_exchange(spark, sf_dir):
    facts = plan_facts(REGISTRY["exact_dedup"].fn(spark, sf_dir))
    # one shuffle for the groupBy + one for the final orderBy — no
    # hidden extra exchanges
    assert facts["n_exchanges"] <= 3


def test_salted_agg_matches_direct(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    direct = (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
        .collect()
    )
    salted = (
        salted_agg(
            e,
            ["event_type"],
            {"n": ("event_id", "count"), "max_value": ("value", "max")},
            n_salts=8,
        )
        .orderBy("event_type")
        .collect()
    )
    assert [(r.event_type, r.n, r.max_value) for r in direct] == [
        (r.event_type, r.n, r.max_value) for r in salted
    ]


def test_explode_hot_keys_join_parity(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(100)] + [("cold", 1), ("cold2", 2)],
        "k string, v int",
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("cold2", "D")], "k string, tag string"
    )
    hot = spark.createDataFrame([("hot",)], "k string")
    big_s, small_s = explode_hot_keys(big, small, ["k"], hot, n_salts=4)
    salted = big_s.join(small_s, ["k", "__salt"]).select("k", "v", "tag")
    plain = big.join(small, "k").select("k", "v", "tag")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path_factory):
    """Bucketing both join sides on the key pre-shuffles data at
    write time — the join then plans with ZERO Exchange nodes. At
    100 TB this converts every repeated fact-fact join on the same
    key from a full shuffle into a local merge (the Spark analogue
    of the reference's per-key dict partitioning)."""
    base = str(tmp_path_factory.mktemp("buckets"))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", base + "/orders_b").mode("overwrite").saveAsTable("orders_b"))
    (l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", base + "/lineitem_b").mode("overwrite").saveAsTable("lineitem_b"))
    try:
        ob = spark.table("orders_b").hint("merge")
        lb = spark.table("lineitem_b")
        joined = ob.join(lb, F.col("o_orderkey") == F.col("l_orderkey"))
        facts = plan_facts(joined)
        assert facts["sort_merge_joins"] == 1
        assert facts["n_exchanges"] == 0, facts
        # and it still computes the right thing
        n = joined.count()
        expected = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert n == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
