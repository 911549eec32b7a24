"""Wave-12 semantics: multi-touch credit conservation, inverted-index
shard bounds, and batch parity for the native stream-stream interval
join. Oracle parity for the two registered queries is covered by the
registry-wide sweep in test_oracle_parity.py."""

from __future__ import annotations

import pytest

from pyspark.sql import Window, functions as F

from ingestor_etl_spark.queries import load_all

REG = load_all()


def test_multitouch_credit_is_conserved(spark, sf_dir):
    """Each conversion's credits must sum to ~1.0 (exactly 1.0 for
    n=1, n=2, and whenever 0.2/(n-2) rounds cleanly), so total
    attributed revenue never exceeds total convertible revenue."""
    from ingestor_etl_spark.catalog import load_table
    from ingestor_etl_spark.queries.events_ops import (
        ATTRIB_CHANNELS,
        ATTRIB_LOOKBACK_US,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    carry = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts_us"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_conv = F.col("event_type") == "purchase"
    touches = (
        e.select(
            "*",
            F.last(F.when(is_conv, F.col("event_id")), ignorenulls=True)
            .over(carry).alias("conv_id"),
            F.last(F.when(is_conv, F.col("ts_us")), ignorenulls=True)
            .over(carry).alias("conv_ts_us"),
        )
        .where(
            F.col("event_type").isin(*ATTRIB_CHANNELS)
            & F.col("conv_id").isNotNull()
            & (F.col("conv_ts_us") - F.col("ts_us") <= ATTRIB_LOOKBACK_US)
        )
    )
    pos = Window.partitionBy("conv_id").orderBy("ts_us", "event_id")
    sized = Window.partitionBy("conv_id")
    per_conv = (
        touches.select(
            "conv_id",
            F.row_number().over(pos).alias("rn"),
            F.count(F.lit(1)).over(sized).alias("n"),
        )
        .select(
            "conv_id",
            F.when(F.col("n") == 1, 1.0)
            .when(F.col("n") == 2, 0.5)
            .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), 0.4)
            .otherwise(0.2 / (F.col("n") - 2))
            .alias("credit"),
        )
        .groupBy("conv_id")
        .agg(F.sum("credit").alias("total"))
        .collect()
    )
    assert per_conv
    for r in per_conv:
        assert abs(r.total - 1.0) < 1e-6, f"conv {r.conv_id}: {r.total}"


def test_inverted_index_shards_bound_posting_lists(spark, sf_dir):
    """No (term, shard) posting list may exceed ceil(df/1) obviously;
    the real check: per-term max shard posting count stays near
    df/INDEX_SHARDS (hash balance), and shard ids cover [0, n)."""
    from ingestor_etl_spark.queries.training_ops import INDEX_SHARDS

    rows = REG["inverted_index_shards"].fn(spark, sf_dir).collect()
    assert rows
    assert all(0 <= r.shard_id < INDEX_SHARDS for r in rows)
    by_term: dict[str, list] = {}
    for r in rows:
        by_term.setdefault(r.term, []).append(r.n_docs)
    for term, counts in by_term.items():
        df = sum(counts)
        if df >= 4 * INDEX_SHARDS:
            assert max(counts) <= 3 * df / INDEX_SHARDS, (
                f"shard imbalance for {term}: {counts}"
            )


@pytest.mark.slow
def test_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """availableNow processing of the events table through the
    native stream-stream interval join must equal the equivalent
    batch join (same predicate) — the state machinery cannot drop
    or duplicate pairs on a bounded input."""
    from ingestor_etl_spark.catalog import load_table
    from ingestor_etl_spark.streaming.pipeline import stream_interval_join

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    clicks_dir, purch_dir = str(tmp_path / "c"), str(tmp_path / "p")
    e.where(F.col("event_type") == "click").write.parquet(clicks_dir)
    e.where(F.col("event_type") == "purchase").write.parquet(purch_dir)

    schema = "event_id long, user_id long, event_type string, ts timestamp"
    cs = spark.readStream.schema(schema).parquet(clicks_dir)
    ps = spark.readStream.schema(schema).parquet(purch_dir)
    out_dir = str(tmp_path / "out")
    q = (
        stream_interval_join(cs, ps)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.left_event_id, r.right_event_id)
        for r in spark.read.parquet(out_dir).collect()
    }

    c = spark.read.parquet(clicks_dir).alias("l")
    p = spark.read.parquet(purch_dir).alias("r")
    batch = c.join(
        p,
        F.expr(
            "l.user_id = r.user_id AND r.ts >= l.ts "
            "AND r.ts <= l.ts + interval 10 minutes"
        ),
    ).select(
        F.col("l.event_id").alias("a"), F.col("r.event_id").alias("b")
    )
    expected = {(r.a, r.b) for r in batch.collect()}
    assert got == expected
    assert expected, "no joined pairs — fixture degenerate"
