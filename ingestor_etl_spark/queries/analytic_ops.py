"""Analytic-function coverage: window navigation, pivot, sketches.

Window running totals exist in relational.py; this module adds the
navigation family (lag / rank / dense_rank over event streams),
PIVOT (wide conditional aggregation — the DataFrame ``pivot`` API
with an explicit value list, which is the only scalable form: an
unlisted pivot needs a driver-side distinct pass first), and
approximate sketch aggregates (HLL distinct counts, approximate
quantiles).

Sketches are registered WITHOUT a SQL oracle — their outputs are
estimator-specific by design (a DuckDB HLL would disagree with
Spark's), so the driver records the weaker rows-only check and
tests/test_analytic_ops.py asserts the estimates against exact
values within the estimator's error bound instead.

Scale notes (100 TB): lag/rank shuffle once on the partition key
(user_id) — same exchange the sessionize family uses; pivot with a
fixed value list is one aggregate (no extra pass); HLL/quantile
sketches are the *right* distinct/percentile tools at 100 TB —
exact distinct is a full shuffle of the key space, the sketch is a
fixed-size mergeable state per partition.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "window_event_navigation",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
           epoch_us(LAG(ts) OVER w) AS prev_ts_us,
           epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us,
           RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)
             AS value_rank,
           DENSE_RANK() OVER (PARTITION BY user_id ORDER BY event_type)
             AS type_rank
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, ts_us, event_id
    """,
    tags=("window", "navigation"),
)
def window_event_navigation(spark, sf_dir):
    """Window navigation family: per-user previous-event timestamp
    (lag), inter-event gap, rank by value, dense_rank by type. All
    four windows share the user_id partition key → one exchange."""
    e = load_table(spark, sf_dir, "events").where("user_id < 20")
    w_time = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_value = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    w_type = Window.partitionBy("user_id").orderBy("event_type")
    ts_us = F.unix_micros("ts")
    prev_us = F.unix_micros(F.lag("ts").over(w_time))
    return (
        e.select(
            "event_id",
            "user_id",
            ts_us.alias("ts_us"),
            "event_type",
            prev_us.alias("prev_ts_us"),
            (ts_us - prev_us).alias("gap_us"),
            F.rank().over(w_value).alias("value_rank"),
            F.dense_rank().over(w_type).alias("type_rank"),
        )
        .orderBy("user_id", "ts_us", "event_id")
    )


@register(
    "pivot_user_event_matrix",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("pivot",),
)
def pivot_user_event_matrix(spark, sf_dir):
    """User × event-type count matrix via the DataFrame pivot API
    with an explicit value list (the scalable form — no driver-side
    distinct pass; the oracle states the equivalent conditional
    aggregation). One aggregate, one shuffle on user_id."""
    e = load_table(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    renamed = out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES]
    )
    return renamed.orderBy("user_id")


@register(
    "retention_cohorts",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ), active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
    )
    SELECT epoch_us(cohort_week) AS cohort_week_us,
           epoch_us(act_week) AS act_week_us,
           COUNT(*) AS n_users
    FROM first_seen JOIN active USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("retention", "cohort", "datetime"),
)
def retention_cohorts(spark, sf_dir):
    """Weekly retention matrix: users bucketed by first-seen week
    (ISO Monday truncation — identical in Spark and DuckDB), counted
    in every week they were active. Both aggregates share the
    user_id exchange; the matrix is cohorts x weeks — tiny."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = e.select("user_id", F.date_trunc("week", "ts").alias("act_week")).distinct()
    return (
        first_seen.join(active, "user_id")
        .groupBy(
            F.unix_micros("cohort_week").alias("cohort_week_us"),
            F.unix_micros("act_week").alias("act_week_us"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week_us", "act_week_us")
    )


@register(
    "interval_join_events",
    oracle="""
    WITH w AS (
        SELECT event_id AS win_id, ts AS win_start,
               ts + INTERVAL 30 MINUTE AS win_end
        FROM events WHERE event_id % 97 = 0
    )
    SELECT e.event_id, w.win_id
    FROM events e JOIN w
      ON e.ts >= w.win_start AND e.ts < w.win_end
    ORDER BY e.event_id, w.win_id
    """,
    tags=("range-join", "interval"),
)
def interval_join_events(spark, sf_dir):
    """Interval (range) join: every event against every 30-minute
    window containing it (windows derived deterministically from
    every 97th event). Runs through operators/rangejoin.py's
    time-bin equi-join — NOT the BroadcastNestedLoop Spark would
    otherwise plan for a pure range predicate; the oracle states the
    naive BETWEEN join."""
    from ingestor_etl_spark.operators.rangejoin import interval_join

    e = load_table(spark, sf_dir, "events")
    points = e.select("event_id", "ts")
    windows = e.where(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("win_id"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("win_end"),
    )
    return (
        interval_join(points, windows, "ts", "win_start", "win_end", bin_width_s=1800)
        .select("event_id", "win_id")
        .orderBy("event_id", "win_id")
    )


@register(
    "sketch_distinct_users",
    oracle=None,  # estimator-specific output; see module docstring
    tags=("sketch", "hll", "approx"),
)
def sketch_distinct_users(spark, sf_dir):
    """HLL++ distinct-user estimate per event type next to the group
    size. At 100 TB this replaces exact COUNT(DISTINCT): the sketch
    is fixed-size mergeable per-partition state (no shuffle of the
    full key space). Accuracy asserted in tests against the exact
    count (rsd=0.01 → well under 5% error)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "sketch_value_quantiles",
    oracle=None,  # estimator-specific output; see module docstring
    tags=("sketch", "quantile", "approx"),
)
def sketch_value_quantiles(spark, sf_dir):
    """Approximate value quantiles (p50/p95/p99) per event type via
    percentile_approx (Greenwald-Khanna sketch — mergeable, bounded
    memory; the 100 TB answer to percentiles). Error bound asserted
    in tests against DuckDB's exact quantiles."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("p50"),
            F.percentile_approx("value", 0.95, 10000).alias("p95"),
            F.percentile_approx("value", 0.99, 10000).alias("p99"),
        )
        .orderBy("event_type")
    )
