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
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS within_bound
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("sketch", "hll", "approx"),
)
def sketch_distinct_users(spark, sf_dir):
    """HLL++ distinct-user estimate per event type, with a
    deterministic oracle surface: the query ALSO computes the exact
    count and emits ``within_bound`` = the sketch landed within its
    error budget (max(1, 5% of exact) — rsd=0.01 gives well under
    that). The oracle asserts the exact values and
    ``within_bound = true``; the approx column itself is
    estimator-specific and stays out of the projection. At 100 TB
    you drop the exact column and keep only the sketch — fixed-size
    mergeable per-partition state, no shuffle of the key space."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "within_bound",
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.lit(1.0), F.col("exact_users") * 0.05),
        )
        .select("event_type", "exact_users", "n_events", "within_bound")
        .orderBy("event_type")
    )


@register(
    "sketch_value_quantiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50_exact,
           round(quantile_cont(value, 0.95), 4) AS p95_exact,
           round(quantile_cont(value, 0.99), 4) AS p99_exact,
           TRUE AS within_bound
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("sketch", "quantile", "approx"),
)
def sketch_value_quantiles(spark, sf_dir):
    """Approximate p50/p95/p99 per event type via percentile_approx
    (Greenwald-Khanna sketch — mergeable, bounded memory; the 100 TB
    answer to percentiles), with a deterministic oracle surface: the
    query also computes the exact interpolated percentiles and emits
    ``within_bound`` = every approx value within 5% (plus epsilon)
    of its exact counterpart. The oracle asserts exact values and
    ``within_bound = true``. At 100 TB the exact columns drop and
    only the sketch runs."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("e50"),
        F.percentile("value", F.lit(0.95)).alias("e95"),
        F.percentile("value", F.lit(0.99)).alias("e99"),
        F.percentile_approx("value", 0.5, 10000).alias("a50"),
        F.percentile_approx("value", 0.95, 10000).alias("a95"),
        F.percentile_approx("value", 0.99, 10000).alias("a99"),
    )

    def ok(a, ex):
        return F.abs(F.col(a) - F.col(ex)) <= F.greatest(
            F.abs(F.col(ex)) * 0.05, F.lit(1e-6)
        )

    return (
        agg.withColumn(
            "within_bound", ok("a50", "e50") & ok("a95", "e95") & ok("a99", "e99")
        )
        .select(
            "event_type",
            F.round("e50", 4).alias("p50_exact"),
            F.round("e95", 4).alias("p95_exact"),
            F.round("e99", 4).alias("p99_exact"),
            "within_bound",
        )
        .orderBy("event_type")
    )


# ------------------------------------------------------ events_gapfill
GAPFILL_USERS = 10  # bound the demo output; the operator itself is per-user


@register(
    "events_gapfill",
    oracle=f"""
    WITH e AS (
      SELECT user_id, date_trunc('hour', ts) AS hr, ts, event_id, value
      FROM events WHERE user_id < {GAPFILL_USERS}
    ),
    hourly AS (
      SELECT user_id, hr, value AS hr_value
      FROM (SELECT user_id, hr, value,
                   row_number() OVER (PARTITION BY user_id, hr
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM e)
      WHERE rn = 1
    ),
    spans AS (
      SELECT user_id, min(hr) AS lo, max(hr) AS hi FROM e GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      FROM spans
    )
    SELECT g.user_id, epoch_us(g.hr) AS hr_us,
           last_value(h.hr_value IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_value,
           (h.hr_value IS NOT NULL) AS is_observed
    FROM grid g LEFT JOIN hourly h USING (user_id, hr)
    ORDER BY user_id, hr_us
    """,
    tags=("timeseries", "gapfill", "window"),
)
def events_gapfill(spark, sf_dir):
    """Time-series gap-fill: resample each user's event stream onto a
    dense hourly grid between their first and last event, carrying
    the last observed value forward across empty hours (the classic
    metrics/IoT "resample + ffill" operator; reference sigshark.py
    emits only observed frames — this is the beyond-reference
    analytic surface).

    Plan shape: one per-user aggregation picks the span, `sequence()`
    explodes it into the grid (bounded by the time span in hours, not
    the row count), a left join keyed on (user_id, hr) attaches the
    per-hour closing value, and `last(ignorenulls)` forward-fills.
    Every stage shuffles on user_id only — the grid explode, join and
    fill window share one exchange. At 100 TB the grid is metadata-
    sized (users × hours), never a multiple of the event volume, and
    skew is bounded because a user's grid grows with wall-clock span,
    not event count. The per-hour closing value is picked by
    row_number (ts DESC, event_id DESC) — deterministic under the
    unique event_id tiebreak, exact in both engines (raw double
    passthrough, no aggregation arithmetic)."""
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < GAPFILL_USERS)
        .select("user_id", F.date_trunc("hour", "ts").alias("hr"), "ts", "event_id", "value")
    )
    rn = Window.partitionBy("user_id", "hr").orderBy(F.desc("ts"), F.desc("event_id"))
    hourly = (
        e.withColumn("rn", F.row_number().over(rn))
        .where(F.col("rn") == 1)
        .select("user_id", "hr", F.col("value").alias("hr_value"))
    )
    grid = (
        e.groupBy("user_id")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
        )
    )
    fill = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hr"], "left")
        .select(
            "user_id",
            F.unix_micros("hr").alias("hr_us"),
            F.last("hr_value", ignorenulls=True).over(fill).alias("filled_value"),
            F.col("hr_value").isNotNull().alias("is_observed"),
        )
        .orderBy("user_id", "hr_us")
    )


# -------------------------------------------------- cms_heavy_hitters
CMS_DEPTH = 3  # independent hash rows
CMS_WIDTH = 64  # buckets per row
CMS_TOPK = 20  # probe tokens = exact top-k (demo surface)


def _cms_bucket_sql(tok: str, j: str) -> str:
    return (
        f"CAST('0x' || substr(md5({j} || ':' || {tok}), 1, 8) AS BIGINT) % {CMS_WIDTH}"
    )


@register(
    "cms_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), ' +')) AS w FROM documents
    ),
    exact AS (SELECT w, count(*) AS exact_n FROM toks GROUP BY w),
    probes AS (
      SELECT w, exact_n,
             row_number() OVER (ORDER BY exact_n DESC, w) AS rnk
      FROM exact QUALIFY rnk <= {CMS_TOPK}
    ),
    cells AS (
      SELECT j, {_cms_bucket_sql('w', 'j')} AS bucket, count(*) AS cnt
      FROM toks, (SELECT unnest([0, 1, 2]) AS j)
      GROUP BY 1, 2
    ),
    est AS (
      SELECT p.w, p.exact_n, p.rnk, min(c.cnt) AS cms_n
      FROM probes p
      CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) h
      JOIN cells c
        ON c.j = h.j AND c.bucket = {_cms_bucket_sql('p.w', 'h.j')}
      GROUP BY 1, 2, 3
    )
    SELECT w AS token, exact_n, cms_n, cms_n - exact_n AS overcount, rnk
    FROM est ORDER BY rnk
    """,
    tags=("sketch", "count-min", "heavy-hitters"),
)
def cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters: a depth-{d} × width-{w} CMS
    over the corpus token stream, probed with the exact top-{k}
    tokens so the oracle can check the estimator cell-for-cell
    (deterministic md5 row hashes — both engines compute identical
    buckets, so the sketch is engine-exact, not just "close").

    Plan shape and the 100 TB story: the sketch is ONE aggregation
    with {d}·{w} = {cells} cells of mergeable state — map-side
    combine reduces every partition to ≤{cells} rows regardless of
    input size, which is the point: exact heavy-hitter counting
    shuffles the full token keyspace, the CMS shuffles a constant.
    CMS guarantees estimate ≥ true count (overcount ≥ 0 — asserted
    in tests), with overestimate bounded by the row-collision mass.
    The exact side here is the verification surface; at scale it
    drops and probes come from the application (the sketch also
    merges across streaming micro-batches unchanged)."""
    from ingestor_etl_spark.plans.layout import materialize

    # Round 13 (guide §2.1): the token stream feeds both the exact
    # counter and the sketch-cell builder — materialized so the
    # tokenize+explode pass runs once. Repartition BEFORE the explode
    # (the _shingled layout fix, guide §2.5): documents.parquet is one
    # row group → one task, and the downstream 3·|tokens| md5 bucket
    # hashes would otherwise run on a single core off the
    # single-partition cache.
    toks = materialize(
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(F.explode(F.split(F.trim("text"), r" +")).alias("w"))
    )
    exact = toks.groupBy("w").agg(F.count(F.lit(1)).alias("exact_n"))
    # Top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    # partial top-k, merged on the driver) — NOT a global window over
    # the full vocabulary. The row_number below ranks the 20
    # survivors only.
    topk = exact.orderBy(F.desc("exact_n"), "w").limit(CMS_TOPK)
    probes = topk.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("exact_n"), "w"))
    )
    hashes = F.explode(F.array(*[F.lit(j) for j in range(CMS_DEPTH)])).alias("j")

    def bucket(tok_col, j_col):
        return (
            F.conv(
                F.substring(F.md5(F.concat(j_col.cast("string"), F.lit(":"), tok_col)), 1, 8),
                16,
                10,
            ).cast("long")
            % CMS_WIDTH
        )

    cells = (
        toks.select("w", hashes)
        .select("j", bucket(F.col("w"), F.col("j")).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probe_cells = probes.select("w", "exact_n", "rnk", hashes).withColumn(
        "bucket", bucket(F.col("w"), F.col("j"))
    )
    return (
        probe_cells.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("w", "exact_n", "rnk")
        .agg(F.min("cnt").alias("cms_n"))
        .select(
            F.col("w").alias("token"),
            "exact_n",
            "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("overcount"),
            "rnk",
        )
        .orderBy("rnk")
    )


cms_heavy_hitters.__doc__ = cms_heavy_hitters.__doc__.format(
    d=CMS_DEPTH, w=CMS_WIDTH, k=CMS_TOPK, cells=CMS_DEPTH * CMS_WIDTH
)


# ---------------------------------------------- rolling_zscore_outliers
ZSCORE_WINDOW = 20  # trailing rows per user
ZSCORE_MIN_N = 10  # minimum window fill before flagging
ZSCORE_SIGMA = 2  # |z| threshold


@register(
    "rolling_zscore_outliers",
    oracle=f"""
    WITH c AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    w AS (
      SELECT event_id, user_id, ts_us, cents,
             count(*) OVER win AS n,
             sum(cents) OVER win AS s,
             sum(cents * cents) OVER win AS q
      FROM c
      WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN {ZSCORE_WINDOW - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, cents,
           CAST(n AS BIGINT) AS n_window,
           round((cents * n - s) / sqrt(CAST(n * q - s * s AS DOUBLE)), 4) AS z
    FROM w
    WHERE n >= {ZSCORE_MIN_N}
      AND n * q - s * s > 0
      AND (cents * n - s) * (cents * n - s)
          > {ZSCORE_SIGMA * ZSCORE_SIGMA} * (n * q - s * s)
    ORDER BY user_id, event_id
    """,
    tags=("timeseries", "anomaly", "window"),
)
def rolling_zscore_outliers(spark, sf_dir):
    """Rolling z-score anomaly detection: flag events whose value
    deviates more than {sigma}σ from the mean of the user's trailing
    {n}-event window. The OUTLIER DECISION is all-integer — values
    become cents, and |z| > {sigma} is evaluated as
    (c·n − S)² > {sigma}²·(n·Q − S²) over BIGINT window sums — so
    the flag can never flip on float rounding and is bit-identical
    across engines; the reported z itself is one double sqrt +
    division, rounded for display.

    Plan shape: one window frame per user (the same user_id exchange
    the session/lag family uses) computing three mergeable sums;
    selectivity is applied after the frame, so the scan stays one
    pass. At 100 TB per-key state is the {n}-row frame — constant
    memory, and the same three sums run unchanged as a streaming
    stateful aggregation."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-(ZSCORE_WINDOW - 1), Window.currentRow)
    )
    w = e.select(
        "event_id",
        "user_id",
        "cents",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("cents").over(win).alias("s"),
        F.sum(F.col("cents") * F.col("cents")).over(win).alias("q"),
    )
    dev = F.col("cents") * F.col("n") - F.col("s")
    var_scaled = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return (
        w.where(
            (F.col("n") >= ZSCORE_MIN_N)
            & (var_scaled > 0)
            & (dev * dev > ZSCORE_SIGMA * ZSCORE_SIGMA * var_scaled)
        )
        .select(
            "event_id",
            "user_id",
            "cents",
            F.col("n").cast("bigint").alias("n_window"),
            F.round(dev / F.sqrt(var_scaled.cast("double")), 4).alias("z"),
        )
        .orderBy("user_id", "event_id")
    )


rolling_zscore_outliers.__doc__ = rolling_zscore_outliers.__doc__.format(
    sigma=ZSCORE_SIGMA, n=ZSCORE_WINDOW
)


# ----------------------------------------------------- sketch_shard_merge
SKETCH_SHARDS = 8


@register(
    "sketch_shard_merge",
    oracle=f"""
    SELECT CAST({SKETCH_SHARDS} AS BIGINT) AS n_shards,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bound
    FROM events
    """,
    tags=("sketch", "hll", "merge"),
)
def sketch_shard_merge(spark, sf_dir):
    """HLL sketch MERGEABILITY — the property that makes sketches
    the 100 TB distinct-count answer: each shard (simulated via
    user_id-hash buckets, standing in for files/partitions) builds
    its own Datasketches HLL of user_id; the global estimate comes
    from hll_union_agg over the 8 serialized sketches, never from
    re-reading rows. The oracle surface follows the
    sketch_distinct_users convention: the query also computes the
    exact distinct count and asserts the merged estimate lands
    within 5% (rsd bound), so the comparison is deterministic while
    the estimator itself stays approximate.

    At 100 TB: per-file sketches persist as table metadata
    (kilobytes each), incremental ingest unions the new file's
    sketch in O(1), and the full-table distinct query never scans —
    the merge tree here is that exact dataflow."""
    e = load_table(spark, sf_dir, "events")
    shard = (F.col("event_id") % SKETCH_SHARDS).alias("shard")
    per_shard = e.groupBy(shard).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("shard_exact"),
    )
    merged = per_shard.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shards"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = e.agg(F.count_distinct("user_id").cast("bigint").alias("exact_users"))
    j = merged.crossJoin(F.broadcast(exact))
    return j.select(
        "n_shards",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= F.greatest(F.col("exact_users") * 0.05, F.lit(1.0))
        ).alias("within_bound"),
    )


# --------------------------------------------------------- zorder_layout
ZORDER_DIM_BITS = 6  # 6 bits per dimension → 4096 z-values
ZORDER_FILES = 16  # simulated output files (z-range partitions)


def _interleave_sql(bx: str, by: str) -> str:
    terms = []
    for i in range(ZORDER_DIM_BITS):
        terms.append(f"((({bx} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({by} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


@register(
    "zorder_layout",
    oracle=f"""
    WITH b AS (
      SELECT event_id,
             CAST(user_id % 64 AS BIGINT) AS bx,
             CAST(CAST(round(value * 100) AS BIGINT) % 64 AS BIGINT) AS by
      FROM events
    ),
    z AS (
      SELECT event_id, bx, by,
             CAST({_interleave_sql('bx', 'by')} AS BIGINT) AS zval
      FROM b
    )
    SELECT CAST(zval // {4096 // ZORDER_FILES} AS BIGINT) AS file_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(bx) AS BIGINT) AS min_bx, CAST(max(bx) AS BIGINT) AS max_bx,
           CAST(min(by) AS BIGINT) AS min_by, CAST(max(by) AS BIGINT) AS max_by
    FROM z GROUP BY 1 ORDER BY file_id
    """,
    tags=("layout", "zorder", "data-skipping"),
)
def zorder_layout(spark, sf_dir):
    """Z-order (Morton-curve) clustering layout: interleave the bits
    of two dimension buckets (user bucket × value bucket) into one
    sort key and range-partition rows into files along it. The
    output is the per-file zone map over BOTH dimensions — the
    payoff of z-ordering: every file covers a small rectangle, so
    min/max skipping prunes on user-predicates AND value-predicates
    from one layout (a single-column sort gives skipping on one
    dimension only; zone_map_prune shows that baseline).

    Plan shape: the z-value is a pure bit-arithmetic narrow pass;
    the file assignment here derives from fixed z-ranges (at scale:
    repartitionByRange(z) before the write, the same shuffle any
    sorted write pays); the zone-map report is one bounded-key
    aggregation. Every step is engine-exact integer math."""
    e = load_table(spark, sf_dir, "events")
    b = e.select(
        "event_id",
        (F.col("user_id") % 64).cast("bigint").alias("bx"),
        (F.round(F.col("value") * 100).cast("bigint") % 64)
        .cast("bigint")
        .alias("by"),
    )
    z = b.withColumn("zval", F.expr(_interleave_sql("bx", "by")).cast("bigint"))
    return (
        z.groupBy(
            (F.col("zval") / (4096 // ZORDER_FILES)).cast("bigint").alias("file_id")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("bx").cast("bigint").alias("min_bx"),
            F.max("bx").cast("bigint").alias("max_bx"),
            F.min("by").cast("bigint").alias("min_by"),
            F.max("by").cast("bigint").alias("max_by"),
        )
        .orderBy("file_id")
    )


# ------------------------------------------------------------ window_zoo
@register(
    "window_zoo",
    oracle="""
    SELECT event_id, user_id,
           ntile(4) OVER wv AS quartile,
           round(percent_rank() OVER wv, 6) AS pct_rank,
           round(cume_dist() OVER wv, 6) AS cdist,
           first_value(event_id) OVER wt AS first_eid,
           nth_value(event_id, 2) OVER wt AS second_eid,
           last_value(event_id) OVER wt AS last_eid_sofar,
           lead(event_id, 1, -1) OVER wt AS next_eid,
           lag(event_id, 2) OVER wt AS prev2_eid
    FROM events
    WHERE user_id < 15
    WINDOW
      wv AS (PARTITION BY user_id ORDER BY value DESC, event_id),
      wt AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    tags=("window", "sql-surface"),
)
def window_zoo(spark, sf_dir):
    """The remaining ANSI window-function surface in one query:
    ntile, percent_rank, cume_dist (value-ranked window) and
    first/nth/last_value, lead-with-default, multi-offset lag
    (time-ordered running frame). Two window specs only — Spark
    computes all nine functions with two sorts on ONE user_id
    exchange (the partition key is shared, so the exchange is
    reused; plan-checked in PLANS.md). Deterministic under the
    event_id tiebreak in both orderings; percent_rank/cume_dist are
    exact rationals rounded identically on both engines."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 15)
    wv = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    wt = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.ntile(4).over(wv).alias("quartile"),
            F.round(F.percent_rank().over(wv), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(wv), 6).alias("cdist"),
            F.first("event_id").over(wt).alias("first_eid"),
            F.nth_value("event_id", 2).over(wt).alias("second_eid"),
            F.last("event_id").over(wt).alias("last_eid_sofar"),
            F.lead("event_id", 1, -1).over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ).alias("next_eid"),
            F.lag("event_id", 2).over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ).alias("prev2_eid"),
        )
        .orderBy("user_id", "event_id")
    )


# ----------------------------------------------------- order_status_aging
@register(
    "order_status_aging",
    oracle="""
    WITH anchor AS (
      SELECT max(epoch_us(o_orderdate) // 86400000000) AS max_day FROM orders
    ),
    aged AS (
      SELECT o_orderstatus,
             least((a.max_day - epoch_us(o_orderdate) // 86400000000) // 30, 6)
               AS age_bucket_months,
             o_totalprice
      FROM orders CROSS JOIN anchor a
    )
    SELECT o_orderstatus,
           CAST(age_bucket_months AS INTEGER) AS age_bucket_months,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS total_value
    FROM aged
    GROUP BY o_orderstatus, age_bucket_months
    ORDER BY o_orderstatus, age_bucket_months
    """,
    tags=("warehouse", "aging", "reporting"),
)
def order_status_aging(spark, sf_dir):
    """Order-backlog aging report: per (status, 30-day age bucket,
    capped at 6+) order counts and decimal-exact value — the aging
    matrix an operations dashboard reads daily. The anchor date is
    the data's own max order day (deterministic, no wall clock), age
    arithmetic is integer epoch days, and values sum through
    DECIMAL so both engines agree bitwise. One 1-row anchor
    broadcast + one map-side-combined aggregation over a
    |status|×7 key space."""
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(
        F.expr("max(unix_micros(cast(o_orderdate as timestamp)) div 86400000000)").alias("max_day")
    )
    aged = o.crossJoin(F.broadcast(anchor)).select(
        "o_orderstatus",
        F.least(
            (
                F.col("max_day")
                - F.expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            )
            / F.lit(30),
            F.lit(6),
        )
        .cast("long")
        .alias("age_bucket_months_raw"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("v"),
    )
    return (
        aged.groupBy(
            "o_orderstatus",
            F.col("age_bucket_months_raw").alias("age_bucket_months"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("v").cast("decimal(18,2)").cast("double").alias("total_value"),
        )
        .select(
            "o_orderstatus",
            F.col("age_bucket_months").cast("int").alias("age_bucket_months"),
            F.col("n_orders").cast("bigint").alias("n_orders"),
            "total_value",
        )
        .orderBy("o_orderstatus", "age_bucket_months")
    )


# ----------------------------------------------------- supplier_lead_time
@register(
    "supplier_lead_time",
    oracle="""
    WITH lt AS (
      SELECT l.l_suppkey,
             epoch_us(l.l_shipdate) // 86400000000
               - epoch_us(o.o_orderdate) // 86400000000 AS lead_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT s.s_name,
           CAST(count(*) AS BIGINT) AS n_shipments,
           CAST(min(lead_days) AS BIGINT) AS min_days,
           CAST(max(lead_days) AS BIGINT) AS max_days,
           CAST(sum(lead_days) AS BIGINT) AS total_days,
           sum(lead_days) / CAST(count(*) AS DOUBLE) AS avg_days
    FROM lt JOIN supplier s ON s.s_suppkey = lt.l_suppkey
    GROUP BY s.s_name ORDER BY s.s_name
    """,
    tags=("analytics", "supply-chain", "lead-time"),
)
def supplier_lead_time(spark, sf_dir):
    """Per-supplier order→ship lead-time distribution (min/max/avg
    days) — the supply-chain SLA report. Lead time is an integer
    epoch-day difference (the UTC-session cast reads the same wall
    clock DuckDB's epoch_us sees), sums are BIGINT, and the average
    is a single int/int double division — no rounding step to
    diverge. Plan: one fact-fact join on the orderkey, one
    aggregation on the supplier key, the small supplier dimension
    joined after aggregation (dim rows × 1, broadcastable at any
    scale)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000").alias(
            "ship_day"
        ),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").alias(
            "order_day"
        ),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lt = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_suppkey", (F.col("ship_day") - F.col("order_day")).alias("lead_days")
    )
    agg = lt.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_shipments"),
        F.min("lead_days").alias("min_days"),
        F.max("lead_days").alias("max_days"),
        F.sum("lead_days").alias("total_days"),
    )
    return (
        agg.join(F.broadcast(s), agg.l_suppkey == s.s_suppkey)
        .select(
            "s_name",
            F.col("n_shipments").cast("bigint").alias("n_shipments"),
            F.col("min_days").cast("bigint").alias("min_days"),
            F.col("max_days").cast("bigint").alias("max_days"),
            F.col("total_days").cast("bigint").alias("total_days"),
            (F.col("total_days") / F.col("n_shipments").cast("double")).alias(
                "avg_days"
            ),
        )
        .orderBy("s_name")
    )


# ------------------------------------------------------- clv_by_cohort
@register(
    "clv_by_cohort",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(epoch_us(o_orderdate) // 86400000000 // 30) AS cohort_month
      FROM orders GROUP BY o_custkey
    ),
    spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
               AS lifetime_value,
             count(*) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT f.cohort_month,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(s.n_orders) AS BIGINT) AS n_orders,
           CAST(CAST(sum(s.lifetime_value) AS DECIMAL(20,2)) AS DOUBLE)
             AS total_value,
           round(CAST(CAST(sum(s.lifetime_value) AS DECIMAL(20,2)) AS DOUBLE)
                 / count(*), 6) AS avg_clv
    FROM firsts f JOIN spend s USING (o_custkey)
    GROUP BY f.cohort_month ORDER BY f.cohort_month
    """,
    tags=("analytics", "ltv", "cohort"),
)
def clv_by_cohort(spark, sf_dir):
    """Customer lifetime value by acquisition cohort: customers
    bucketed by the 30-epoch-day month of their FIRST order, with
    cohort size, order counts, and decimal-exact total/average
    lifetime value — the LTV table growth analytics is built on.
    Both per-customer passes (first-touch min and decimal spend sum)
    share the o_custkey exchange; the cohort rollup aggregates the
    customer-sized relation. Integer month bucketing (epoch days //
    30), no calendar semantics to diverge."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000 div 30"
        ).alias("omonth"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("v"),
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.min("omonth").alias("cohort_month"),
        F.sum("v").cast("decimal(18,2)").alias("lifetime_value"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        per_cust.groupBy("cohort_month")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("lifetime_value").cast("decimal(20,2)").alias("tv"),
        )
        .select(
            "cohort_month",
            F.col("n_customers").cast("bigint").alias("n_customers"),
            "n_orders",
            F.col("tv").cast("double").alias("total_value"),
            F.round(
                F.col("tv").cast("double") / F.col("n_customers"), 6
            ).alias("avg_clv"),
        )
        .orderBy("cohort_month")
    )
