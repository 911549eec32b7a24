"""SURVEY §2 dataflow-operator semantics over the ``events`` table.

The reference's engine-like operators — request/response correlation
(J1, diameter.py:302-339), group-wise identifier propagation (J2,
gtp_ingestor.py:42-71), sessionization (J6, sigshark.py:426-545),
transaction semi-filter (J7, sigshark.py:557-576), retransmission
dedup (O3) and processed/not_processed counters (A1/A2, §2.8) — are
declared here over the driver's ``events`` stream table so the
DuckDB oracle can check them. The reusable operator implementations
live in ``ingestor_etl_spark.operators``; these queries call them.

Scale notes: every operator keys its shuffle on (user_id[, session])
— the same partitioning the streaming variants use for keyed state,
so one exchange serves lag/session/aggregate stages. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.functions.scalar import dec
from ingestor_etl_spark.operators.correlate import correlate_full_outer
from ingestor_etl_spark.operators.enrich import propagate_group_value
from ingestor_etl_spark.operators.sessionize import sessionize
from ingestor_etl_spark.queries import register

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def _events(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))


_SQL_EVENTS = (
    "SELECT *, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events"
)


@register(
    "j1_request_response",
    oracle=f"""
    WITH e AS ({_SQL_EVENTS}),
    req AS (SELECT user_id, k, event_id AS req_event_id,
                   epoch_us(ts) AS req_ts_us, value AS req_value
            FROM e WHERE event_type = 'click'),
    res AS (SELECT user_id, k, event_id AS res_event_id,
                   epoch_us(ts) AS res_ts_us, value AS res_value
            FROM e WHERE event_type = 'purchase')
    SELECT COALESCE(req.user_id, res.user_id) AS user_id,
           COALESCE(req.k, res.k) AS k,
           req_event_id, res_event_id, req_ts_us, res_ts_us,
           COALESCE(req_value, res_value) AS enriched_value,
           (req_event_id IS NOT NULL AND res_event_id IS NOT NULL) AS matched
    FROM req FULL OUTER JOIN res USING (user_id, k)
    ORDER BY user_id, k, req_event_id, res_event_id
    """,
    tags=("correlation", "full-outer", "J1"),
)
def j1_request_response(spark, sf_dir):
    """J1: request↔response correlation as a full-outer self-join on
    the transaction key, with bidirectional value enrichment and
    unmatched leftovers emitted (diameter.py:302-339, 580-589)."""
    e = _events(spark, sf_dir)
    req = e.where(F.col("event_type") == "click").select(
        "user_id", "k",
        F.col("event_id").alias("req_event_id"),
        F.unix_micros("ts").alias("req_ts_us"),
        F.col("value").alias("req_value"),
    )
    res = e.where(F.col("event_type") == "purchase").select(
        "user_id", "k",
        F.col("event_id").alias("res_event_id"),
        F.unix_micros("ts").alias("res_ts_us"),
        F.col("value").alias("res_value"),
    )
    out = correlate_full_outer(req, res, on=["user_id", "k"], enrich={"enriched_value": ("req_value", "res_value")})
    return out.select(
        "user_id", "k", "req_event_id", "res_event_id", "req_ts_us", "res_ts_us",
        "enriched_value", "matched",
    ).orderBy("user_id", "k", "req_event_id", "res_event_id")


@register(
    "a2_unmatched_census",
    oracle=f"""
    WITH e AS ({_SQL_EVENTS}),
    req AS (SELECT user_id, k, event_id AS req_event_id
            FROM e WHERE event_type = 'click'),
    res AS (SELECT user_id, k, event_id AS res_event_id
            FROM e WHERE event_type = 'purchase'),
    j AS (SELECT req_event_id, res_event_id
          FROM req FULL OUTER JOIN res USING (user_id, k))
    SELECT CASE WHEN req_event_id IS NOT NULL AND res_event_id IS NOT NULL THEN 'matched'
                WHEN req_event_id IS NOT NULL THEN 'request_only'
                ELSE 'response_only' END AS disposition,
           COUNT(*) AS n
    FROM j GROUP BY 1 ORDER BY 1
    """,
    tags=("correlation", "A2"),
)
def a2_unmatched_census(spark, sf_dir):
    """A2: census of matched / request-only / response-only rows at
    EOF (diameter.py:469-478)."""
    e = _events(spark, sf_dir)
    req = e.where(F.col("event_type") == "click").select(
        "user_id", "k", F.col("event_id").alias("req_event_id")
    )
    res = e.where(F.col("event_type") == "purchase").select(
        "user_id", "k", F.col("event_id").alias("res_event_id")
    )
    j = correlate_full_outer(req, res, on=["user_id", "k"])
    disposition = (
        F.when(F.col("matched"), "matched")
        .when(F.col("req_event_id").isNotNull(), "request_only")
        .otherwise("response_only")
    )
    return (
        j.select(disposition.alias("disposition"))
        .groupBy("disposition")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("disposition")
    )


@register(
    "j2_group_enrich",
    oracle="""
    WITH signup AS (
      SELECT user_id, CAST(MIN(value) AS DOUBLE) AS signup_value
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.event_type, e.value, s.signup_value
    FROM events e LEFT JOIN signup s USING (user_id)
    ORDER BY e.event_id
    """,
    tags=("enrichment", "J2"),
)
def j2_group_enrich(spark, sf_dir):
    """J2: propagate a group-scoped identifier (the user's signup
    value) to every row of the group — the copy_msisdn/copy_imsi
    pattern (gtp_ingestor.py:42-71). Min-aggregate + broadcastable
    re-join; deterministic under multiple candidates."""
    e = load_table(spark, sf_dir, "events")
    out = propagate_group_value(
        e,
        group_cols=["user_id"],
        value_col="value",
        present_when=F.col("event_type") == "signup",
        out_col="signup_value",
    )
    # the oracle declares CAST(... AS DOUBLE); propagate_group_value now
    # preserves the source type, so the double cast lives here.
    out = out.withColumn("signup_value", F.col("signup_value").cast("double"))
    return out.select("event_id", "user_id", "event_type", "value", "signup_value").orderBy(
        "event_id"
    )


_SQL_SESSIONIZED = f"""
    WITH ordered AS (
      SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > {_SESSION_GAP_US}
                     THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    sessioned AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM flagged
    )
"""


@register(
    "j6_sessionize",
    oracle=f"""
    {_SQL_SESSIONIZED}
    SELECT user_id, session_no,
           MIN(epoch_us(ts)) AS session_start_us, MAX(epoch_us(ts)) AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM sessioned
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
    tags=("sessionization", "J6"),
)
def j6_sessionize(spark, sf_dir):
    """J6: gap-based sessionization (30-min inactivity), the batch
    analogue of sigshark's transaction assembly (sigshark.py:426-545)
    — lag/flag/running-sum over one (user_id) shuffle."""
    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, partition_cols=["user_id"], ts_col="ts", order_cols=["event_id"], gap_us=_SESSION_GAP_US)
    return (
        s.groupBy("user_id", "session_no")
        .agg(
            F.min(F.unix_micros("ts")).alias("session_start_us"),
            F.max(F.unix_micros("ts")).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .orderBy("user_id", "session_no")
    )


@register(
    "j7_error_sessions",
    oracle=f"""
    {_SQL_SESSIONIZED}
    , error_sessions AS (
      SELECT DISTINCT user_id, session_no FROM sessioned WHERE event_type = 'error'
    )
    SELECT s.user_id, s.session_no, COUNT(*) AS n_events,
           MIN(epoch_us(s.ts)) AS session_start_us
    FROM sessioned s
    JOIN error_sessions USING (user_id, session_no)
    GROUP BY s.user_id, s.session_no
    ORDER BY s.user_id, s.session_no
    """,
    tags=("sessionization", "semi-join", "J7"),
)
def j7_error_sessions(spark, sf_dir):
    """J7: keep whole sessions where ≥1 member row matches a
    predicate — transaction-granular left-semi join
    (sigshark.py:557-576)."""
    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, partition_cols=["user_id"], ts_col="ts", order_cols=["event_id"], gap_us=_SESSION_GAP_US)
    errors = s.where(F.col("event_type") == "error").select("user_id", "session_no").distinct()
    return (
        s.join(errors, ["user_id", "session_no"], "left_semi")
        .groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros("ts")).alias("session_start_us"),
        )
        .orderBy("user_id", "session_no")
    )


@register(
    "o3_dedup_events",
    oracle="""
    SELECT user_id, event_type, MIN(event_id) AS first_event_id,
           COUNT(*) AS n_occurrences
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
    tags=("dedup", "O3"),
)
def o3_dedup_events(spark, sf_dir):
    """O3: retransmission-style dedup — one representative (lowest
    event_id) per logical key, with the duplicate count retained
    (http_ingestor.py:412-414; diameter.py:307-309 drop semantics)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(
            F.min("event_id").alias("first_event_id"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "a1_counters",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_processed,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_not_processed
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("counters", "A1", "error-isolation"),
)
def a1_counters(spark, sf_dir):
    """A1 + §2.8: processed / not_processed counters with
    PERMISSIVE-style error isolation — a malformed props payload
    counts instead of aborting (diameter.py:454-457 semantics)."""
    e = load_table(spark, sf_dir, "events")
    bad = F.get_json_object("props", "$.k").isNull()
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_processed"),
            F.sum(F.when(bad, 1).otherwise(0)).alias("n_not_processed"),
        )
        .orderBy("event_type")
    )


@register(
    "events_hourly_rollup",
    oracle="""
    SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("aggregation", "time-rollup"),
)
def events_hourly_rollup(spark, sf_dir):
    """Event-time hourly rollup — the batch shape of the streaming
    windowed aggregation (SURVEY §2.9); JSON projection stays native
    (get_json_object)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("hour_us", "event_type")
    )


@register(
    "asof_attribution",
    oracle="""
    WITH purchases AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
        FROM events WHERE event_type = 'purchase'
    ),
    views AS (
        SELECT user_id, epoch_us(ts) AS ts_us, MAX(event_id) AS view_event_id
        FROM events WHERE event_type = 'view'
        GROUP BY 1, 2
    )
    SELECT p.user_id, p.event_id, p.ts_us,
           CAST(p.value AS DECIMAL(12,2))::DOUBLE AS purchase_value,
           v.view_event_id,
           v.ts_us AS asof_matched_ts
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts_us >= v.ts_us
    ORDER BY p.user_id, p.event_id
    """,
    tags=("join", "asof", "custom-operator"),
)
def asof_attribution(spark, sf_dir):
    """As-of join (custom operator, operators/asof.py): attribute
    each purchase to the user's latest view at-or-before it — the
    union-and-carry window plan, one shuffle on user_id, no range
    explosion. Right side pre-deduped per (user, ts) so ties are
    deterministic in both engines."""
    from ingestor_etl_spark.operators.asof import asof_join_backward

    e = _events(spark, sf_dir)
    purchases = e.where("event_type = 'purchase'").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        dec("value").cast("double").alias("purchase_value"),
    )
    views = (
        e.where("event_type = 'view'")
        .groupBy("user_id", F.unix_micros("ts").alias("ts_us"))
        .agg(F.max("event_id").alias("view_event_id"))
    )
    out = asof_join_backward(
        purchases, views, by=["user_id"], ts_col="ts_us", carry_cols=["view_event_id"]
    )
    return out.select(
        "user_id", "event_id", "ts_us", "purchase_value", "view_event_id",
        "asof_matched_ts",
    ).orderBy("user_id", "event_id")


@register(
    "events_rolling_7d",
    oracle="""
    SELECT user_id, event_id,
           COUNT(*) OVER w AS n_7d,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_7d
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    tags=("window", "range-frame", "rolling"),
)
def events_rolling_7d(spark, sf_dir):
    """Rolling 7-day per-user activity (count + value sum) via a
    RANGE window frame over event time — the interval-frame
    counterpart of the rows-frame running total
    (window_running_revenue). Ordering by unix_micros makes Spark's
    numeric rangeBetween identical to the oracle's
    ``RANGE INTERVAL 7 DAYS PRECEDING`` (same peers, both bounds
    inclusive).

    Scale: one shuffle on user_id; the frame is evaluated with a
    sliding two-pointer over each partition — no self-join, no
    explode. Skewed users are bounded by per-user event counts, not
    corpus size."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 86_400 * 1_000_000, 0)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(w).alias("n_7d"),
            F.sum(dec("value")).over(w).cast("double").alias("sum_7d"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "salted_hot_agg",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("skew", "salting", "aggregation"),
)
def salted_hot_agg(spark, sf_dir):
    """The skew toolkit as a first-class query: per-event-type
    rollup via the SALTED two-phase aggregation
    (plans/layout.salted_agg). event_type has a handful of values
    over the whole table — every key is hot by construction — so a
    naive final aggregation funnels each key into one reducer;
    phase 1 aggregates on (key, salt) spreading each hot key over 16
    reducers, phase 2 merges the 16 partials per key. Results are
    IDENTICAL to the direct groupBy (the oracle is the plain SQL):
    count merges by sum, and values are decimal partials so the
    two-phase sum is exact. This is the pattern to reach for when
    key_skew_profile reports skew_x >> 1 and AQE alone can't split a
    hot aggregation key."""
    from ingestor_etl_spark.plans.layout import salted_agg

    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("decimal(12,2)").alias("v")
    )
    out = salted_agg(
        e,
        ["event_type"],
        {"n_events": ("v", "count"), "total_value": ("v", "sum")},
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("total_value").cast("double").alias("total_value"),
    ).orderBy("event_type")


@register(
    "session_transcripts",
    oracle=f"""
    {_SQL_SESSIONIZED}
    SELECT user_id, session_no,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS transcript,
           MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span_us
    FROM sessioned
    WHERE user_id < 40
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
    tags=("sessionization", "sequence", "training-data"),
)
def session_transcripts(spark, sf_dir):
    """Behavioral-sequence assembly: each (user, session) becomes one
    ordered action transcript ('click>view>purchase…') — the
    sequence-building step that turns an event log into training
    rows for next-action / session models (the sigshark transaction
    assembly generalized from frames to ML sequences).

    Plan shape: sessionization (lag/flag/running-sum) and the
    transcript aggregation all key on user_id — one exchange end to
    end. Ordering inside a session is made engine-exact without any
    per-row sort task: Spark collects (ts, event_id, type) structs
    per session and array_sorts WITHIN each group (bounded by
    session length, the same per-key-state bound the streaming
    variant has), matching the oracle's ORDER BY inside
    string_agg."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    s = sessionize(
        e,
        partition_cols=["user_id"],
        ts_col="ts",
        order_cols=["event_id"],
        gap_us=_SESSION_GAP_US,
    )
    ordered_types = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("t"),
                    F.col("event_id").alias("eid"),
                    F.col("event_type").alias("et"),
                )
            )
        ),
        lambda st: st["et"],
    )
    return (
        s.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(ordered_types, ">").alias("transcript"),
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
                "span_us"
            ),
        )
        .orderBy("user_id", "session_no")
    )


@register(
    "salted_skew_join",
    oracle="""
    WITH f AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS hk,
             CAST(value AS DECIMAL(12,2)) AS v
      FROM events
    ),
    dim AS (
      SELECT DISTINCT hk,
             CAST('0x' || substr(md5(CAST(hk AS VARCHAR)), 1, 8) AS BIGINT)
               % 1000 AS dim_code
      FROM f
    )
    SELECT f.hk, CAST(count(*) AS BIGINT) AS n_events,
           CAST(CAST(sum(f.v) AS DECIMAL(16,2)) AS DOUBLE) AS total_value,
           MAX(d.dim_code) AS dim_code
    FROM f JOIN dim d ON f.hk = d.hk
    GROUP BY f.hk ORDER BY f.hk
    """,
    tags=("join", "skew", "salting"),
)
def salted_skew_join(spark, sf_dir):
    """Skew-join salting as a registered, oracle-checked query: half
    the fact rows collapse onto one hot key (every even user → key
    0), which in a plain hash join lands ~50% of the table on ONE
    task. The query detects hot keys with a cheap stats pass
    (count > 10% of rows), salts the fact side across 8 salts,
    replicates only the HOT dimension rows across those salts
    (plans/layout.salt_join), joins on (key, salt), and aggregates
    back — the result is bit-identical to the plain join (the
    oracle runs the plain join) while the physical work spreads
    across salt tasks. This is the AQE-skew-join fallback pattern
    for when the skewed side feeds a window or AQE is off; at 100 TB
    the hot list is a broadcast of a handful of keys."""
    from ingestor_etl_spark.plans.layout import explode_hot_keys

    e = load_table(spark, sf_dir, "events")
    f = e.select(
        F.when(F.col("user_id") % 2 == 0, 0)
        .otherwise(F.col("user_id"))
        .alias("hk"),
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    dim = f.select("hk").distinct().select(
        "hk",
        (
            F.conv(F.substring(F.md5(F.col("hk").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % 1000
        ).alias("dim_code"),
    )
    n_rows = f.count()
    hot = (
        f.groupBy("hk")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > n_rows / 10)
        .select("hk")
    )
    big_s, small_s = explode_hot_keys(f, dim, ["hk"], hot)
    return (
        big_s.join(small_s, ["hk", "__salt"])
        .groupBy("hk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("v").cast("decimal(16,2)").cast("double").alias("total_value"),
            F.max("dim_code").alias("dim_code"),
        )
        .orderBy("hk")
    )


FREQUENT_PATHS_TOPK = 20


@register(
    "frequent_paths",
    oracle=f"""
    {_SQL_SESSIONIZED}
    , transcripts AS (
      SELECT user_id, session_no,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS transcript
      FROM sessioned GROUP BY user_id, session_no
    ),
    counted AS (
      SELECT transcript, CAST(count(*) AS BIGINT) AS n_sessions
      FROM transcripts GROUP BY transcript
    )
    SELECT transcript, n_sessions,
           row_number() OVER (ORDER BY n_sessions DESC, transcript) AS rnk
    FROM counted
    QUALIFY rnk <= {FREQUENT_PATHS_TOPK}
    ORDER BY rnk
    """,
    tags=("sessionization", "sequence", "mining"),
)
def frequent_paths(spark, sf_dir):
    """Frequent-path mining: the top-{k} most common whole-session
    action sequences across every user — the path-analysis /
    behavioral-motif query product analytics runs on the transcript
    relation (and, for LLM pipelines, the duplicate-trajectory
    census before training on agent traces).

    Plan shape: sessionize + in-group transcript assembly share the
    user_id exchange (same as session_transcripts); the path census
    is a map-side-combined aggregation on the transcript string, and
    the top-{k} uses orderBy+limit (TakeOrderedAndProject — partial
    per-partition top-k, no global-window hot task); the 20
    survivors re-rank in a trivially bounded window."""
    e = load_table(spark, sf_dir, "events")
    s = sessionize(
        e,
        partition_cols=["user_id"],
        ts_col="ts",
        order_cols=["event_id"],
        gap_us=_SESSION_GAP_US,
    )
    ordered_types = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("t"),
                    F.col("event_id").alias("eid"),
                    F.col("event_type").alias("et"),
                )
            )
        ),
        lambda st: st["et"],
    )
    transcripts = s.groupBy("user_id", "session_no").agg(
        F.array_join(ordered_types, ">").alias("transcript")
    )
    counted = transcripts.groupBy("transcript").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    topk = counted.orderBy(F.desc("n_sessions"), "transcript").limit(
        FREQUENT_PATHS_TOPK
    )
    from pyspark.sql import Window

    return topk.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("n_sessions"), "transcript")),
    ).orderBy("rnk")


frequent_paths.__doc__ = frequent_paths.__doc__.format(k=FREQUENT_PATHS_TOPK)


# ---------------------------------------------------------- halflife_decay
# One-day half-life, capped at 30 days (the events table spans 30
# days): weight(age k days) = 2^-k. All arithmetic stays integral —
# cents * 2^(30-k) summed as DECIMAL(38,0) — so the score is exact
# until one final power-of-two division, bit-identical across
# engines (no exp()/pow() in any engine's hot path).
DECAY_HORIZON_DAYS = 30


@register(
    "halflife_decay",
    oracle=f"""
    WITH anchors AS (
      SELECT user_id, max(CAST(ts AS DATE)) AS anchor FROM events GROUP BY user_id
    ),
    weighted AS (
      SELECT e.user_id,
             CAST(round(e.value * 100) AS BIGINT)
               * (CAST(1 AS BIGINT) << ({DECAY_HORIZON_DAYS} - least(
                   date_diff('day', CAST(e.ts AS DATE), a.anchor),
                   {DECAY_HORIZON_DAYS}))) AS contrib
      FROM events e JOIN anchors a USING (user_id)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(contrib AS DECIMAL(38,0))) AS DOUBLE)
                 / {1 << DECAY_HORIZON_DAYS} / 100.0, 6) AS decayed_score
    FROM weighted GROUP BY user_id ORDER BY user_id
    """,
    tags=("events", "decay", "scoring"),
)
def halflife_decay(spark, sf_dir):
    """Per-user exponentially-decayed activity score with a one-day
    half-life: each event contributes value * 2^-age_days relative
    to that user's most recent event day (freshness weighting for
    replay buffers / user-activity ranking).

    Exactness: contributions are cents scaled by an integer power
    of two (shiftleft, never pow()), summed as DECIMAL(38,0); the
    single final division by 2^30*100 is exactly rounded in IEEE —
    so Spark and DuckDB agree bitwise despite the "exponential".

    Scale shape: per-user anchor is a map-side-combined aggregation
    joined back on user_id (high-cardinality key — no hot
    partition); the weighted sum is a second user-keyed
    aggregation. Two shuffles total, both on user_id."""
    e = load_table(spark, sf_dir, "events")
    anchors = e.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("anchor")
    )
    age = F.least(
        F.datediff(F.col("anchor"), F.to_date("ts")),
        F.lit(DECAY_HORIZON_DAYS),
    )
    weighted = (
        e.join(anchors, "user_id")
        .withColumn("age", age)
        .select(
            "user_id",
            F.expr(
                "cast(round(value * 100) as bigint)"
                f" * shiftleft(cast(1 as bigint), {DECAY_HORIZON_DAYS} - age)"
            ).alias("contrib"),
        )
    )
    return (
        weighted.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(
                F.sum(F.col("contrib").cast("decimal(38,0)")).cast("double")
                / (1 << DECAY_HORIZON_DAYS)
                / 100.0,
                6,
            ).alias("decayed_score"),
        )
        .orderBy("user_id")
    )


# ----------------------------------------------------- multitouch_attribution
# U-shaped (position-based) credit: 40% first touch, 40% last touch,
# 20% split across middles; single-touch gets 100%, two-touch 50/50.
ATTRIB_LOOKBACK_US = 7 * 24 * 3600 * 1_000_000
ATTRIB_CHANNELS = ("click", "view")


@register(
    "multitouch_attribution",
    oracle=f"""
    WITH ordered AS (
      SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us,
             last_value(CASE WHEN event_type = 'purchase'
                             THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts) DESC, event_id DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS conv_id,
             last_value(CASE WHEN event_type = 'purchase'
                             THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts) DESC, event_id DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS conv_ts_us,
             last_value(CASE WHEN event_type = 'purchase'
                             THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts) DESC, event_id DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS conv_value
      FROM events
    ),
    touches AS (
      SELECT *,
             row_number() OVER (PARTITION BY conv_id
                                ORDER BY ts_us, event_id) AS rn,
             count(*) OVER (PARTITION BY conv_id) AS n
      FROM ordered
      WHERE event_type IN {ATTRIB_CHANNELS}
        AND conv_id IS NOT NULL
        AND conv_ts_us - ts_us <= {ATTRIB_LOOKBACK_US}
    ),
    credited AS (
      SELECT event_type AS channel,
             CAST(round(conv_value * 100) AS DECIMAL(18,0)) AS cents,
             CAST(round(CASE WHEN n = 1 THEN 1.0
                             WHEN n = 2 THEN 0.5
                             WHEN rn = 1 OR rn = n THEN 0.4
                             ELSE 0.2 / (n - 2) END, 6) AS DECIMAL(18,6))
               AS credit
      FROM touches
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           round(CAST(sum(cents * credit) AS DOUBLE) / 100, 4)
             AS attributed_revenue
    FROM credited GROUP BY channel ORDER BY channel
    """,
    tags=("events", "attribution", "marketing"),
)
def multitouch_attribution(spark, sf_dir):
    """U-shaped multi-touch revenue attribution: each click/view is
    assigned to the user's NEXT purchase within a 7-day lookback
    (forward as-of via the union-and-carry window — one pass, no
    per-pair join), then position-based credit (40/20/40) splits
    the purchase value across its touches, aggregated per channel.

    Exactness: credits are doubles exactly rounded to 6 decimals,
    then all revenue math is decimal (cents x credit) — the sums
    are order-independent and bit-identical across engines.

    Scale shape: both windows partition by high-cardinality keys
    (user_id, then conversion id) with per-group size bounded by a
    user's events in the lookback, never by table size; the final
    aggregation is channel-keyed with map-side combine."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    carry = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts_us"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_conv = F.col("event_type") == "purchase"
    ordered = e.select(
        "*",
        F.last(F.when(is_conv, F.col("event_id")), ignorenulls=True)
        .over(carry)
        .alias("conv_id"),
        F.last(F.when(is_conv, F.col("ts_us")), ignorenulls=True)
        .over(carry)
        .alias("conv_ts_us"),
        F.last(F.when(is_conv, F.col("value")), ignorenulls=True)
        .over(carry)
        .alias("conv_value"),
    )
    touches = ordered.where(
        F.col("event_type").isin(*ATTRIB_CHANNELS)
        & F.col("conv_id").isNotNull()
        & (F.col("conv_ts_us") - F.col("ts_us") <= ATTRIB_LOOKBACK_US)
    )
    pos = Window.partitionBy("conv_id").orderBy("ts_us", "event_id")
    sized = Window.partitionBy("conv_id")
    credited = touches.select(
        F.col("event_type").alias("channel"),
        F.round(F.col("conv_value") * 100).cast("decimal(18,0)").alias("cents"),
        F.row_number().over(pos).alias("rn"),
        F.count(F.lit(1)).over(sized).alias("n"),
    ).select(
        "channel",
        "cents",
        F.round(
            F.when(F.col("n") == 1, 1.0)
            .when(F.col("n") == 2, 0.5)
            .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), 0.4)
            .otherwise(0.2 / (F.col("n") - 2)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("credit"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.round(
                F.sum(F.col("cents") * F.col("credit")).cast("double") / 100, 4
            ).alias("attributed_revenue"),
        )
        .orderBy("channel")
    )


# ------------------------------------------------------ active_user_stickiness
@register(
    "active_user_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    dau AS (
      SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ),
    cover AS (
      SELECT DISTINCT user_id, CAST(cd AS DATE) AS covered_day
      FROM ud, LATERAL (
        SELECT unnest(generate_series(CAST(day AS TIMESTAMP),
                                      CAST(day AS TIMESTAMP) + INTERVAL 6 DAY,
                                      INTERVAL 1 DAY)) AS cd
      ) g
    ),
    wau AS (
      SELECT covered_day AS day, CAST(count(*) AS BIGINT) AS wau
      FROM cover GROUP BY covered_day
    )
    SELECT dau.day, dau.dau, wau.wau,
           CAST((1000 * dau.dau) // wau.wau AS BIGINT) AS stickiness_milli
    FROM dau JOIN wau USING (day)
    ORDER BY dau.day
    """,
    tags=("events", "engagement", "sliding-distinct"),
)
def active_user_stickiness(spark, sf_dir):
    """DAU / WAU / stickiness per day, with the trailing-7-day
    distinct-user count computed EXACTLY and scalably: sliding
    COUNT(DISTINCT) has no bounded-state windowed form, so each
    (user, day) activity pair is exploded into the 7 target days it
    covers and deduplicated — turning the sliding distinct into two
    plain distinct-aggregations (constant 7x amplification, every
    shuffle on high-cardinality keys, no per-day re-scan).
    Stickiness is integer-division milli-units (exact).

    Only days with observed activity are reported (inner join
    dau⋈wau), so the trailing coverage past the last active day is
    dropped symmetrically on both engines."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    cover = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("day"),
        )
        .distinct()
    )
    wau = cover.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            # timestamp (not date) so pandas sees datetime64 on both
            # engines — DuckDB DATE already arrives as datetime64.
            F.col("day").cast("timestamp").alias("day"),
            "dau",
            "wau",
            F.expr("(1000 * dau) div wau").cast("bigint").alias("stickiness_milli"),
        )
        .orderBy("day")
    )


# ----------------------------------------------------- event_transition_matrix
@register(
    "event_transition_matrix",
    oracle=f"""
    {_SQL_SESSIONIZED}
    , steps AS (
      SELECT user_id, session_no, event_type AS to_type,
             lag(event_type) OVER (PARTITION BY user_id, session_no
                                   ORDER BY ts, event_id) AS from_type
      FROM sessioned
    ),
    pairs AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM steps WHERE from_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    totals AS (
      SELECT from_type, sum(n) AS tot FROM pairs GROUP BY from_type
    )
    SELECT p.from_type, p.to_type, p.n,
           CAST((1000 * p.n) // t.tot AS BIGINT) AS prob_milli
    FROM pairs p JOIN totals t USING (from_type)
    ORDER BY p.from_type, p.to_type
    """,
    tags=("events", "markov", "sessionization"),
)
def event_transition_matrix(spark, sf_dir):
    """Within-session Markov transition matrix over event types:
    lag() inside each (user, session) gives consecutive steps, then
    two (from, to)-keyed aggregations produce counts and integer
    milli-probabilities (exact division, no doubles).

    Scale shape: the lag window rides the SAME (user_id) shuffle
    sessionization already performs — per-group size is one user's
    session; the transition aggregation is |event_types|²-bounded
    output with map-side combine. This is the matrix form of
    frequent_paths (which keeps whole top-k sequences)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    s = sessionize(
        e,
        partition_cols=["user_id"],
        ts_col="ts",
        order_cols=["event_id"],
        gap_us=_SESSION_GAP_US,
    )
    w = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    steps = s.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    ).where(F.col("from_type").isNotNull())
    pairs = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("(1000 * n) div tot").cast("bigint").alias("prob_milli"),
        )
        .orderBy("from_type", "to_type")
    )


# --------------------------------------------------- funnel_conversion
_FUNNEL = ("view", "click", "purchase")


@register(
    "funnel_conversion",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t1
      FROM events WHERE event_type = '{_FUNNEL[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = '{_FUNNEL[1]}' AND epoch_us(e.ts) > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = '{_FUNNEL[2]}' AND epoch_us(e.ts) > s2.t2
      GROUP BY e.user_id
    ),
    counts AS (
      SELECT 1 AS stage_no, '{_FUNNEL[0]}' AS stage,
             (SELECT count(*) FROM s1) AS n_users
      UNION ALL
      SELECT 2, '{_FUNNEL[1]}', (SELECT count(*) FROM s2)
      UNION ALL
      SELECT 3, '{_FUNNEL[2]}', (SELECT count(*) FROM s3)
    )
    SELECT stage_no, stage, CAST(n_users AS BIGINT) AS n_users,
           CASE WHEN stage_no = 1 THEN CAST(1.0 AS DOUBLE)
                WHEN lag(n_users, 1) OVER (ORDER BY stage_no) > 0
                THEN round(CAST(n_users AS DOUBLE)
                           / lag(n_users, 1) OVER (ORDER BY stage_no), 6)
                ELSE NULL END AS conv_from_prev
    FROM counts ORDER BY stage_no
    """,
    tags=("events", "funnel", "behavioral"),
)
def funnel_conversion(spark, sf_dir):
    """Ordered funnel analysis (view → click → purchase): a user
    advances to stage k only with a stage-k event STRICTLY AFTER
    their stage-(k−1) entry time — the sequence-respecting funnel
    product analytics runs, and the trajectory-completion census an
    agent-training pipeline runs over tool-use traces.

    Plan shape: three user_id-keyed min-aggregations chained by
    user_id joins — the same single exchange key end to end (no
    windows, no ordering of raw events); the three stage counts are
    1-row aggregates unioned into the report. Timestamps compare as
    unix micros (integers) so stage gating is exact; the only
    division is the final per-stage conversion ratio."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    s1 = (
        e.where(F.col("event_type") == _FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    s2 = (
        e.where(F.col("event_type") == _FUNNEL[1])
        .join(s1, "user_id")
        .where(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == _FUNNEL[2])
        .join(s2, "user_id")
        .where(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    counts = None
    for i, (stage, df) in enumerate(zip(_FUNNEL, (s1, s2, s3)), start=1):
        c = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("stage_no"), F.lit(stage).alias("stage"), "n_users"
        )
        counts = c if counts is None else counts.unionAll(c)
    from pyspark.sql import Window

    w = Window.orderBy("stage_no")
    prev = F.lag("n_users", 1).over(w).cast("double")
    # Stage 1 is 1.0 by definition; a genuine 0/0 (empty PRIOR stage)
    # surfaces as NULL instead of being coalesced to 1.0 — an empty
    # funnel head must not read as perfect conversion, and NULL is
    # what the oracle's CASE yields too (round-5 ADVICE fix).
    return counts.select(
        "stage_no",
        "stage",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.when(F.col("stage_no") == 1, F.lit(1.0))
        .when(prev > 0, F.round(F.col("n_users").cast("double") / prev, 6))
        .otherwise(F.lit(None).cast("double"))
        .alias("conv_from_prev"),
    ).orderBy("stage_no")


# ---------------------------------------------------- retention_matrix
@register(
    "retention_matrix",
    oracle="""
    WITH days AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
    ),
    cohorts AS (
      SELECT user_id, MIN(day) AS day0 FROM days GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT c.day0 // 7 AS cohort_week,
             (d.day - c.day0) // 7 AS week_offset,
             d.user_id
      FROM days d JOIN cohorts c USING (user_id)
    ),
    sizes AS (
      SELECT day0 // 7 AS cohort_week, count(*) AS cohort_size
      FROM cohorts GROUP BY 1
    )
    SELECT a.cohort_week, a.week_offset,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           round(count(*) / CAST(s.cohort_size AS DOUBLE), 6) AS retention
    FROM active a JOIN sizes s USING (cohort_week)
    GROUP BY a.cohort_week, a.week_offset, s.cohort_size
    ORDER BY cohort_week, week_offset
    """,
    tags=("events", "retention", "cohort"),
)
def retention_matrix(spark, sf_dir):
    """Weekly retention matrix with offsets and ratios (the existing
    retention_cohorts query in analytic_ops is the calendar-week
    count form; this one adds per-cohort week OFFSETS, cohort sizes
    and retention ratios): users are cohorted by the epoch-week
    of their FIRST event; cell (cohort, k) counts distinct cohort
    members active k weeks later. All bucketing is integer floor
    arithmetic on epoch days (no calendar week-start semantics to
    disagree on across engines); the only division is the final
    retention ratio.

    Plan shape: first-touch is a user_id-keyed min (map-side
    combined); the activity relation is a user-keyed join + distinct
    on (cohort_week, offset, user) — uniform keys; cohort sizes are
    a tiny aggregate joined back broadcast. At 100 TB the distinct
    bounds state by (users × active weeks), the same cardinality any
    engagement warehouse stores."""
    days = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day")
    )
    cohorts = days.groupBy("user_id").agg(F.min("day").alias("day0"))
    active = (
        days.join(cohorts, "user_id")
        .select(
            F.expr("day0 div 7").alias("cohort_week"),
            F.expr("(day - day0) div 7").alias("week_offset"),
            "user_id",
        )
        .distinct()
    )
    sizes = cohorts.groupBy(F.expr("day0 div 7").alias("cohort_week")).agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------- events_hourly_heatmap
@register(
    "events_hourly_heatmap",
    oracle="""
    WITH cells AS (
      SELECT ((epoch_us(ts) // 86400000000 + 3) % 7) + 1 AS iso_dow,
             (epoch_us(ts) % 86400000000) // 3600000000 AS hour_of_day,
             event_type
      FROM events
    ),
    tot AS (SELECT count(*) AS total FROM cells)
    SELECT CAST(iso_dow AS INTEGER) AS iso_dow,
           CAST(hour_of_day AS INTEGER) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS INTEGER) AS n_types,
           round(count(*) / CAST(t.total AS DOUBLE), 6) AS share
    FROM cells CROSS JOIN tot t
    GROUP BY iso_dow, hour_of_day, t.total
    ORDER BY iso_dow, hour_of_day
    """,
    tags=("events", "calendar", "heatmap"),
)
def events_hourly_heatmap(spark, sf_dir):
    """Activity heatmap: event volume per (ISO weekday × hour) cell
    — the load-shape census capacity planning and anomaly baselining
    start from. Weekday comes from pure epoch-day arithmetic
    ((day + 3) % 7 + 1; epoch day 0 was a Thursday), NOT from each
    engine's dayofweek()/locale semantics — so the bucketing is
    engine-exact by construction, like retention_matrix. One
    map-side-combined aggregation over a ≤168-cell key space; the
    1-row total broadcasts."""
    cells = load_table(spark, sf_dir, "events").select(
        (
            ((F.expr("unix_micros(ts) div 86400000000") + 3) % 7) + 1
        ).alias("iso_dow"),
        F.expr("(unix_micros(ts) % 86400000000) div 3600000000").alias(
            "hour_of_day"
        ),
        "event_type",
    )
    tot = cells.agg(F.count(F.lit(1)).alias("total"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .groupBy("iso_dow", "hour_of_day", "total")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .select(
            F.col("iso_dow").cast("int").alias("iso_dow"),
            F.col("hour_of_day").cast("int").alias("hour_of_day"),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("n_types").cast("int").alias("n_types"),
            F.round(F.col("n_events") / F.col("total").cast("double"), 6).alias(
                "share"
            ),
        )
        .orderBy("iso_dow", "hour_of_day")
    )
