"""Warehouse maintenance operators: CDC MERGE (upsert) and SCD
type-2 history derivation.

The reference's sinks append-only into Postgres (diameter.py
458-467); a warehouse consumer additionally needs the two classic
mutation patterns, re-expressed as pure dataflow over immutable
inputs (the Spark-native shape — MERGE INTO on a table format is
this same join under the hood):

- ``merge_upsert``: MERGE a change batch into a snapshot — update
  matched keys, insert unmatched ones, tag each row with its merge
  action. One full-outer join on the key; at scale both sides
  shuffle once on the merge key (or zero times if the snapshot is
  bucketed on it — see test_plans.py's bucketed-join invariant).
- ``scd2_history``: turn a mutation log into type-2 dimension rows
  (valid_from / valid_to / is_current) with a per-key lead window —
  one shuffle on the dimension key; history depth per key is
  bounded, so partitions stay uniform.

The change batch is synthesized deterministically from the events
table (every 10th event gets a doubled value and every 3000th key a
brand-new row), identically on both engines, keeping the operators
oracle-checkable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import register

_NEW_KEY_OFFSET = 10_000_000


@register(
    "merge_upsert",
    oracle=f"""
    WITH snapshot AS (
      SELECT event_id, user_id, event_type,
             CAST(value AS DECIMAL(12,2)) AS value
      FROM events
    ),
    changes AS (
      SELECT event_id, user_id, 'updated' AS event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 2 AS DECIMAL(13,2)) AS value
      FROM events WHERE event_id % 10 = 0
      UNION ALL
      SELECT event_id + {_NEW_KEY_OFFSET}, user_id, 'inserted',
             CAST(CAST(value AS DECIMAL(12,2)) AS DECIMAL(13,2))
      FROM events WHERE event_id % 3000 = 0
    )
    SELECT COALESCE(c.event_id, s.event_id) AS event_id,
           COALESCE(c.user_id, s.user_id) AS user_id,
           COALESCE(c.event_type, s.event_type) AS event_type,
           CAST(COALESCE(c.value, s.value) AS DOUBLE) AS value,
           CASE WHEN s.event_id IS NULL THEN 'insert'
                WHEN c.event_id IS NULL THEN 'keep'
                ELSE 'update' END AS merge_action
    FROM snapshot s FULL OUTER JOIN changes c USING (event_id)
    ORDER BY event_id
    """,
    tags=("warehouse", "merge", "cdc"),
)
def merge_upsert(spark, sf_dir):
    """CDC MERGE: apply a change batch to a snapshot — matched keys
    take the change row's columns (update), unmatched change rows
    append (insert), untouched snapshot rows pass through (keep);
    every output row is tagged with its merge action. Exactly the
    dataflow a MERGE INTO executes: one full-outer join on the merge
    key. Values go through decimals so the doubled update is exact
    on both engines."""
    e = load_table(spark, sf_dir, "events")
    snapshot = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("value").cast("decimal(12,2)").alias("value"),
    )
    changes = (
        e.where(F.col("event_id") % 10 == 0)
        .select(
            "event_id",
            "user_id",
            F.lit("updated").alias("event_type"),
            (F.col("value").cast("decimal(12,2)") * 2)
            .cast("decimal(13,2)")
            .alias("value"),
        )
        .unionAll(
            e.where(F.col("event_id") % 3000 == 0).select(
                (F.col("event_id") + _NEW_KEY_OFFSET).alias("event_id"),
                "user_id",
                F.lit("inserted").alias("event_type"),
                F.col("value").cast("decimal(12,2)").cast("decimal(13,2)").alias("value"),
            )
        )
    )
    s = snapshot.alias("s")
    c = changes.alias("c")
    # merge_action keys on the JOIN-KEY side markers (s.event_id /
    # c.event_id nullity), matching the oracle's CASE — classifying
    # on a payload column like user_id would misfile a matched row
    # whose payload happens to be NULL.
    return (
        s.join(c, F.col("s.event_id") == F.col("c.event_id"), "full_outer")
        .select(
            F.coalesce("c.event_id", "s.event_id").alias("event_id"),
            F.coalesce("c.user_id", "s.user_id").alias("user_id"),
            F.coalesce("c.event_type", "s.event_type").alias("event_type"),
            F.coalesce("c.value", "s.value").cast("double").alias("value"),
            F.when(F.col("s.event_id").isNull(), "insert")
            .when(F.col("c.event_id").isNull(), "keep")
            .otherwise("update")
            .alias("merge_action"),
        )
        .orderBy("event_id")
    )


@register(
    "scd2_history",
    oracle="""
    WITH log AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CAST(value AS DECIMAL(12,2)) AS value
      FROM events WHERE user_id < 40 AND event_type = 'purchase'
    )
    SELECT user_id, event_id,
           CAST(value AS DOUBLE) AS value,
           ts_us AS valid_from_us,
           lead(ts_us) OVER w AS valid_to_us,
           (lead(ts_us) OVER w IS NULL) AS is_current
    FROM log
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ORDER BY user_id, valid_from_us, event_id
    """,
    tags=("warehouse", "scd2", "window"),
)
def scd2_history(spark, sf_dir):
    """SCD type-2 derivation: a per-key mutation log becomes
    dimension history rows with [valid_from, valid_to) intervals and
    an is_current flag — one lead() window per key, one shuffle.
    The events stream stands in for the mutation log (purchase
    events of a key range)."""
    e = load_table(spark, sf_dir, "events")
    log = e.where((F.col("user_id") < 40) & (F.col("event_type") == "purchase")).select(
        "user_id",
        "event_id",
        F.col("value").cast("decimal(12,2)").alias("value"),
        F.unix_micros("ts").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        log.select(
            "user_id",
            "event_id",
            F.col("value").cast("double").alias("value"),
            F.col("ts_us").alias("valid_from_us"),
            F.lead("ts_us").over(w).alias("valid_to_us"),
        )
        .withColumn("is_current", F.col("valid_to_us").isNull())
        .orderBy("user_id", "valid_from_us", "event_id")
    )


@register(
    "snapshot_diff",
    oracle=f"""
    WITH v1 AS (
      SELECT event_id, CAST(value AS DECIMAL(12,2)) AS value FROM events
    ),
    v2 AS (
      SELECT event_id,
             CASE WHEN event_id % 13 = 0
                  THEN CAST(CAST(value AS DECIMAL(12,2)) * 2 AS DECIMAL(13,2))
                  ELSE CAST(CAST(value AS DECIMAL(12,2)) AS DECIMAL(13,2)) END
               AS value
      FROM events WHERE event_id % 500 <> 0
      UNION ALL
      SELECT event_id + {_NEW_KEY_OFFSET},
             CAST(CAST(value AS DECIMAL(12,2)) AS DECIMAL(13,2))
      FROM events WHERE event_id % 977 = 0
    ),
    j AS (
      SELECT COALESCE(a.event_id, b.event_id) AS event_id,
             a.event_id AS aid, b.event_id AS bid,
             CAST(a.value AS DOUBLE) AS old_value,
             CAST(b.value AS DOUBLE) AS new_value
      FROM v1 a FULL OUTER JOIN v2 b ON a.event_id = b.event_id
    )
    SELECT event_id,
           CASE WHEN aid IS NULL THEN 'added'
                WHEN bid IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           old_value, new_value
    FROM j
    WHERE aid IS NULL OR bid IS NULL OR old_value <> new_value
    ORDER BY event_id
    """,
    tags=("warehouse", "diff", "cdc"),
)
def snapshot_diff(spark, sf_dir):
    """Table-version diff (Delta/Iceberg time-travel DIFF shape):
    compare two snapshots of a table and emit only added / removed /
    changed rows with old/new values — the audit artifact a 100 TB
    nightly pipeline publishes instead of shipping both snapshots.
    One full-outer join on the key (both sides shuffle once on
    event_id; zero shuffles if both snapshot versions are bucketed
    on it), and the unchanged majority is filtered before any
    collection, so output size tracks the CHANGE volume, not table
    size. The v2 snapshot is synthesized deterministically (every
    13th value doubled, every 500th key deleted, a new key for every
    977th), identically on both engines; values go through decimals
    so 'changed' detection is exact."""
    e = load_table(spark, sf_dir, "events")
    v1 = e.select(
        "event_id", F.col("value").cast("decimal(12,2)").alias("value")
    )
    v2 = (
        e.where(F.col("event_id") % 500 != 0)
        .select(
            "event_id",
            F.when(
                F.col("event_id") % 13 == 0,
                (F.col("value").cast("decimal(12,2)") * 2).cast("decimal(13,2)"),
            )
            .otherwise(F.col("value").cast("decimal(12,2)").cast("decimal(13,2)"))
            .alias("value"),
        )
        .unionAll(
            e.where(F.col("event_id") % 977 == 0).select(
                (F.col("event_id") + _NEW_KEY_OFFSET).alias("event_id"),
                F.col("value").cast("decimal(12,2)").cast("decimal(13,2)").alias("value"),
            )
        )
    )
    a, b = v1.alias("a"), v2.alias("b")
    j = a.join(b, F.col("a.event_id") == F.col("b.event_id"), "full_outer").select(
        F.coalesce("a.event_id", "b.event_id").alias("event_id"),
        F.col("a.event_id").alias("aid"),
        F.col("b.event_id").alias("bid"),
        F.col("a.value").cast("double").alias("old_value"),
        F.col("b.value").cast("double").alias("new_value"),
    )
    return (
        j.where(
            F.col("aid").isNull()
            | F.col("bid").isNull()
            | (F.col("old_value") != F.col("new_value"))
        )
        .select(
            "event_id",
            F.when(F.col("aid").isNull(), "added")
            .when(F.col("bid").isNull(), "removed")
            .otherwise("changed")
            .alias("status"),
            "old_value",
            "new_value",
        )
        .orderBy("event_id")
    )


# ----------------------------------------------------- compaction_plan
COMPACTION_TARGET_BYTES = 8_000  # demo bin capacity (n_chars as byte proxy)


@register(
    "compaction_plan",
    oracle=f"""
    WITH parts AS (
      SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS part_bytes
      FROM documents GROUP BY source, lang
    )
    SELECT source, lang, part_bytes,
           CAST((sum(part_bytes) OVER w - part_bytes)
                // {COMPACTION_TARGET_BYTES} AS BIGINT) AS bin_id,
           CAST(sum(part_bytes) OVER w AS BIGINT) AS cum_bytes
    FROM parts
    WINDOW w AS (ORDER BY part_bytes DESC, source, lang
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY bin_id, part_bytes DESC, source, lang
    """,
    tags=("warehouse", "compaction", "layout"),
)
def compaction_plan(spark, sf_dir):
    """Small-file compaction planner (the OPTIMIZE/bin-packing step
    every lakehouse table needs): roll partition sizes up from the
    data, order parts largest-first, and assign each to a target-size
    output bin by sequential fill — ``bin_id = (running_sum − size)
    div target``. Deterministic, engine-exact integer math.

    Plan shape: the only per-row work is the size aggregation
    (map-side combined; output rows = partition count, not row
    count). The global window then runs over partition METADATA —
    at 100 TB a table has thousands-to-millions of files/partitions,
    kilobytes-to-megabytes of planner state, which is exactly what
    Delta/Iceberg OPTIMIZE planners hold on one node; the plan's
    single-task window is bounded by that metadata size by
    construction, never by table rows. The emitted (part → bin)
    assignment then drives bin-per-task rewrites with no further
    shuffle."""
    parts = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.sum("n_chars").cast("bigint").alias("part_bytes"))
    )
    w = (
        Window.orderBy(F.desc("part_bytes"), "source", "lang")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parts.select(
            "source",
            "lang",
            "part_bytes",
            F.expr(
                f"(sum(part_bytes) OVER (ORDER BY part_bytes DESC, source, lang "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - part_bytes) "
                f"div {COMPACTION_TARGET_BYTES}"
            ).alias("bin_id"),
            F.sum("part_bytes").over(w).alias("cum_bytes"),
        )
        .orderBy("bin_id", F.desc("part_bytes"), "source", "lang")
    )


# -------------------------------------------------- gdpr_delete_audit
GDPR_TOMBSTONE_MOD = 97  # deletion-request users: user_id % 97 == 0


@register(
    "gdpr_delete_audit",
    oracle=f"""
    WITH tomb AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % {GDPR_TOMBSTONE_MOD} = 0
    ),
    survivors AS (
      SELECT e.* FROM events e ANTI JOIN tomb t ON e.user_id = t.user_id
    ),
    before AS (
      SELECT event_type, count(*) AS rows_before FROM events GROUP BY event_type
    ),
    after AS (
      SELECT event_type, count(*) AS rows_after,
             CAST(sum(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                           AS BIGINT)) AS BIGINT) AS survivor_checksum
      FROM survivors GROUP BY event_type
    )
    SELECT b.event_type, b.rows_before,
           b.rows_before - COALESCE(a.rows_after, 0) AS rows_deleted,
           COALESCE(a.rows_after, 0) AS rows_after,
           COALESCE(a.survivor_checksum, 0) AS survivor_checksum
    FROM before b LEFT JOIN after a ON b.event_type = a.event_type
    ORDER BY b.event_type
    """,
    tags=("warehouse", "compliance", "delete"),
)
def gdpr_delete_audit(spark, sf_dir):
    """Right-to-erasure propagation with an audit trail: a
    deletion-request (tombstone) list anti-joins the fact table, and
    the audit reports per-event-type rows before/deleted/after plus
    an order-free content checksum of the survivors (sum of 32-bit
    md5 prefixes of surviving event_ids) — the checksum proves the
    anti-join deleted exactly the requested keys, not merely the
    right NUMBER of rows.

    Plan shape: the tombstone side is the distinct deletion keys —
    at 100 TB erasure requests are thousands-to-millions of rows,
    always the broadcast side — so the fact table never shuffles:
    scan → broadcast anti-join → map-side-combined aggregation. The
    before/after legs both fold into per-type partial aggregates;
    nothing keys on the (skewed) user_id."""
    e = load_table(spark, sf_dir, "events")
    tomb = (
        e.where(F.col("user_id") % GDPR_TOMBSTONE_MOD == 0)
        .select("user_id")
        .distinct()
    )
    survivors = e.join(F.broadcast(tomb), "user_id", "left_anti")
    checksum = F.sum(
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
    ).cast("bigint")
    before = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("rows_before"))
    after = survivors.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("rows_after"),
        checksum.alias("survivor_checksum"),
    )
    return (
        before.join(after, "event_type", "left")
        .select(
            "event_type",
            "rows_before",
            (F.col("rows_before") - F.coalesce("rows_after", F.lit(0))).alias(
                "rows_deleted"
            ),
            F.coalesce("rows_after", F.lit(0)).alias("rows_after"),
            F.coalesce("survivor_checksum", F.lit(0)).alias("survivor_checksum"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------------ zone_map_prune
ZONE_BUCKET_ROWS = 500  # rows per simulated file / row-group
ZONE_PRED_LO = "2024-01-10 00:00:00"
ZONE_PRED_HI = "2024-01-12 00:00:00"


@register(
    "zone_map_prune",
    oracle=f"""
    WITH z AS (
      SELECT event_id // {ZONE_BUCKET_ROWS} AS bucket_id,
             count(*) AS n_rows,
             min(epoch_us(ts)) AS min_ts_us,
             max(epoch_us(ts)) AS max_ts_us,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '{ZONE_PRED_LO}'
                            AND ts <  TIMESTAMP '{ZONE_PRED_HI}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_match
      FROM events GROUP BY 1
    )
    SELECT CAST(bucket_id AS BIGINT) AS bucket_id, n_rows,
           min_ts_us, max_ts_us, n_match,
           (max_ts_us < epoch_us(TIMESTAMP '{ZONE_PRED_LO}')
            OR min_ts_us >= epoch_us(TIMESTAMP '{ZONE_PRED_HI}')) AS pruned
    FROM z ORDER BY bucket_id
    """,
    tags=("warehouse", "zonemap", "data-skipping"),
)
def zone_map_prune(spark, sf_dir):
    """Zone-map (min/max statistics) data-skipping report: bucket the
    fact table into simulated files of {rows} rows, compute each
    bucket's ts min/max zone map, and decide which buckets a range
    predicate can skip without reading — alongside the ACTUAL match
    count per bucket, so `pruned ⇒ n_match = 0` is checkable row by
    row (asserted in tests). This is the audit view of what parquet
    row-group statistics + predicate pushdown do physically (the scan
    plans in test_plans.py assert PushedFilters; this query makes the
    skipping arithmetic itself a first-class, oracle-checked result).

    Plan shape: one map-side-combined aggregation on a derived
    bucket key; output rows = bucket count (file metadata, not
    data). At 100 TB this is the same footprint as an Iceberg
    manifest scan — zone maps are why the 2-day predicate reads ~2
    days of files, not 100 TB."""
    e = load_table(spark, sf_dir, "events")
    in_range = (F.col("ts") >= F.lit(ZONE_PRED_LO).cast("timestamp")) & (
        F.col("ts") < F.lit(ZONE_PRED_HI).cast("timestamp")
    )
    z = (
        e.groupBy((F.col("event_id") / ZONE_BUCKET_ROWS).cast("bigint").alias("bucket_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.unix_micros("ts")).alias("min_ts_us"),
            F.max(F.unix_micros("ts")).alias("max_ts_us"),
            F.sum(in_range.cast("int")).cast("bigint").alias("n_match"),
        )
    )
    lo_us = F.unix_micros(F.lit(ZONE_PRED_LO).cast("timestamp"))
    hi_us = F.unix_micros(F.lit(ZONE_PRED_HI).cast("timestamp"))
    return (
        z.select(
            "bucket_id",
            "n_rows",
            "min_ts_us",
            "max_ts_us",
            "n_match",
            ((F.col("max_ts_us") < lo_us) | (F.col("min_ts_us") >= hi_us)).alias(
                "pruned"
            ),
        )
        .orderBy("bucket_id")
    )


zone_map_prune.__doc__ = zone_map_prune.__doc__.format(rows=ZONE_BUCKET_ROWS)


# --------------------------------------------------- incremental_rollup
ROLLUP_SPLIT_TS = "2024-01-16 00:00:00"  # base/delta watermark


@register(
    "incremental_rollup",
    oracle=f"""
    WITH base AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             count(*) AS n, sum(CAST(value AS DECIMAL(12,2))) AS sv
      FROM events WHERE ts < TIMESTAMP '{ROLLUP_SPLIT_TS}'
      GROUP BY 1, 2
    ),
    delta AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             count(*) AS n, sum(CAST(value AS DECIMAL(12,2))) AS sv
      FROM events WHERE ts >= TIMESTAMP '{ROLLUP_SPLIT_TS}'
      GROUP BY 1, 2
    )
    SELECT COALESCE(b.event_type, d.event_type) AS event_type,
           epoch_us(COALESCE(b.hr, d.hr)) AS hr_us,
           CAST(COALESCE(b.n, 0) + COALESCE(d.n, 0) AS BIGINT) AS n_events,
           CAST(CAST(COALESCE(b.sv, 0) + COALESCE(d.sv, 0) AS DECIMAL(14,2))
                AS DOUBLE) AS total_value
    FROM base b FULL OUTER JOIN delta d
      ON b.event_type = d.event_type AND b.hr = d.hr
    ORDER BY event_type, hr_us
    """,
    tags=("warehouse", "incremental", "rollup"),
)
def incremental_rollup(spark, sf_dir):
    """Incremental materialized-view maintenance for an hourly
    rollup: the stored BASE aggregate (events before the watermark)
    merges with the DELTA aggregate (the new micro-batch) via a
    full-outer combine on the group key — count and decimal sum are
    both mergeable, so base ⊕ delta is bit-identical to a full
    recompute (the oracle IS the same split recomputed; equality to
    the direct one-pass rollup is asserted in tests).

    Plan shape and the 100 TB story: on a real lakehouse the base
    side is the stored rollup table — hours × types rows, NOT the
    raw 100 TB — so each refresh scans only the new partition,
    aggregates it map-side, and joins aggregate-to-aggregate on the
    bounded group key. This query materializes both legs from the
    fact table only because the sandbox has no persistent store;
    the merge arithmetic (decimal, null-safe coalesce) is the
    product surface."""
    e = load_table(spark, sf_dir, "events")
    split = F.lit(ROLLUP_SPLIT_TS).cast("timestamp")

    def leg(df):
        return df.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hr")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("sv"),
        )

    base = leg(e.where(F.col("ts") < split)).alias("b")
    delta = leg(e.where(F.col("ts") >= split)).alias("d")
    j = base.join(
        delta,
        (F.col("b.event_type") == F.col("d.event_type"))
        & (F.col("b.hr") == F.col("d.hr")),
        "full_outer",
    )
    return (
        j.select(
            F.coalesce("b.event_type", "d.event_type").alias("event_type"),
            F.unix_micros(F.coalesce("b.hr", "d.hr")).alias("hr_us"),
            (
                F.coalesce("b.n", F.lit(0)) + F.coalesce("d.n", F.lit(0))
            ).cast("bigint").alias("n_events"),
            (
                F.coalesce("b.sv", F.lit(0)) + F.coalesce("d.sv", F.lit(0))
            ).cast("decimal(14,2)").cast("double").alias("total_value"),
        )
        .orderBy("event_type", "hr_us")
    )


# --------------------------------------------------- pit_dimension_join
@register(
    "pit_dimension_join",
    oracle="""
    WITH dim AS (
      SELECT user_id, epoch_us(ts) AS vf_us,
             MAX(event_id) AS dim_event_id,
             MAX(CAST(value AS DECIMAL(12,2))) AS dim_value
      FROM events WHERE user_id < 40 AND event_type = 'purchase'
      GROUP BY 1, 2
    ),
    facts AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE user_id < 40 AND event_type = 'click'
    )
    SELECT f.event_id, f.user_id, f.ts_us,
           d.dim_event_id,
           CAST(d.dim_value AS DOUBLE) AS dim_value
    FROM facts f ASOF LEFT JOIN dim d
      ON f.user_id = d.user_id AND f.ts_us >= d.vf_us
    ORDER BY f.user_id, f.event_id
    """,
    tags=("warehouse", "scd2", "point-in-time", "asof"),
)
def pit_dimension_join(spark, sf_dir):
    """Point-in-time dimension join: attach to every fact row the
    SCD2 dimension version that was valid AT THE FACT'S event time —
    the lookup that naive pipelines get subtly wrong by joining the
    current version (leaking future attribute values into history;
    in ML-feature terms, train-time leakage). Because SCD2 intervals
    are contiguous per key, "the version valid at ts" equals "the
    latest version starting at or before ts", so the interval join
    reduces to the backward as-of operator.

    Plan shape: the union-and-carry as-of (operators/asof.py) — one
    shuffle on the dimension key, one ordered window, no range-join
    pair explosion; facts earlier than the key's first version keep
    NULL dimension columns. The same plan at 100 TB: windows scale
    with per-key version count + fact count, never their product."""
    from ingestor_etl_spark.operators.asof import asof_join_backward

    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    dim = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.unix_micros("ts").alias("ts_us"))
        .agg(
            F.max("event_id").alias("dim_event_id"),
            F.max(F.col("value").cast("decimal(12,2)")).alias("dim_value"),
        )
    )
    facts = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    out = asof_join_backward(
        facts,
        dim,
        by=["user_id"],
        ts_col="ts_us",
        carry_cols=["dim_event_id", "dim_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        "dim_event_id",
        F.col("dim_value").cast("double").alias("dim_value"),
    ).orderBy("user_id", "event_id")
