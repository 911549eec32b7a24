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
