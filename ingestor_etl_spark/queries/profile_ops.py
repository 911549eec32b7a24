"""Corpus/workload profiling operators: join-key skew diagnostics,
deterministic per-domain holdout splits, cross-domain score
calibration, and the one-row dataset card.

These are the observability half of a training-data pipeline: before
running a 100 TB join you profile its key distribution; before
training you freeze an eval holdout and a dataset card; quality
scores from heterogeneous domains get rank-calibrated before a
single global threshold is applied.

Scale notes:
- ``key_skew_profile`` is one map-side-combined aggregation on the
  key plus a tiny top-k sort over the aggregated relation — the
  standard pre-join diagnostic; its output is what decides between
  a plain shuffle join, salting, or AQE skew handling.
- ``eval_holdout_split`` ranks by md5 *within each source* — the
  window partitions by domain, so no global sort; exactly-k rows
  per domain, reproducible across runs and engines.
- ``score_calibration`` windows per source (percent_rank), no
  global state.
- ``dataset_card`` is a single full-scan aggregation; every metric
  is decimal-staged or integral so the card is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import register

SKEW_TOPK = 10


@register(
    "key_skew_profile",
    oracle=f"""
    WITH counts AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ),
    tot AS (SELECT sum(n) AS total, count(*) AS n_keys, max(n) AS max_n FROM counts)
    SELECT user_id, CAST(n AS BIGINT) AS n,
           round(n / CAST(total AS DOUBLE), 6) AS share,
           round(n * n_keys / CAST(total AS DOUBLE), 4) AS skew_x,
           CAST(total AS BIGINT) AS total_rows,
           CAST(n_keys AS BIGINT) AS n_keys
    FROM counts, tot
    ORDER BY n DESC, user_id LIMIT {SKEW_TOPK}
    """,
    tags=("profiling", "skew"),
)
def key_skew_profile(spark, sf_dir):
    """Join-key skew diagnostic: the top-{k} hottest keys of
    events.user_id with their share of all rows and their skew
    factor (count / mean count). skew_x >> 1 on the head keys is the
    signal to salt or enable AQE skew-join before shuffling on this
    key. One aggregation with map-side combine; the top-k sort
    touches only the aggregated key relation."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_n"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n",
            F.round(F.col("n") / F.col("total").cast("double"), 6).alias("share"),
            F.round(
                F.col("n") * F.col("n_keys") / F.col("total").cast("double"), 4
            ).alias("skew_x"),
            F.col("total").alias("total_rows"),
            F.col("n_keys"),
        )
        .orderBy(F.desc("n"), "user_id")
        .limit(SKEW_TOPK)
    )


HOLDOUT_PER_SOURCE = 5


@register(
    "eval_holdout_split",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      FROM documents
    )
    SELECT doc_id, source, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {HOLDOUT_PER_SOURCE}
    ORDER BY source, rnk
    """,
    tags=("sampling", "holdout", "deterministic"),
)
def eval_holdout_split(spark, sf_dir):
    """Frozen eval holdout: exactly {k} documents per source, chosen
    by md5(doc_id) rank — reproducible across runs, engines, and
    input partitionings (unlike df.sample), and guaranteed per-domain
    coverage (unlike a global hash gate). Window partitions by
    source, so no global sort; the scan prunes to two columns."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "source")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= HOLDOUT_PER_SOURCE)
        .orderBy("source", "rnk")
    )


@register(
    "score_calibration",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             len(string_split_regex(trim(text), ' +')) AS raw_score
      FROM documents
    )
    SELECT doc_id, source, CAST(raw_score AS BIGINT) AS raw_score,
           round(percent_rank() OVER (
             PARTITION BY source ORDER BY raw_score, doc_id), 6) AS calibrated
    FROM scored ORDER BY doc_id
    """,
    tags=("quality", "calibration", "window"),
)
def score_calibration(spark, sf_dir):
    """Cross-domain score calibration: replace a raw per-doc quality
    score (token count as the stand-in) with its percent-rank WITHIN
    its source, so one global keep-threshold treats every domain
    fairly (the fix for 'domain A's classifier scores run hot').
    percent_rank is (rank-1)/(n-1) — a single exact rational per
    row, identical in both engines. Source-partitioned window, no
    global sort."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r" +")
    w = Window.partitionBy("source").orderBy("raw_score", "doc_id")
    return (
        d.select(
            "doc_id", "source", F.size(toks).cast("long").alias("raw_score")
        )
        .withColumn("calibrated", F.round(F.percent_rank().over(w), 6))
        .orderBy("doc_id")
    )


@register(
    "dataset_card",
    oracle="""
    WITH per_doc AS (
      SELECT doc_id, lang, source, n_chars,
             len(string_split_regex(trim(text), ' +')) AS n_tokens,
             md5(text) AS fp
      FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens
    FROM per_doc
    """,
    tags=("profiling", "card"),
)
def dataset_card(spark, sf_dir):
    """The one-row dataset card: corpus size, token/char volume,
    language and source cardinalities, exact-duplicate count, and
    token-length extremes — the summary block every dataset release
    ships. Single full-scan aggregation; the distinct counts are the
    only shuffled state and key on bounded vocabularies (langs,
    sources) plus the fingerprint."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r" +")
    per_doc = d.select(
        "lang",
        "source",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.md5("text").alias("fp"),
    )
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_exact_dups"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
    )
