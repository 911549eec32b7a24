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
- ``eval_holdout_split`` is TWO-PHASE: a per-source md5-threshold
  prefilter (threshold derived from a counts aggregation) shrinks
  the window input to ~FUDGE·k rows per source, then the exact
  md5-rank runs on the survivor set. ``source`` is a highly skewed
  key (a real corpus is ~90% one crawl), so the naive
  row_number-over-everything form would sort the dominant source's
  entire data on a single task; the prefilter bounds that window
  input regardless of skew, and a deterministic fallback keeps the
  result bit-identical to the one-phase form (see the function
  docstring for the exactness argument).
- ``score_calibration`` never sorts row-level data: a per
  (source, score) histogram aggregation (map-side combined), a
  cumulative window over that *aggregated* relation (rows = distinct
  scores per source, bounded by the score domain — not by corpus
  size), and a broadcast join back. Equals
  percent_rank() over (partition by source order by score) exactly.
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
    """Join-key skew diagnostic: the top-10 hottest keys of
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
# Prefilter head-room: expected survivors per source = FUDGE * k.
# P(survivors < k) per source is a lower-tail large-deviation event
# (Chernoff: exp(-FUDGE*k*(1-1/FUDGE+ln(1/FUDGE))) ~ 1e-11 at k=5,
# FUDGE=8); the fallback branch keeps even that case exact.
HOLDOUT_FUDGE = 8


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
    """Frozen eval holdout: exactly 5 documents per source, chosen
    by md5(doc_id) rank — reproducible across runs, engines, and
    input partitionings (unlike df.sample), and guaranteed per-domain
    coverage (unlike a global hash gate).

    Two-phase plan (the hot-partition fix): phase 1 keeps only rows
    whose md5's leading 32 bits fall below a per-source threshold
    ``min(1, FUDGE·k/n)·2^32`` computed from a counts aggregation —
    expected survivors ≈ FUDGE·k per source no matter how skewed
    ``source`` is — and phase 2 runs the exact row_number window on
    that survivor set only.

    Exactness: md5 hex sorts lexicographically as its numeric value
    and the 8-char prefix is its top 32 bits, so every row below the
    threshold sorts strictly before every row at-or-above it; hence
    whenever a source has ≥ k survivors, its true top-k by full md5
    are ALL survivors and the ranks agree with the one-phase form.
    Sources with < k survivors (n < k, or an astronomically unlikely
    hash fluctuation at FUDGE=8) fall back to ranking all their rows
    — deterministic, so the result is bit-identical to the naive
    window by construction, and the oracle keeps the one-phase SQL.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        deterministic_topk_per_group(
            d, "source", "doc_id", HOLDOUT_PER_SOURCE, HOLDOUT_FUDGE
        )
        .select("doc_id", "source", "rnk")
        .orderBy("source", "rnk")
    )


def deterministic_topk_per_group(
    df, group_col: str, id_col: str, k: int, fudge: int = 8
):
    """Deterministic md5-rank top-k per group with the two-phase
    hot-partition-safe plan (factored out of eval_holdout_split in
    round 5; reused by label_balance_resample): phase 1 keeps rows
    whose md5's leading 32 bits fall below a per-group threshold
    ``min(1, fudge·k/n)·2^32`` (expected survivors ≈ fudge·k per
    group regardless of group skew), phase 2 runs the exact
    row_number window on survivors only; any group whose survivor
    count fell below k deterministically falls back to ranking all
    its rows, so the result is bit-identical to the one-phase window
    by construction. Returns the input columns plus ``rnk`` (1..k)
    for the kept rows."""
    keyed = df.select(
        "*", F.md5(F.col(id_col).cast("string")).alias("hkey")
    )
    counts = keyed.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_grp"))
    thr = counts.select(
        group_col,
        F.least(
            F.lit(1 << 32).cast("long"),
            (F.lit(float((1 << 32) * fudge * k)) / F.col("n_grp")).cast("long")
            + 1,
        ).alias("thr"),
    )
    hkey32 = F.conv(F.substring("hkey", 1, 8), 16, 10).cast("long")
    pre = keyed.join(F.broadcast(thr), group_col).where(
        hkey32 < F.col("thr")
    ).drop("thr")
    short = (
        pre.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("m"))
        .join(counts, group_col, "right_outer")
        .where(F.coalesce(F.col("m"), F.lit(0)) < k)
        .select(group_col)
    )
    base = pre.join(F.broadcast(short), group_col, "left_anti").unionAll(
        keyed.join(F.broadcast(short), group_col, "left_semi")
    )
    w = Window.partitionBy(group_col).orderBy("hkey", id_col)
    return (
        base.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .drop("hkey")
    )


BALANCE_PER_LABEL = 30


@register(
    "label_balance_resample",
    oracle=f"""
    WITH ranked AS (
      SELECT vec_id, label,
             row_number() OVER (
               PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rnk
      FROM embeddings
    )
    SELECT vec_id, label, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {BALANCE_PER_LABEL}
    ORDER BY label, rnk
    """,
    tags=("sampling", "balance", "deterministic"),
)
def label_balance_resample(spark, sf_dir):
    """Class-balanced downsample: every label keeps exactly
    min(count, {k}) vectors chosen by md5(vec_id) rank — the
    deterministic class-rebalancing pass a training pipeline runs
    when one label dominates the corpus (and the reproducible
    alternative to per-class random sampling). Same two-phase
    hot-partition-safe plan as eval_holdout_split
    (deterministic_topk_per_group): a label with 90% of 100 TB costs
    a broadcast-threshold filter plus a window over ~{fudge}·{k}
    survivors, never a sort of the hot label."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        deterministic_topk_per_group(
            e, "label", "vec_id", BALANCE_PER_LABEL, HOLDOUT_FUDGE
        )
        .select("vec_id", "label", "rnk")
        .orderBy("label", "rnk")
    )


label_balance_resample.__doc__ = label_balance_resample.__doc__.format(
    k=BALANCE_PER_LABEL, fudge=HOLDOUT_FUDGE
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
             PARTITION BY source ORDER BY raw_score), 6) AS calibrated
    FROM scored ORDER BY doc_id
    """,
    tags=("quality", "calibration", "histogram"),
)
def score_calibration(spark, sf_dir):
    """Cross-domain score calibration: replace a raw per-doc quality
    score (token count as the stand-in) with its percent-rank WITHIN
    its source, so one global keep-threshold treats every domain
    fairly (the fix for 'domain A's classifier scores run hot').

    Histogram plan (the hot-partition fix): ``source`` is highly
    skewed, so sorting each source's rows in one window task does
    not scale. Instead: (1) aggregate to a per (source, raw_score)
    histogram — map-side combined, output rows bounded by the score
    DOMAIN (distinct token counts), not corpus size; (2) one
    cumulative window over that aggregated relation; (3) broadcast
    the per-score CDF back onto the row stream. For tied-safe
    semantics this computes exactly
    ``percent_rank() OVER (PARTITION BY source ORDER BY raw_score)``
    = cum_lt/(n-1) with rank = min-rank over ties — every tied row
    gets the same calibrated value, so no per-row tie-break ordering
    (and therefore no row-level sort) is needed anywhere."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r" +")
    scored = d.select(
        "doc_id", "source", F.size(toks).cast("long").alias("raw_score")
    )
    hist = scored.groupBy("source", "raw_score").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = Window.partitionBy("source").orderBy("raw_score")
    w_all = Window.partitionBy("source")
    cdf = hist.select(
        "source",
        "raw_score",
        (F.sum("c").over(w_cum) - F.col("c")).alias("cum_lt"),
        F.sum("c").over(w_all).alias("n_src"),
    )
    return (
        scored.join(F.broadcast(cdf), ["source", "raw_score"])
        .select(
            "doc_id",
            "source",
            "raw_score",
            F.round(
                F.when(
                    F.col("n_src") > 1,
                    F.col("cum_lt") / (F.col("n_src") - 1).cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("calibrated"),
        )
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


# ----------------------------------------------------- winsorize_scores
WINSOR_LO_PCT = 5  # clip below the per-source p05
WINSOR_HI_PCT = 95  # and above the per-source p95


@register(
    "winsorize_scores",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS raw_score
      FROM documents
    ),
    hist AS (
      SELECT source, raw_score, count(*) AS c
      FROM scored GROUP BY 1, 2
    ),
    cum AS (
      SELECT source, raw_score,
             sum(c) OVER (PARTITION BY source ORDER BY raw_score) AS cum_le,
             sum(c) OVER (PARTITION BY source) AS n_src
      FROM hist
    ),
    bounds AS (
      SELECT source,
             CAST(min(CASE WHEN cum_le >= ({WINSOR_LO_PCT} * n_src + 99) // 100
                           THEN raw_score END) AS BIGINT) AS lo,
             CAST(min(CASE WHEN cum_le >= ({WINSOR_HI_PCT} * n_src + 99) // 100
                           THEN raw_score END) AS BIGINT) AS hi
      FROM cum GROUP BY source
    )
    SELECT s.doc_id, s.source, s.raw_score, b.lo, b.hi,
           least(greatest(s.raw_score, b.lo), b.hi) AS clipped
    FROM scored s JOIN bounds b ON s.source = b.source
    ORDER BY s.doc_id
    """,
    tags=("quality", "robust-stats", "histogram"),
)
def winsorize_scores(spark, sf_dir):
    """Per-source winsorization (outlier clipping at p{lo}/p{hi}):
    clamp each doc's raw quality score into its source's
    [p{lo}, p{hi}] order-statistic band — the robust-stats
    normalization applied before mixing per-source scores into one
    curation objective (a single source's pathological tail stops
    dominating the global threshold). Bounds are exact type-1
    quantiles: the smallest score whose cumulative count reaches
    ceil(q·n), all-integer arithmetic on both engines.

    Plan shape (same skew-proof recipe as score_calibration): the
    per-(source, score) histogram aggregates map-side (rows bounded
    by the score domain, not the corpus), the cumulative window runs
    over that aggregated relation, the two bounds reduce to one row
    per source, and the broadcast join clips the row stream in
    place. No row-level sort anywhere, so the ~90%-one-source skew
    of a real crawl never pins a task."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("raw_score")
    )
    hist = scored.groupBy("source", "raw_score").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.partitionBy("source").orderBy("raw_score")
    w_all = Window.partitionBy("source")
    cum = hist.select(
        "source",
        "raw_score",
        F.sum("c").over(w_cum).alias("cum_le"),
        F.sum("c").over(w_all).alias("n_src"),
    )

    def bound(pct):
        need = F.expr(f"({pct} * n_src + 99) div 100")
        return F.min(F.when(F.col("cum_le") >= need, F.col("raw_score")))

    bounds = cum.groupBy("source").agg(
        bound(WINSOR_LO_PCT).cast("bigint").alias("lo"),
        bound(WINSOR_HI_PCT).cast("bigint").alias("hi"),
    )
    return (
        scored.join(F.broadcast(bounds), "source")
        .select(
            "doc_id",
            "source",
            "raw_score",
            "lo",
            "hi",
            F.least(F.greatest("raw_score", "lo"), "hi").alias("clipped"),
        )
        .orderBy("doc_id")
    )


winsorize_scores.__doc__ = winsorize_scores.__doc__.format(
    lo=WINSOR_LO_PCT, hi=WINSOR_HI_PCT
)


# ---------------------------------------------------- quantile_normalize
@register(
    "quantile_normalize",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS raw_score
      FROM documents
    ),
    src_hist AS (
      SELECT source, raw_score, count(*) AS c
      FROM scored GROUP BY 1, 2
    ),
    src_cdf AS (
      SELECT source, raw_score,
             CAST(sum(c) OVER (PARTITION BY source ORDER BY raw_score) - c
                  AS BIGINT) AS cum_lt,
             CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n_src
      FROM src_hist
    ),
    g_hist AS (SELECT raw_score, count(*) AS c FROM scored GROUP BY 1),
    g_cdf AS (
      SELECT raw_score AS g_score,
             CAST(sum(c) OVER (ORDER BY raw_score) AS BIGINT) AS gcum_le
      FROM g_hist
    ),
    g_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
    ks AS (
      SELECT s.source, s.raw_score,
             CASE WHEN s.n_src > 1
                  THEN greatest(1::BIGINT,
                       CAST((s.cum_lt * g_n.n + s.n_src - 2) // (s.n_src - 1)
                            AS BIGINT))
                  ELSE 1::BIGINT END AS k
      FROM src_cdf s CROSS JOIN g_n
    ),
    mapped AS (
      SELECT ks.source, ks.raw_score,
             min(g.g_score) AS qnorm_score
      FROM ks JOIN g_cdf g ON g.gcum_le >= ks.k
      GROUP BY 1, 2
    )
    SELECT sc.doc_id, sc.source, sc.raw_score, m.qnorm_score
    FROM scored sc
    JOIN mapped m ON sc.source = m.source AND sc.raw_score = m.raw_score
    ORDER BY sc.doc_id
    """,
    tags=("quality", "normalization", "histogram"),
)
def quantile_normalize(spark, sf_dir):
    """Cross-source quantile normalization: replace each doc's raw
    score with the GLOBAL score at the same within-source quantile —
    the distribution-matching cousin of score_calibration (which
    stops at ranks): after mapping, every source's score
    distribution is a resampling of the corpus-wide one, so one
    global threshold is simultaneously fair per source AND expressed
    in interpretable global units. All-integer order statistics:
    the target index is k = ceil(cum_lt·N/(n_src−1)) clamped to
    [1, N], the mapped value the smallest global score whose
    cumulative count reaches k.

    Plan shape (same skew-proof recipe as the calibration family):
    per-source and global histograms aggregate map-side (rows
    bounded by the SCORE DOMAIN, not the corpus); the quantile
    mapping is a non-equi join between the two AGGREGATED relations
    — domain² work, corpus-size-independent — and the result
    broadcasts back onto the row stream. No row-level sort
    anywhere."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("raw_score")
    )
    src_hist = scored.groupBy("source", "raw_score").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = Window.partitionBy("source").orderBy("raw_score")
    w_all = Window.partitionBy("source")
    src_cdf = src_hist.select(
        "source",
        "raw_score",
        (F.sum("c").over(w_cum) - F.col("c")).cast("bigint").alias("cum_lt"),
        F.sum("c").over(w_all).cast("bigint").alias("n_src"),
    )
    g_hist = scored.groupBy("raw_score").agg(F.count(F.lit(1)).alias("c"))
    g_cdf = g_hist.select(
        F.col("raw_score").alias("g_score"),
        F.sum("c").over(Window.orderBy("raw_score")).cast("bigint").alias("gcum_le"),
    )
    g_n = scored.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ks = src_cdf.crossJoin(F.broadcast(g_n)).select(
        "source",
        "raw_score",
        F.when(
            F.col("n_src") > 1,
            F.greatest(
                F.lit(1).cast("bigint"),
                F.expr("(cum_lt * n + n_src - 2) div (n_src - 1)").cast("bigint"),
            ),
        )
        .otherwise(F.lit(1).cast("bigint"))
        .alias("k"),
    )
    mapped = (
        ks.join(F.broadcast(g_cdf), F.col("gcum_le") >= F.col("k"))
        .groupBy("source", "raw_score")
        .agg(F.min("g_score").alias("qnorm_score"))
    )
    return (
        scored.join(F.broadcast(mapped), ["source", "raw_score"])
        .select("doc_id", "source", "raw_score", "qnorm_score")
        .orderBy("doc_id")
    )


# ---------------------------------------------- join_cardinality_estimator
CARD_TOPK = 5


@register(
    "join_cardinality_estimator",
    oracle=f"""
    WITH ca AS (
      SELECT o_orderkey AS k, count(*) AS n_orders FROM orders GROUP BY 1
    ),
    cb AS (
      SELECT l_orderkey AS k, count(*) AS n_lineitems FROM lineitem GROUP BY 1
    ),
    contrib AS (
      SELECT ca.k, ca.n_orders * cb.n_lineitems AS out_rows
      FROM ca JOIN cb USING (k)
    ),
    tot AS (SELECT sum(out_rows) AS total FROM contrib)
    SELECT k AS orderkey,
           CAST(out_rows AS BIGINT) AS out_rows,
           round(out_rows / CAST(t.total AS DOUBLE), 6) AS share,
           CAST(t.total AS BIGINT) AS join_total_rows,
           row_number() OVER (ORDER BY out_rows DESC, k) AS rnk
    FROM contrib, tot t
    QUALIFY rnk <= {CARD_TOPK}
    ORDER BY rnk
    """,
    tags=("profiling", "planning", "join"),
)
def join_cardinality_estimator(spark, sf_dir):
    """Pre-join cardinality profile for orders ⋈ lineitem on
    orderkey: EXACT output size Σₖ cntA(k)·cntB(k) from two per-key
    count aggregations (never the join itself), plus the top-{k}
    contributing keys and their share — the planning pass that
    decides broadcast vs shuffle vs salting BEFORE a 100 TB join
    runs, from aggregates that are linear in the inputs.

    Plan shape: two map-side-combined counts joined on the key, one
    1-row total broadcast back, top-{k} via TakeOrdered. The
    aggregated key relation is orders-of-magnitude smaller than
    either fact table."""
    o = load_table(spark, sf_dir, "orders").groupBy(
        F.col("o_orderkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    l = load_table(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("n_lineitems"))
    contrib = o.join(l, "k").select(
        "k", (F.col("n_orders") * F.col("n_lineitems")).alias("out_rows")
    )
    tot = contrib.agg(F.sum("out_rows").alias("total"))
    # TakeOrdered bounds the global top-k over the key-sized contrib
    # relation (per-partition top-k + driver merge — a 100 TB join
    # has billions of keys, so no global window sees them all); the
    # window only re-ranks the K survivors.
    w = Window.orderBy(F.desc("out_rows"), "orderkey")
    return (
        contrib.crossJoin(F.broadcast(tot))
        .select(
            F.col("k").alias("orderkey"),
            F.col("out_rows").cast("bigint").alias("out_rows"),
            F.round(F.col("out_rows") / F.col("total").cast("double"), 6).alias(
                "share"
            ),
            F.col("total").cast("bigint").alias("join_total_rows"),
        )
        .orderBy(F.desc("out_rows"), "orderkey")
        .limit(CARD_TOPK)
        .withColumn("rnk", F.row_number().over(w))
        .orderBy("rnk")
    )


join_cardinality_estimator.__doc__ = join_cardinality_estimator.__doc__.format(
    k=CARD_TOPK
)


# --------------------------------------------------- fk_integrity_audit
_FK_RELATIONS = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
)


def _fk_leg_sql(name, child, ckey, parent, pkey) -> str:
    return f"""
      SELECT '{name}' AS relationship,
             CAST((SELECT count(*) FROM {child}) AS BIGINT) AS n_child_rows,
             CAST((SELECT count(*) FROM {child} c
                   WHERE c.{ckey} IS NOT NULL
                     AND NOT EXISTS (SELECT 1 FROM {parent} p
                                     WHERE p.{pkey} = c.{ckey})) AS BIGINT)
               AS n_orphans,
             CAST((SELECT count(DISTINCT c.{ckey}) FROM {child} c
                   WHERE c.{ckey} IS NOT NULL
                     AND NOT EXISTS (SELECT 1 FROM {parent} p
                                     WHERE p.{pkey} = c.{ckey})) AS BIGINT)
               AS n_orphan_keys
    """


@register(
    "fk_integrity_audit",
    oracle="    "
    + "\n      UNION ALL\n".join(
        _fk_leg_sql(*rel) for rel in _FK_RELATIONS
    )
    + "\n    ORDER BY relationship",
    tags=("profiling", "quality", "integrity"),
)
def fk_integrity_audit(spark, sf_dir):
    """Referential-integrity audit across the star schema: for each
    declared child→parent relationship, the number of child rows
    whose foreign key has NO parent (orphans) and the distinct
    orphan key count — the data-quality gate an ingest pipeline runs
    before publishing a snapshot (0 everywhere on healthy data; any
    non-zero pinpoints the broken feed).

    Plan shape (round-5 verdict item 6 — the per-leg form re-scanned
    and re-shuffled every relationship, ~20 exchanges): ALL legs now
    share ONE tagged child-key relation — each child table is
    scanned once per declared key, union-all'd (free) into
    (relationship, key) rows, and aggregated in a single
    map-side-combined exchange. The parent keys form the same tagged
    shape (one small exchange), and the LEFT ANTI orphan join runs
    on (relationship, key) — both sides are already hash-partitioned
    on exactly that key by their aggregations, so the join adds NO
    exchange. n_child_rows falls out of the same child-key relation
    (sum of per-key counts, null keys included as a group), so no
    separate count(*) scans. Orphan detection never touches non-key
    columns; everything shuffles distinct keys only."""
    child_keys = None
    parents = None
    for name, child, ckey, parent, pkey in _FK_RELATIONS:
        ck = (
            load_table(spark, sf_dir, child)
            .select(
                F.lit(name).alias("relationship"),
                F.col(ckey).cast("bigint").alias("ck"),
            )
        )
        pk = load_table(spark, sf_dir, parent).select(
            F.lit(name).alias("relationship"),
            F.col(pkey).cast("bigint").alias("pk"),
        )
        child_keys = ck if child_keys is None else child_keys.unionAll(ck)
        parents = pk if parents is None else parents.unionAll(pk)
    # Materialize the aggregated child-key relation: it feeds both
    # the orphan leg and the totals leg, and without it Catalyst
    # pushes the anti join through the union — re-specializing
    # per-relationship joins and recomputing the whole union
    # aggregate once per consumer (measured: 13 exchanges, double
    # scans). With it, every child table is scanned once per
    # declared key and the union aggregate runs exactly once.
    from ingestor_etl_spark.plans.layout import materialize

    keyed = materialize(
        child_keys.groupBy("relationship", "ck").agg(
            F.count(F.lit(1)).alias("n")
        )
    )
    pdist = parents.groupBy("relationship", F.col("pk").alias("ck")).agg(
        F.lit(1).alias("one")
    ).select("relationship", "ck")
    orphans = (
        keyed.join(pdist, ["relationship", "ck"], "left_anti")
        .where(F.col("ck").isNotNull())
        .groupBy("relationship")
        .agg(
            F.sum("n").cast("bigint").alias("n_orphans"),
            F.count(F.lit(1)).cast("bigint").alias("n_orphan_keys"),
        )
    )
    totals = keyed.groupBy("relationship").agg(
        F.sum("n").cast("bigint").alias("n_child_rows")
    )
    return (
        totals.join(orphans, "relationship", "left")
        .select(
            "relationship",
            "n_child_rows",
            F.coalesce("n_orphans", F.lit(0)).cast("bigint").alias("n_orphans"),
            F.coalesce("n_orphan_keys", F.lit(0)).cast("bigint").alias("n_orphan_keys"),
        )
        .orderBy("relationship")
    )


# ------------------------------------------------------- schema_profile
# (column, spark min/max formatter, duckdb min/max formatter): numeric
# columns format through DECIMAL(12,2) so both engines print the same
# string; the timestamp formats explicitly (bare casts differ).
_PROFILE_COLS = (
    ("l_orderkey", "cast({agg}(l_orderkey) as string)",
     "CAST({agg}(l_orderkey) AS VARCHAR)"),
    ("l_quantity", "cast(cast({agg}(l_quantity) as decimal(12,2)) as string)",
     "CAST(CAST({agg}(l_quantity) AS DECIMAL(12,2)) AS VARCHAR)"),
    ("l_extendedprice",
     "cast(cast({agg}(l_extendedprice) as decimal(12,2)) as string)",
     "CAST(CAST({agg}(l_extendedprice) AS DECIMAL(12,2)) AS VARCHAR)"),
    ("l_returnflag", "{agg}(l_returnflag)", "{agg}(l_returnflag)"),
    ("l_shipdate",
     "date_format({agg}(l_shipdate), 'yyyy-MM-dd HH:mm:ss')",
     "strftime({agg}(l_shipdate), '%Y-%m-%d %H:%M:%S')"),
)


def _profile_oracle() -> str:
    aggs = ["count(*) AS n_rows"]
    legs = []
    for c, _, fmt in _PROFILE_COLS:
        aggs += [
            f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nulls_{c}",
            f"count(DISTINCT {c}) AS nd_{c}",
            fmt.format(agg="min") + f" AS min_{c}",
            fmt.format(agg="max") + f" AS max_{c}",
        ]
        legs.append(
            f"SELECT '{c}' AS column_name, CAST(n_rows AS BIGINT) AS n_rows,"
            f" CAST(nulls_{c} AS BIGINT) AS n_nulls,"
            f" CAST(nd_{c} AS BIGINT) AS n_distinct,"
            f" min_{c} AS min_value, max_{c} AS max_value FROM s"
        )
    return (
        "    WITH s AS (SELECT " + ", ".join(aggs) + " FROM lineitem)\n    "
        + "\n    UNION ALL ".join(legs)
        + "\n    ORDER BY column_name"
    )


@register(
    "schema_profile",
    oracle=_profile_oracle(),
    tags=("profiling", "schema", "quality"),
)
def schema_profile(spark, sf_dir):
    """Column-level data profile of lineitem (null counts, exact
    distinct counts, formatted min/max) — the pandas-profiling-style
    census a pipeline publishes with every snapshot, computed in ONE
    aggregation pass: all five columns' metrics come from a single
    full-scan aggregate (Spark plans the multi-distinct via one
    expand — one exchange total, never one scan per column), then
    unpivot to the per-column report executor-side via inline
    explode. Numeric min/max format through DECIMAL(12,2) and the
    timestamp through an explicit pattern so both engines print
    identical strings."""
    # Round 13 (guide §2 — know what your aggregate compiles to):
    # putting all five countDistinct's in ONE aggregate made Spark
    # plan the classic Expand — 6× the input rows — and, because the
    # same aggregate also carries min/max over a STRING column
    # (variable-length buffers are not HashAggregate-compatible), the
    # whole expanded relation went through Sort + SortAggregate: a
    # full sort of 6×|lineitem| wide rows for a 5-row report
    # (measured 2.4-2.9 s at sf0.1, flat in data size — sort
    # constant, not data cost). Splitting the query into one global
    # stats aggregate (no group keys — partial fold per partition,
    # no sort even with string buffers) plus five independent
    # countDistinct legs (each a two-stage HashAggregate over ONE
    # parquet-pruned column) removes the Expand and every Sort;
    # the six 1-row results meet by broadcast cross-join. Values are
    # identical — the same aggregates, computed in separate passes.
    lineitem = load_table(spark, sf_dir, "lineitem")
    stats_aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, fmt, _ in _PROFILE_COLS:
        stats_aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}"),
            F.expr(fmt.format(agg="min")).alias(f"min_{c}"),
            F.expr(fmt.format(agg="max")).alias(f"max_{c}"),
        ]
    s = lineitem.agg(*stats_aggs)
    for c, _, _ in _PROFILE_COLS:
        s = s.crossJoin(
            F.broadcast(lineitem.agg(F.countDistinct(c).alias(f"nd_{c}")))
        )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col(f"nulls_{c}").cast("bigint").alias("n_nulls"),
                F.col(f"nd_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"min_{c}").alias("min_value"),
                F.col(f"max_{c}").alias("max_value"),
            )
            for c, _, _ in _PROFILE_COLS
        ]
    )
    return (
        s.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("column_name")
    )
