"""Training-data pipeline operators, second wave.

Builds on text_ops/dedup_ops with the steps a corpus-preparation
pipeline runs after candidate generation: near-dup **cluster
assignment** (connected components over the LSH pair graph),
**token-budget packing** of documents into training shards,
deterministic **stratified sampling**, **text normalization**, and a
temporal **conversion funnel** over the events stream.

Cross-engine determinism: hashes are md5 (identical in Spark and
DuckDB); threshold sampling uses a 32-bit hex prefix of md5 so both
engines compute the identical bucket; all window frames are ROWS
with a total order (doc_id) inside each partition.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.operators.graph import connected_components
from ingestor_etl_spark.queries import register
from ingestor_etl_spark.queries.dedup_ops import (
    N_BANDS,
    SALTS,
    _SPARK_BAND_LIST,
    _SQL_BANDS,
    _SQL_SHINGLED,
    _shingled,
    _spark_minhash,
    _sql_minhash,
    _with_minhash_sigs,
)
from ingestor_etl_spark.queries.text_ops import STOPWORDS, _SQL_STOP, _SQL_TOKENS

_SQL_PAIRS = f"""
    shingled AS ({_SQL_SHINGLED}),
    sigs AS (
        SELECT doc_id, {", ".join(f"{_sql_minhash(s)} AS {s}" for s in SALTS)}
        FROM shingled
    ),
    banded AS (
        SELECT doc_id, {_SQL_BANDS} FROM sigs
    ),
    long_form AS (
        {" UNION ALL ".join(f"SELECT doc_id, {i} AS band_no, band{i} AS band_key FROM banded" for i in range(N_BANDS))}
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM long_form a JOIN long_form b
          ON a.band_no = b.band_no AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
"""


@register(
    "dedup_cc_clusters",
    oracle=f"""
    WITH RECURSIVE {_SQL_PAIRS},
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
    )
    SELECT node AS doc_id, MIN(r) AS cluster_id
    FROM reach GROUP BY node ORDER BY doc_id
    """,
    tags=("dedup", "connected-components", "iterative"),
)
def dedup_cc_clusters(spark, sf_dir):
    """Near-dup cluster assignment: MinHash-LSH candidate pairs →
    connected components (operators/graph.py, iterative min-label
    propagation; the oracle walks the same graph with a recursive
    CTE). The full dedup story: pairs alone can't answer "which doc
    do I keep" — components can (keep min doc_id per cluster)."""
    return (
        connected_components(_lsh_pairs(spark, sf_dir), src="doc_a", dst="doc_b")
        .select(F.col("node").alias("doc_id"), F.col("component").alias("cluster_id"))
        .orderBy("doc_id")
    )


def _lsh_pairs(spark, sf_dir):
    """MinHash-LSH candidate pairs (band-bucket equi-join) — shared
    by dedup_cc_clusters and canonical_docs."""
    base = _with_minhash_sigs(_shingled(spark, sf_dir))
    # Materialize the banded signatures (7 small columns/doc): the
    # band bucket self-join reads this relation on BOTH sides, and
    # without the cache each side re-runs the full shingle+minhash
    # pipeline (measured ~2× the whole query).
    from ingestor_etl_spark.plans.layout import materialize

    banded = materialize(base.selectExpr("doc_id", *_SPARK_BAND_LIST))
    long_form = banded.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"band{i}") for i in range(N_BANDS)])).alias(
            "band_no", "band_key"
        ),
    )
    a, b = long_form.alias("a"), long_form.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register(
    "canonical_docs",
    oracle=f"""
    WITH RECURSIVE {_SQL_PAIRS},
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
    ),
    clusters AS (
        SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    ),
    scored AS (
        SELECT c.cluster_id, c.doc_id,
               len({_SQL_TOKENS}) AS n_tokens
        FROM clusters c JOIN documents USING (doc_id)
    ),
    ranked AS (
        SELECT cluster_id, doc_id, n_tokens,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY n_tokens DESC, doc_id) AS rnk,
               count(*) OVER (PARTITION BY cluster_id) AS n_members
        FROM scored
    )
    SELECT cluster_id, doc_id AS canonical_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rnk = 1 ORDER BY cluster_id
    """,
    tags=("dedup", "canonical", "argmax"),
)
def canonical_docs(spark, sf_dir):
    """Canonical-document election: for every near-dup cluster
    (MinHash-LSH pairs → connected components) keep the BEST member
    — longest document, doc_id as the deterministic tiebreak — the
    step that turns cluster ids into an actual keep-list. The
    election is AGGREGATION-ONLY: ``max(struct(n_tokens, -doc_id))``
    per cluster (map-side combined, no per-cluster window, no sort),
    so a pathological million-member cluster costs one combiner
    cell, not one task. The oracle re-walks the same graph with a
    recursive CTE and elects with a window — same result, different
    engine idiom."""
    clusters = connected_components(
        _lsh_pairs(spark, sf_dir), src="doc_a", dst="doc_b"
    ).select(F.col("node").alias("doc_id"), F.col("component").alias("cluster_id"))
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r" +")
    scored = clusters.join(
        d.select("doc_id", F.size(toks).cast("long").alias("n_tokens")), "doc_id"
    )
    best = scored.groupBy("cluster_id").agg(
        F.max(F.struct(F.col("n_tokens"), (-F.col("doc_id")).alias("neg_id"))).alias(
            "best"
        ),
        F.count(F.lit(1)).alias("n_members"),
    )
    return (
        best.select(
            "cluster_id",
            (-F.col("best.neg_id")).alias("canonical_id"),
            F.col("best.n_tokens").alias("n_tokens"),
            "n_members",
        )
        .orderBy("cluster_id")
    )


@register(
    "doc_pack_budget",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, len({_SQL_TOKENS}) AS n_tokens FROM documents
    ), cum AS (
        SELECT doc_id, source, n_tokens,
               CAST(SUM(n_tokens) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM toks
    )
    SELECT doc_id, source, n_tokens, cum_tokens,
           (cum_tokens - n_tokens) // 2000 AS pack_id
    FROM cum ORDER BY source, doc_id
    """,
    tags=("packing", "window"),
)
def doc_pack_budget(spark, sf_dir):
    """Token-budget packing: assign documents to ~2000-token training
    shards by cumulative token count within each source, in doc_id
    order (deterministic). Integer division keeps both engines exact.
    One shuffle on source; at 100 TB, source is the natural shard
    key and each partition packs independently — no global sort."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.size(F.split(F.trim(F.lower("text")), r" +")).alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("pack_id", F.expr("(cum_tokens - n_tokens) div 2000"))
        .orderBy("source", "doc_id")
    )


@register(
    "stratified_sample",
    oracle="""
    WITH hashed AS (
        SELECT doc_id, lang,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
                 AS bucket
        FROM documents
    )
    SELECT doc_id, lang, bucket
    FROM hashed
    WHERE bucket < CASE lang WHEN 'en' THEN 20 WHEN 'es' THEN 40 WHEN 'fr' THEN 40
                             ELSE 60 END
    ORDER BY doc_id
    """,
    tags=("sampling", "deterministic"),
)
def stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling: per-language keep rates
    applied by hashing doc_id into 100 buckets (md5 prefix — no RNG,
    so the sample is reproducible across runs/engines and stable
    under repartitioning, unlike ``df.sample``). Pure filter — no
    shuffle, fully pushed into the scan pipeline."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    rate = (
        F.when(F.col("lang") == "en", 20)
        .when(F.col("lang").isin("es", "fr"), 40)
        .otherwise(60)
    )
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
        .where(F.col("bucket") < rate)
        .orderBy("doc_id")
    )


@register(
    "text_normalize",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id,
               array_to_string(
                   list_filter({_SQL_TOKENS}, t -> t NOT IN ({_SQL_STOP})), ' ') AS norm_text
        FROM documents
    )
    SELECT doc_id,
           md5(norm_text) AS norm_fp,
           length(norm_text) AS norm_chars,
           len(string_split(norm_text, ' ')) AS kept_tokens
    FROM norm ORDER BY doc_id
    """,
    tags=("text", "normalize"),
)
def text_normalize(spark, sf_dir):
    """Normalization pass: lowercase, whitespace collapse, stopword
    removal → canonical text fingerprint. The cleaned-text md5 is
    the dedup key for 'normalized-exact' dedup (stricter than raw
    exact, cheaper than MinHash). Narrow per-doc pass, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower("text")), r" +")
    norm = F.array_join(F.filter(toks, lambda t: ~t.isin(*STOPWORDS)), " ")
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_fp"),
        F.length(norm).alias("norm_chars"),
        F.size(F.split(norm, " ")).alias("kept_tokens"),
    ).orderBy("doc_id")


@register(
    "events_funnel",
    oracle="""
    WITH c AS (
        SELECT user_id, MIN(ts) AS first_click
        FROM events WHERE event_type = 'click' GROUP BY user_id
    ), p AS (
        SELECT c.user_id, MIN(e.ts) AS first_purchase
        FROM c JOIN events e
          ON e.user_id = c.user_id AND e.event_type = 'purchase'
         AND e.ts > c.first_click
        GROUP BY c.user_id
    )
    SELECT c.user_id,
           epoch_us(first_click) AS first_click_us,
           epoch_us(first_purchase) AS first_purchase_us,
           (first_purchase IS NOT NULL
            AND first_purchase <= first_click + INTERVAL 1 HOUR) AS converted_1h
    FROM c LEFT JOIN p ON p.user_id = c.user_id
    ORDER BY c.user_id
    """,
    tags=("funnel", "temporal"),
)
def events_funnel(spark, sf_dir):
    """Click→purchase conversion funnel: per user, first click, the
    first purchase strictly after it, and whether conversion happened
    within one hour. Both aggregates and the join key on user_id —
    one exchange serves all three stages."""
    e = load_table(spark, sf_dir, "events")
    clicks = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = (
        clicks.join(
            e.where(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
            ),
            (F.col("p_user") == F.col("user_id")) & (F.col("p_ts") > F.col("first_click")),
        )
        .groupBy(F.col("user_id").alias("pp_user"))
        .agg(F.min("p_ts").alias("first_purchase"))
    )
    return (
        clicks.join(purchases, clicks.user_id == F.col("pp_user"), "left_outer")
        .select(
            "user_id",
            F.unix_micros("first_click").alias("first_click_us"),
            F.unix_micros("first_purchase").alias("first_purchase_us"),
            (
                F.col("first_purchase").isNotNull()
                & (F.col("first_purchase") <= F.col("first_click") + F.expr("INTERVAL 1 HOUR"))
            ).alias("converted_1h"),
        )
        .orderBy("user_id")
    )


@register(
    "doc_chunk_overlap",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ), ex AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, GREATEST(len(toks) - 16, 1), 64)) AS i
        FROM toks
    )
    SELECT doc_id,
           CAST((i - 1) // 64 AS INTEGER) AS chunk_no,
           md5(array_to_string(toks[i : i + 79], ' ')) AS chunk_fp,
           CAST(len(toks[i : i + 79]) AS BIGINT) AS n_tokens
    FROM ex
    ORDER BY doc_id, chunk_no
    """,
    tags=("chunking", "context-window", "training-data"),
)
def doc_chunk_overlap(spark, sf_dir):
    """Context-window chunking with overlap: each document's token
    stream is cut into windows of 80 tokens with stride 64 (16-token
    overlap), the unit a training pipeline feeds a fixed-context
    model. Start offsets come from ``sequence(1, n-16, 64)`` exploded
    per document; each chunk is ``slice`` + ``array_join`` — all
    native array algebra, no UDF. The chunk fingerprint (md5) is the
    cross-engine value under test; a real pipeline would keep the
    text.

    Scale: narrow per-doc pass (split → sequence → explode → slice);
    output rows ≈ input tokens / 64. No shuffle at all — the explode
    multiplies rows inside the scan stage, and downstream repartition
    is the consumer's choice."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("toks") - F.lit(16), F.lit(1)), F.lit(64)
    )
    piece = F.slice(F.col("toks"), F.col("i"), 80)
    return (
        d.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", F.explode(starts).alias("i"))
        .select(
            "doc_id",
            ((F.col("i") - 1) / F.lit(64)).cast("int").alias("chunk_no"),
            F.md5(F.array_join(piece, " ")).alias("chunk_fp"),
            F.size(piece).cast("long").alias("n_tokens"),
        )
        .orderBy("doc_id", "chunk_no")
    )


@register(
    "epoch_resample",
    oracle="""
    WITH h AS (
        SELECT doc_id, source,
               CAST('0x' || substr(md5('rs' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                 % 100 AS bucket
        FROM documents
    ), r AS (
        SELECT doc_id, source,
               (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
                            WHEN 'src2' THEN 1 ELSE 0 END
                + CASE WHEN bucket < CASE source WHEN 'src0' THEN 50
                                                 WHEN 'src1' THEN 50
                                                 WHEN 'src2' THEN 0
                                                 ELSE 75 END
                       THEN 1 ELSE 0 END) AS repeats
        FROM h
    )
    SELECT doc_id, source, CAST(unnest(generate_series(1, repeats)) AS BIGINT) AS copy_no
    FROM r WHERE repeats >= 1
    ORDER BY doc_id, copy_no
    """,
    tags=("resampling", "mixture", "training-data"),
)
def epoch_resample(spark, sf_dir):
    """Deterministic epoch resampling: materialize per-source mixture
    weights (here src0→2.5, src1→0.5, src2→1.0, rest→0.75 — in
    practice the output of domain_mixture) as document copies.
    ``floor(w)`` integer copies plus one more when the doc's md5
    bucket falls under the fractional part — no RNG, so every engine
    and every rerun emits the identical epoch. Documents with
    w < 1 and a losing bucket drop out (downsampling), matching the
    empty-sequence explode.

    Scale: narrow pass — hash, two CASE columns, sequence-explode.
    The output multiplies rows by the average weight, never more;
    no shuffle, no driver participation."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("rs"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    intpart = (
        F.when(F.col("source") == "src0", 2)
        .when(F.col("source") == "src1", 0)
        .when(F.col("source") == "src2", 1)
        .otherwise(0)
    )
    thresh = (
        F.when(F.col("source") == "src0", 50)
        .when(F.col("source") == "src1", 50)
        .when(F.col("source") == "src2", 0)
        .otherwise(75)
    )
    repeats = intpart + (bucket < thresh).cast("int")
    copies = F.when(repeats >= 1, F.sequence(F.lit(1), repeats)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        d.select("doc_id", "source", F.explode(copies).alias("copy_no"))
        .select("doc_id", "source", F.col("copy_no").cast("long").alias("copy_no"))
        .orderBy("doc_id", "copy_no")
    )


@register(
    "dedup_report",
    oracle=f"""
    WITH RECURSIVE {_SQL_PAIRS},
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
    ),
    clusters AS (
        SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    ),
    exact AS (
        SELECT count(*) AS n_docs,
               count(*) - count(DISTINCT md5(text)) AS n_exact_dups
        FROM documents
    ),
    cand AS (SELECT count(*) AS n_lsh_pairs FROM pairs),
    cc AS (
        SELECT count(*) AS n_clustered_docs,
               count(DISTINCT cluster_id) AS n_clusters
        FROM clusters
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_exact_dups AS BIGINT) AS n_exact_dups,
           CAST(n_lsh_pairs AS BIGINT) AS n_lsh_pairs,
           CAST(n_clusters AS BIGINT) AS n_clusters,
           CAST(n_clustered_docs AS BIGINT) AS n_clustered_docs,
           CAST(n_clustered_docs - n_clusters AS BIGINT) AS n_docs_removed,
           (n_docs - (n_clustered_docs - n_clusters))
             / CAST(n_docs AS DOUBLE) AS keep_rate
    FROM exact, cand, cc
    """,
    tags=("dedup", "card", "report"),
)
def dedup_report(spark, sf_dir):
    """The dedup release card: one row tying the whole stack
    together — corpus size, exact-duplicate count, LSH candidate
    volume, near-dup cluster count/membership, documents a
    keep-one-per-cluster policy removes, and the resulting keep
    rate. This is the before/after summary a 100 TB dedup run
    publishes. Three independent aggregate branches (exact
    fingerprints; candidate pairs; components) cross-joined as
    1-row relations — each branch keeps its own scale-safe shape
    (hash agg / bucketed LSH join / checkpointed label
    propagation). Parity: all counts BIGINT; keep_rate is one
    int/int double division."""
    d = load_table(spark, sf_dir, "documents")
    exact = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text"))).alias("n_exact_dups"),
    )
    # Materialize the pair relation: it feeds both the count branch
    # and connected_components' edge checkpoint — without this the
    # full LSH banding join runs twice (measured ~2× the query cost
    # at sf0.1).
    from ingestor_etl_spark.plans.layout import materialize

    pairs = materialize(_lsh_pairs(spark, sf_dir))
    cand = pairs.agg(F.count(F.lit(1)).alias("n_lsh_pairs"))
    clusters = connected_components(pairs, src="doc_a", dst="doc_b")
    cc = clusters.agg(
        F.count(F.lit(1)).alias("n_clustered_docs"),
        F.countDistinct("component").alias("n_clusters"),
    )
    return (
        exact.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(cc))
        .select(
            "n_docs",
            "n_exact_dups",
            "n_lsh_pairs",
            "n_clusters",
            "n_clustered_docs",
            (F.col("n_clustered_docs") - F.col("n_clusters")).alias("n_docs_removed"),
            (
                (F.col("n_docs") - (F.col("n_clustered_docs") - F.col("n_clusters")))
                / F.col("n_docs").cast("double")
            ).alias("keep_rate"),
        )
    )


# ---------------------------------------------------- curation_pipeline
PIPE_MIN_TOKENS = 30  # quality floor for the composite pipeline


def _sql_curation_pre() -> str:
    from ingestor_etl_spark.queries.corpus_ops import (
        REPUTATION_GOOD_CHARS,
        REPUTATION_KEEP_MILLI,
    )

    return f"""
    docs0 AS (
      SELECT doc_id, source, text, n_chars,
             len({_SQL_TOKENS}) AS n_toks,
             md5(lower(trim(text))) AS fp
      FROM documents
    ),
    firsts AS (SELECT fp, min(doc_id) AS keep FROM docs0 GROUP BY fp),
    rep AS (
      SELECT source,
             CAST((1000 * sum(CASE WHEN n_chars >= {REPUTATION_GOOD_CHARS}
                              THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
               AS rep_milli
      FROM documents GROUP BY source
    ),
    flagged AS (
      SELECT d.*, CASE WHEN d.doc_id <> f.keep THEN 'exact_dup'
                       WHEN r.rep_milli < {REPUTATION_KEEP_MILLI}
                         THEN 'bad_source'
                       WHEN d.n_toks < {PIPE_MIN_TOKENS} THEN 'low_quality'
                  END AS pre
      FROM docs0 d
      JOIN firsts f ON d.fp = f.fp
      JOIN rep r ON d.source = r.source
    ),
    survivors AS (SELECT * FROM flagged WHERE pre IS NULL)
"""


def _make_curation_oracle() -> str:
    from ingestor_etl_spark.queries.dedup_ops import _SQL_SHINGLES

    return f"""
    WITH RECURSIVE {_sql_curation_pre()},
    shingled AS (
      SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM survivors
      WHERE len({_SQL_SHINGLES}) > 0
    ),
    sigs AS (
        SELECT doc_id, {", ".join(f"{_sql_minhash(s)} AS {s}" for s in SALTS)}
        FROM shingled
    ),
    banded AS (SELECT doc_id, {_SQL_BANDS} FROM sigs),
    long_form AS (
        {" UNION ALL ".join(f"SELECT doc_id, {i} AS band_no, band{i} AS band_key FROM banded" for i in range(N_BANDS))}
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM long_form a JOIN long_form b
          ON a.band_no = b.band_no AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
    ),
    clusters AS (
        SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    ),
    canon AS (
        SELECT cluster_id, doc_id AS canonical_id FROM (
          SELECT c.cluster_id, c.doc_id,
                 row_number() OVER (PARTITION BY c.cluster_id
                                    ORDER BY s.n_toks DESC, c.doc_id) AS rnk
          FROM clusters c JOIN survivors s USING (doc_id)
        ) WHERE rnk = 1
    ),
    near AS (
        SELECT c.doc_id FROM clusters c
        JOIN canon k ON c.cluster_id = k.cluster_id
        WHERE c.doc_id <> k.canonical_id
    )
    SELECT fl.doc_id, fl.source, CAST(fl.n_toks AS BIGINT) AS n_toks,
           COALESCE(fl.pre,
                    CASE WHEN near.doc_id IS NOT NULL THEN 'near_dup'
                         ELSE 'kept' END) AS disposition
    FROM flagged fl LEFT JOIN near ON fl.doc_id = near.doc_id
    ORDER BY fl.doc_id
    """


@register(
    "curation_pipeline",
    oracle=_make_curation_oracle(),
    tags=("pipeline", "composite", "dedup", "quality"),
)
def curation_pipeline(spark, sf_dir):
    """The END-TO-END curation pass, one query: normalize →
    exact-dedup (fingerprint firsts) → source-reputation gate →
    token-count quality floor → MinHash-LSH near-dup clustering of
    the SURVIVORS → canonical election — emitting every document
    with its disposition (exact_dup / bad_source / low_quality /
    near_dup / kept). This is the composition statement: the
    operators the registry exposes individually chain into one plan
    a real corpus release runs nightly, with precedence semantics
    (a doc is judged by the FIRST gate that rejects it).

    Plan shape: every stage keeps its standalone scale posture —
    map-side fingerprint firsts, broadcast reputation keep-list,
    LSH bucket joins confined to survivors, checkpointed label
    propagation, aggregation-only canonical argmax (no per-cluster
    window in the Spark plan; the oracle uses one, a bounded-group
    idiom). The flagged relation materializes once and feeds both
    the survivor branch and the final disposition join."""
    from ingestor_etl_spark.plans.layout import materialize
    from ingestor_etl_spark.queries.corpus_ops import (
        REPUTATION_GOOD_CHARS,
        REPUTATION_KEEP_MILLI,
    )
    from ingestor_etl_spark.queries.dedup_ops import _band_pairs, _SPARK_SHINGLES

    d = load_table(spark, sf_dir, "documents")
    toks_n = F.size(F.split(F.trim(F.col("text")), r" +"))
    base = d.select(
        "doc_id",
        "source",
        "text",
        "n_chars",
        toks_n.alias("n_toks"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
    )
    firsts = base.groupBy("fp").agg(F.min("doc_id").alias("keep"))
    rep = d.groupBy("source").agg(
        F.expr(
            f"(1000 * sum(CASE WHEN n_chars >= {REPUTATION_GOOD_CHARS} "
            "THEN 1 ELSE 0 END)) div count(*)"
        ).alias("rep_milli")
    )
    pre = (
        F.when(F.col("doc_id") != F.col("keep"), "exact_dup")
        .when(F.col("rep_milli") < REPUTATION_KEEP_MILLI, "bad_source")
        .when(F.col("n_toks") < PIPE_MIN_TOKENS, "low_quality")
    )
    flagged = materialize(
        base.join(firsts, "fp")
        .join(F.broadcast(rep), "source")
        .withColumn("pre", pre)
    )
    survivors = flagged.where(F.col("pre").isNull())
    shingled = survivors.selectExpr(
        "doc_id", f"{_SPARK_SHINGLES} AS shingles"
    ).where(F.size("shingles") > 0)
    pairs = _band_pairs(shingled)
    clusters = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    canon = (
        clusters.join(survivors.select("doc_id", "n_toks"), "doc_id")
        .groupBy("cluster_id")
        .agg(F.max(F.struct(F.col("n_toks"), (-F.col("doc_id")).alias("neg"))).alias("best"))
        .select("cluster_id", (-F.col("best.neg")).alias("canonical_id"))
    )
    near = (
        clusters.join(canon, "cluster_id")
        .where(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id", F.lit("near_dup").alias("nd"))
    )
    return (
        flagged.join(near, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.col("n_toks").cast("bigint").alias("n_toks"),
            F.coalesce("pre", "nd", F.lit("kept")).alias("disposition"),
        )
        .orderBy("doc_id")
    )
