"""Training-data curation operators, wave 3: segment-level global
dedup, BM25 retrieval, unigram-LM perplexity filtering, hash-bucket
shard packing, and value histograms.

These extend the corpus-hygiene family (corpus_ops.py) with the
remaining steps of a pretraining data pipeline: C4-style duplicate
*span* removal (the corpus has no newlines, so the unit is a fixed
8-token segment instead of a line — the machinery is identical),
lexical retrieval over the corpus (BM25, the classic data-curation
ranking function), LM-likelihood quality scoring (CCNet/Gopher-style
perplexity filters re-expressed as a corpus-unigram model so the
oracle stays closed-form), and deterministic shard manifests for
training-data writes.

Scale notes (see SCALING.md):
- ``segment_dedup`` finds first occurrences with groupBy(seg).min —
  map-side partial aggregation absorbs hot segments (boilerplate
  repeated millions of times collapses to one row per partition
  before the shuffle), which a row_number window over the segment
  key would not: a window must co-locate every occurrence of a hot
  segment in one task. The oracle uses the window form — identical
  semantics, and the oracle never runs at scale.
- ``bm25_search`` / ``unigram_logprob`` keep corpus-sized relations
  on the shuffle-join side and broadcast only bounded artifacts
  (term stats, the 1-row corpus aggregate).
- ``shard_pack`` buckets by md5(doc_id) — shards are hash-uniform,
  need no global sort, and any subset of executors can write any
  subset of shards independently. Exact-N-row shards would force a
  global row_number (single-partition window); approximately-equal
  hash shards are what large-scale writers actually use.

Float parity with the DuckDB oracle follows the repo convention:
every per-row double is rounded then cast to DECIMAL before any
SUM, so aggregation order can never change the result; divisions
happen once, in the same expression shape, on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import register

_TOKENS_SQL = "string_split_regex(trim(text), ' +')"

SEG_LEN = 8

_SEGS_SQL = f"""
      SELECT doc_id, j AS seg_no,
             array_to_string(toks[j*{SEG_LEN}+1 : j*{SEG_LEN}+{SEG_LEN}], ' ') AS seg
      FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
           LATERAL (SELECT unnest(range(0, (len(toks)+{SEG_LEN - 1})//{SEG_LEN})) AS j) p
"""


@register(
    "segment_dedup",
    oracle=f"""
    WITH segs AS ({_SEGS_SQL}),
    ranked AS (
      SELECT doc_id, seg_no, seg,
             row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rnk
      FROM segs
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_segs,
           CAST(sum(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(string_agg(CASE WHEN rnk = 1 THEN seg END, chr(10) ORDER BY seg_no))
             AS kept_md5
    FROM ranked GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("dedup", "corpus", "segment"),
)
def segment_dedup(spark, sf_dir):
    """C4-style duplicate-span removal: split every document into
    consecutive 8-token segments, keep only each segment's
    first corpus-wide occurrence (ordered by doc_id, then position),
    and return per-doc survival stats plus an md5 of the retained
    text (reference analog: the dedup stage of C4/RefinedWeb line
    dedup; the reference engine has no corpus ops — beyond-reference
    surface, SURVEY §8.1).

    First occurrences come from groupBy(seg).agg(min(struct)) rather
    than a row_number window: partial aggregation collapses hot
    segments map-side, so a boilerplate segment occurring 10^8 times
    costs one row per input partition instead of one task holding
    every occurrence."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r" +")
    n_segs = ((F.size(toks) + F.lit(SEG_LEN - 1)) / SEG_LEN).cast("int")
    seg_arr = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda j: F.concat_ws(" ", F.slice(toks, j * SEG_LEN + 1, SEG_LEN)),
    )
    from ingestor_etl_spark.plans.layout import materialize

    # Round 13 (guide §2.1): segs feeds the first-occurrence
    # aggregation AND the flag join — materialized so the per-doc
    # segment construction runs once, not once per consumer.
    segs = materialize(
        d.select("doc_id", F.posexplode(seg_arr).alias("seg_no", "seg"))
    )
    firsts = segs.groupBy("seg").agg(
        F.min(F.struct("doc_id", "seg_no")).alias("first")
    )
    flagged = segs.join(firsts, "seg").select(
        "doc_id",
        "seg_no",
        "seg",
        (F.struct("doc_id", "seg_no") == F.col("first")).alias("kept"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("kept"), F.struct("seg_no", "seg"))
                )
            ).alias("kept_segs"),
        )
        .select(
            "doc_id",
            "n_segs",
            "n_kept",
            F.when(
                F.col("n_kept") > 0,
                F.md5(
                    F.concat_ws(
                        "\n", F.transform(F.col("kept_segs"), lambda x: x["seg"])
                    )
                ),
            ).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )


BM25_TERMS = ("spark", "stream", "vector")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 15

_TERMS_IN = ", ".join(f"'{t}'" for t in BM25_TERMS)


@register(
    "bm25_search",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, len(toks) AS dl, toks
      FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
    ),
    stats AS (SELECT count(*) AS n, sum(dl) AS sdl FROM docs),
    tf AS (
      SELECT doc_id, dl, tok, count(*) AS tf
      FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM docs)
      WHERE tok IN ({_TERMS_IN})
      GROUP BY doc_id, dl, tok
    ),
    dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    scored AS (
      SELECT doc_id,
             CAST(round(
               ln(1 + (n - df + 0.5) / (df + 0.5))
               * (tf * {BM25_K1 + 1.0})
               / (tf + {BM25_K1} * (1 - {BM25_B}
                    + {BM25_B} * dl / (CAST(sdl AS DOUBLE) / n))),
             4) AS DECIMAL(18,4)) AS s
      FROM tf JOIN dfreq USING (tok), stats
    )
    SELECT doc_id, CAST(sum(s) AS DOUBLE) AS score,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
    """,
    tags=("retrieval", "bm25", "corpus"),
)
def bm25_search(spark, sf_dir):
    """BM25 lexical retrieval over the corpus for a fixed query term
    set (k1=1.2, b=0.75) — the standard curation ranking for "find
    documents like the eval set". Per-term scores are rounded to 4
    decimals and summed as exact decimals, so partial-aggregation
    order cannot change the result vs the oracle.

    Scale shape: tokens aggregate map-side to (doc, term) counts
    before any shuffle; document frequencies (|terms| rows) and the
    1-row corpus stats are broadcast — the corpus-sized relation
    never re-shuffles after the tf aggregation."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r" +")
    docs = d.select("doc_id", F.size(toks).alias("dl"), toks.alias("toks"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sdl")
    )
    tf = (
        docs.select("doc_id", "dl", F.explode("toks").alias("tok"))
        .where(F.col("tok").isin(*BM25_TERMS))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("sdl").cast("double") / F.col("n")
    idf = F.log(
        F.lit(1) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    s = F.round(
        idf
        * (F.col("tf") * F.lit(BM25_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (F.lit(1 - BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl)
        ),
        4,
    ).cast("decimal(18,4)")
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", s.alias("s"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("s").cast("double").alias("score"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(BM25_TOPK)
    )


@register(
    "unigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, tok
      FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents)
    ),
    vocab AS (
      SELECT tok, count(*) AS c FROM toks GROUP BY tok
    ),
    total AS (SELECT sum(c) AS t FROM vocab),
    logp AS (
      SELECT tok, CAST(round(ln(c / CAST(t AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lp
      FROM vocab, total
    ),
    doc_tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS dl,
           round(-CAST(sum(tf * lp) AS DOUBLE) / sum(tf), 4) AS nll
    FROM doc_tf JOIN logp USING (tok)
    GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("quality", "lm", "corpus"),
)
def unigram_logprob(spark, sf_dir):
    """LM-likelihood quality scoring (CCNet/Gopher perplexity-filter
    shape, with a corpus-unigram model so the score is closed-form):
    per-document mean negative log-probability of its tokens under
    the corpus unigram distribution. High nll = out-of-distribution
    text. Per-token log-probs are rounded to 6 decimals and summed
    as decimals — order-independent, oracle-exact.

    Scale shape: both the vocabulary counts and the per-doc term
    counts are map-side partial aggregations; the only shuffles are
    the two token-keyed groupBys and the vocab join (vocab is far
    smaller than the corpus; hot tokens are absorbed by the partial
    agg before the join)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r" +")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    logp = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(F.log(F.col("c") / F.col("t").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("lp"),
    )
    doc_tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    return (
        doc_tf.join(logp, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("dl"),
            F.round(
                -(F.sum(F.col("tf") * F.col("lp")).cast("double"))
                / F.sum("tf"),
                4,
            ).alias("nll"),
        )
        .orderBy("doc_id")
    )


N_SHARDS = 64


@register(
    "shard_pack",
    oracle=f"""
    WITH sharded AS (
      SELECT doc_id, n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
               % {N_SHARDS} AS shard_id
      FROM documents
    )
    SELECT shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS docs_fp
    FROM sharded GROUP BY shard_id ORDER BY shard_id
    """,
    tags=("sharding", "write", "deterministic"),
)
def shard_pack(spark, sf_dir):
    """Deterministic training-shard assignment: docs hash into
    64 shards by md5(doc_id) prefix, with a per-shard
    manifest (count, bytes, content fingerprint). This is the
    shuffled-shard-writer layout for training data: hash sharding
    needs no global ordering, gives ~uniform shard sizes, and every
    shard can be written by any executor independently — unlike
    exact-N-row shards, which would need a global row_number (a
    single-partition window). One shuffle, on shard_id."""
    d = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % N_SHARDS
    )
    return (
        d.select("doc_id", "n_chars", shard.alias("shard_id"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list("doc_id")),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("docs_fp"),
        )
        .orderBy("shard_id")
    )


HIST_WIDTH = 25.0


@register(
    "value_histogram",
    oracle=f"""
    SELECT CAST(floor(value / {HIST_WIDTH}) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY 1 ORDER BY bucket
    """,
    tags=("analytics", "histogram"),
)
def value_histogram(spark, sf_dir):
    """Fixed-width histogram over events.value: one narrow scan,
    map-side partial aggregation, one shuffle on the bucket key
    (bounded cardinality — value_range/width buckets regardless of
    row count). The float sum goes through DECIMAL(12,2) so both
    engines accumulate exactly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.floor(F.col("value") / HIST_WIDTH).alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------------------ inverted_index_shards
# Doc-hash sharded posting lists: the retrieval-index build step of a
# corpus pipeline. Postings are "doc:tf" strings aggregated in doc
# order; the driver-visible result carries per-(term, shard) counts
# and a posting-list fingerprint, never the lists themselves.
INDEX_SHARDS = 8


@register(
    "inverted_index_shards",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % {INDEX_SHARDS} AS shard_id
      FROM toks GROUP BY doc_id, term
    )
    SELECT term, shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           md5(string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                          ',' ORDER BY doc_id)) AS postings_fp
    FROM tf GROUP BY term, shard_id
    ORDER BY term, shard_id
    """,
    tags=("retrieval", "index", "sharding"),
)
def inverted_index_shards(spark, sf_dir):
    """Sharded positional-free inverted index build: per-document
    term frequencies hash into {n} doc-shards (md5(doc_id), the
    shard_pack recipe), and each (term, shard) emits its posting
    count plus an order-pinned fingerprint of the "doc:tf" posting
    list.

    Scale design: doc-sharding bounds every posting list at
    df/​n_shards — the standard segment layout that keeps hot-term
    (stopword) postings from concentrating on one task; at corpus
    scale n_shards tracks corpus size and writers emit shard
    segments independently. The tf relation aggregates map-side
    before the (term, shard) shuffle, and the fingerprint stands in
    for materialized lists in the driver result (lists stay in the
    executors / on disk in a real deployment)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r" +")).alias("term"),
    )
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "shard_id",
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % INDEX_SHARDS,
        )
    )
    posting = F.concat_ws(
        ",",
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "tf"))
            ),
            lambda s: F.concat_ws(":", s.doc_id.cast("string"), s.tf.cast("string")),
        ),
    )
    return (
        tf.groupBy("term", "shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tf").cast("bigint").alias("total_tf"),
            F.md5(posting).alias("postings_fp"),
        )
        .orderBy("term", "shard_id")
    )


inverted_index_shards.__doc__ = inverted_index_shards.__doc__.replace(
    "{n}", str(INDEX_SHARDS)
)
