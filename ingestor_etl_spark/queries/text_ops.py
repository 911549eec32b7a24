"""Text-analysis / dedup operators over the ``documents`` table.

The training-data-pipeline surface: exact dedup, n-gram Jaccard
near-dup, MinHash+LSH, SimHash, language-ID heuristic, quality
scoring, token counting, fingerprinting. Everything is native
column expressions (split / higher-order array functions / md5) —
no Python in the hot path — so the same plan scales to a 100 TB
document corpus: per-doc ops are embarrassingly parallel; the dedup
joins shuffle on fingerprint/band keys which are uniformly
distributed by construction (hashes).

Cross-engine determinism: every hash is md5 (identical hex output in
Spark and DuckDB); 60-bit prefixes of the hex digest are used where
a numeric key is needed (fits in int64).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import register

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")
_SQL_STOP = ", ".join(f"'{w}'" for w in STOPWORDS)


def _tokens(col):
    return F.split(F.trim(F.lower(col)), r" +")


_SQL_TOKENS = "string_split_regex(trim(lower(text)), ' +')"


@register(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           len({_SQL_TOKENS}) AS n_tokens,
           CAST(length(replace(trim(text), ' ', '')) AS DOUBLE)
             / len({_SQL_TOKENS}) AS avg_token_len,
           CAST(len(list_filter({_SQL_TOKENS}, t -> t IN ({_SQL_STOP}))) AS DOUBLE)
             / len({_SQL_TOKENS}) AS stopword_ratio,
           length(text) AS n_chars_measured,
           (len({_SQL_TOKENS}) >= 20 AND
            CAST(len(list_filter({_SQL_TOKENS}, t -> t IN ({_SQL_STOP}))) AS DOUBLE)
              / len({_SQL_TOKENS}) BETWEEN 0.02 AND 0.5) AS quality_pass
    FROM documents ORDER BY doc_id
    """,
    tags=("text", "quality"),
)
def text_quality(spark, sf_dir):
    """Document quality scoring: token count, mean token length,
    stopword ratio, and a pass/fail gate — the C4/Gopher-style
    heuristic filter family, all as native array expressions."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double") / n_tokens
    )
    avg_len = (
        F.length(F.regexp_replace(F.trim(F.col("text")), " ", "")).cast("double") / n_tokens
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        F.length("text").alias("n_chars_measured"),
        ((n_tokens >= 20) & stop_ratio.between(0.02, 0.5)).alias("quality_pass"),
    ).orderBy("doc_id")


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS fp_md5,
           CAST('0x' || substr(md5(lower(trim(text))), 1, 15) AS BIGINT) AS fp_int60
    FROM documents ORDER BY doc_id
    """,
    tags=("text", "fingerprint"),
)
def doc_fingerprint(spark, sf_dir):
    """Canonical document fingerprint: md5 of the normalized text +
    a 60-bit integer prefix (join/partition key for dedup at scale)."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return d.select(
        "doc_id",
        fp.alias("fp_md5"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("long").alias("fp_int60"),
    ).orderBy("doc_id")


@register(
    "exact_dedup",
    oracle="""
    SELECT md5(lower(trim(text))) AS fp,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) > 1
    ORDER BY fp
    """,
    tags=("dedup", "exact"),
)
def exact_dedup(spark, sf_dir):
    """Exact dedup: hash-groupBy on the normalized-text fingerprint,
    keep the lowest doc_id, report duplicate clusters. One shuffle
    on a uniform hash key — the canonical 100 TB dedup plan."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
        .orderBy("fp")
    )


LANG_MARKERS = {
    "en": ("the", "of", "and", "to", "a", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "los", "las", "una"),
    "fr": ("le", "la", "et", "les", "des", "une", "est", "dans"),
    "de": ("der", "die", "und", "das", "ein", "ist", "nicht", "mit"),
}
_LANG_ORDER = tuple(LANG_MARKERS)  # deterministic tie-break order


def _lang_case(score_fmt: str) -> str:
    """argmax over language scores with first-language tie-break;
    zero hits → 'und' (undetermined)."""
    scores = {lang: score_fmt.format(lang=lang) for lang in _LANG_ORDER}
    greatest = f"greatest({', '.join(scores.values())})"
    whens = " ".join(
        f"WHEN {scores[lang]} = {greatest} THEN '{lang}'" for lang in _LANG_ORDER
    )
    return f"CASE WHEN {greatest} = 0 THEN 'und' {whens} END"


def _score_exprs(list_fn: str, toks: str) -> dict[str, str]:
    out = {}
    for lang, words in LANG_MARKERS.items():
        lit = ", ".join(f"'{w}'" for w in words)
        out[lang] = f"len({list_fn}({toks}, t -> t IN ({lit})))"
    return out


@register(
    "lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang AS lang_declared,
               {", ".join(f"{expr} AS score_{lang}" for lang, expr in _score_exprs("list_filter", _SQL_TOKENS).items())}
        FROM documents
    )
    SELECT doc_id, lang_declared,
           {", ".join(f"score_{lang}" for lang in _LANG_ORDER)},
           {_lang_case("score_{lang}")} AS lang_pred
    FROM scored ORDER BY doc_id
    """,
    tags=("text", "langid"),
)
def lang_id(spark, sf_dir):
    """Language identification: marker-word (stopword n-gram) hit
    counts per candidate language, argmax with deterministic
    tie-break, 'und' when nothing matches. One narrow pass; the
    wordlists are literals compiled into the plan (no lookup join),
    which is exactly how a 100 TB lang-ID sweep should run."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.selectExpr(
        "doc_id",
        "lang AS lang_declared",
        *[
            f"size(filter({_tokens_sql()}, t -> t IN ({', '.join(repr(w) for w in words)}))) AS score_{lang}"
            for lang, words in LANG_MARKERS.items()
        ],
    )
    return scored.selectExpr(
        "doc_id",
        "lang_declared",
        *[f"score_{lang}" for lang in _LANG_ORDER],
        f"{_lang_case('score_{lang}')} AS lang_pred",
    ).orderBy("doc_id")


def _tokens_sql() -> str:
    return "split(trim(lower(text)), ' +')"


@register(
    "token_count",
    oracle=f"""
    SELECT doc_id,
           len({_SQL_TOKENS}) AS ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens
    FROM documents ORDER BY doc_id
    """,
    tags=("text", "tokenize"),
)
def token_count(spark, sf_dir):
    """Token counting two ways: whitespace split and a BPE-ish
    regex lexer (letters / digits / punctuation runs)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("ws_tokens"),
        F.size(
            F.expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
        ).alias("bpe_ish_tokens"),
    ).orderBy("doc_id")


# ---------------------------------------------------- lang_id_confusion
@register(
    "lang_id_confusion",
    oracle=f"""
    WITH scored AS (
        SELECT lang AS lang_declared,
               {", ".join(f"{expr} AS score_{lang}" for lang, expr in _score_exprs("list_filter", _SQL_TOKENS).items())}
        FROM documents
    )
    SELECT lang_declared,
           {_lang_case("score_{lang}")} AS lang_pred,
           count(*) AS n
    FROM scored
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("text", "langid", "eval"),
)
def lang_id_confusion(spark, sf_dir):
    """Classifier-evaluation surface for the lang_id operator: the
    (declared label × predicted language) confusion matrix. 'zh'
    has no marker list, so its column shows where a heuristic-miss
    lands ('und' or a false positive) — exactly the audit a corpus
    release needs before trusting per-language mixture numbers
    (dataset_card, domain_mixture).

    Plan shape: the same single narrow pass as lang_id (wordlists as
    plan literals, no lookup join) folded into one map-side-combined
    aggregation on the bounded (label, prediction) key — output rows
    ≤ |langs|², constant at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.selectExpr(
        "lang AS lang_declared",
        *[
            f"size(filter({_tokens_sql()}, t -> t IN ({', '.join(repr(w) for w in words)}))) AS score_{lang}"
            for lang, words in LANG_MARKERS.items()
        ],
    )
    return (
        scored.selectExpr(
            "lang_declared", f"{_lang_case('score_{lang}')} AS lang_pred"
        )
        .groupBy("lang_declared", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang_declared", "lang_pred")
    )


# ------------------------------------------------------ array_functions
@register(
    "array_functions",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
      WHERE doc_id % 7 = 0
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_toks,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           list_sort(list_distinct(toks))[1] AS first_sorted,
           list_sort(list_distinct(toks))[-1] AS last_sorted,
           CAST(list_position(toks, 'the') AS BIGINT) AS the_pos,
           array_to_string(toks[1:3], '|') AS head3,
           array_to_string(list_reverse_sort(list_distinct(toks))[1:2], '|')
             AS top2_desc,
           CAST(len(flatten([toks[1:2], toks[-2:]])) AS BIGINT)
             AS n_ends,
           CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT)
             AS total_chars
    FROM t ORDER BY doc_id
    """,
    tags=("array", "sql-surface"),
)
def array_functions(spark, sf_dir):
    """Array/collection-function surface (§2.7 completed): size,
    distinct, sort ascending/descending with indexing from both
    ends, position lookup, slicing, flatten, and a per-element
    transform + fold — each against its DuckDB list twin, pinning
    the cross-engine semantics that differ subtly between engines
    (1-based indexing, position-of-missing = 0/NULL, negative
    slices). Pure narrow projection, no shuffle before the final
    presentation sort."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    toks = F.split(F.trim(F.lower("text")), r" +")
    t = d.select("doc_id", toks.alias("toks"))
    dst = F.array_distinct("toks")
    srt = F.array_sort(dst)
    rsrt = F.reverse(F.array_sort(dst))
    n = F.size("toks")
    return (
        t.select(
            "doc_id",
            n.cast("bigint").alias("n_toks"),
            F.size(dst).cast("bigint").alias("n_distinct"),
            F.element_at(srt, 1).alias("first_sorted"),
            F.element_at(srt, -1).alias("last_sorted"),
            F.coalesce(
                F.array_position("toks", "the"), F.lit(0)
            ).cast("bigint").alias("the_pos"),
            F.array_join(F.slice("toks", 1, 3), "|").alias("head3"),
            F.array_join(F.slice(rsrt, 1, 2), "|").alias("top2_desc"),
            F.size(
                F.flatten(
                    F.array(F.slice("toks", 1, 2), F.slice("toks", -2, 2))
                )
            ).cast("bigint").alias("n_ends"),
            F.aggregate(
                F.transform("toks", lambda x: F.length(x).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            ).alias("total_chars"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------------ string_functions
@register(
    "string_functions",
    oracle="""
    SELECT doc_id,
           levenshtein(source, lang) AS lev_src_lang,
           translate(lang, 'aeiou', '12345') AS lang_translated,
           lpad(lang, 6, '.') AS lang_lpad,
           rpad(source, 8, '_') AS src_rpad,
           split_part(source, 'c', 2) AS src_after_c,
           repeat(lang, 3) AS lang_x3,
           reverse(source) AS src_rev,
           CAST(strpos(text, 'the') AS BIGINT) AS the_at,
           left(text, 12) AS head12,
           right(text, 8) AS tail8,
           upper(lang) || ':' || lower(source) AS tagged,
           CAST(length(trim(text)) AS BIGINT) AS trimmed_len
    FROM documents
    WHERE doc_id % 11 = 0
    ORDER BY doc_id
    """,
    tags=("string", "sql-surface"),
)
def string_functions(spark, sf_dir):
    """String-function surface (§2.7 completed): edit distance,
    character translation, padding, split_part, repetition,
    reversal, substring search (1-based, 0 when absent — pinned),
    prefix/suffix extraction, case mapping and concatenation — each
    against its DuckDB twin so cross-engine quirks (empty-needle
    strpos, multi-byte length semantics) are oracle-checked. One
    narrow projection with the filter at the scan."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 11 == 0)
    return (
        d.select(
            "doc_id",
            F.levenshtein("source", "lang").alias("lev_src_lang"),
            F.translate("lang", "aeiou", "12345").alias("lang_translated"),
            F.lpad("lang", 6, ".").alias("lang_lpad"),
            F.rpad("source", 8, "_").alias("src_rpad"),
            F.split_part("source", F.lit("c"), F.lit(2)).alias("src_after_c"),
            F.repeat("lang", 3).alias("lang_x3"),
            F.reverse("source").alias("src_rev"),
            F.instr("text", "the").cast("bigint").alias("the_at"),
            F.substring("text", 1, 12).alias("head12"),
            F.substring(F.col("text"), -8, 8).alias("tail8"),
            F.concat(F.upper("lang"), F.lit(":"), F.lower("source")).alias(
                "tagged"
            ),
            F.length(F.trim("text")).cast("bigint").alias("trimmed_len"),
        )
        .orderBy("doc_id")
    )


# -------------------------------------------------------- json_functions
@register(
    "json_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_valid(props) AS BOOLEAN) AS is_valid,
           CAST(json_extract(props, '$.missing') IS NULL AS BOOLEAN)
             AS missing_is_null
    FROM events
    WHERE event_id % 101 = 0
    ORDER BY event_id
    """,
    tags=("json", "sql-surface"),
)
def json_functions(spark, sf_dir):
    """Semi-structured JSON surface over the props column: typed
    extraction (int cast), string extraction, validity predicate,
    and missing-path null semantics — the get_json_object family
    pinned against DuckDB's json_extract twins. JSON paths evaluate
    in the scan projection; no shuffle."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 101 == 0)
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
            F.get_json_object("props", "$.k").alias("k_str"),
            F.expr("isnotnull(try_parse_json(props))").alias("is_valid"),
            F.get_json_object("props", "$.missing").isNull().alias(
                "missing_is_null"
            ),
        )
        .orderBy("event_id")
    )


# ----------------------------------------------------------- char_entropy
@register(
    "char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ),
    cf AS (
      SELECT doc_id, ch, count(*) AS cnt FROM chars GROUP BY doc_id, ch
    ),
    agg AS (
      SELECT doc_id,
             CAST(sum(cnt) AS BIGINT) AS n_chars_counted,
             CAST(count(*) AS BIGINT) AS distinct_chars,
             sum(CAST(cnt * round(log2(cnt), 6) AS DECIMAL(28,6))) AS s
      FROM cf GROUP BY doc_id
    )
    SELECT doc_id, n_chars_counted, distinct_chars,
           round(log2(n_chars_counted)
                 - CAST(s AS DOUBLE) / n_chars_counted, 4) AS entropy_bits
    FROM agg ORDER BY doc_id
    """,
    tags=("quality", "entropy", "corpus"),
)
def char_entropy(spark, sf_dir):
    """Character-distribution Shannon entropy per document — the
    compression-ratio proxy quality signal (low-entropy text is
    boilerplate/repetition; very high entropy is binary junk).

    Uses the decomposition H = log2(n) - (1/n) * sum(cnt*log2(cnt))
    so the per-term log argument is an INTEGER count: each term is
    rounded to 6 decimals and summed as exact decimals (the same
    order-independent log-parity recipe as unigram_logprob), then
    the final expression is rounded to 4 — cross-engine exact.

    Scale shape: explode -> two doc-keyed aggregations, both
    map-side combined; per-doc group size is bounded by the
    alphabet, not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id",
        F.explode(F.split(F.col("text"), "")).alias("ch"),
    ).where(F.col("ch") != "")
    cf = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    agg = cf.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_chars_counted"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_chars"),
        F.sum(
            (F.col("cnt") * F.round(F.log2("cnt"), 6)).cast("decimal(28,6)")
        ).alias("s"),
    )
    return agg.select(
        "doc_id",
        "n_chars_counted",
        "distinct_chars",
        F.round(
            F.log2("n_chars_counted")
            - F.col("s").cast("double") / F.col("n_chars_counted"),
            4,
        ).alias("entropy_bits"),
    ).orderBy("doc_id")


# -------------------------------------------------------- code_detect
# Code-vs-prose signals: structural symbols and keyword hits. On the
# word-salad synthetic corpus scores are ~0 — the operator's value is
# the exact, engine-agnostic arithmetic and the plan shape; real
# corpora light it up.
_CODE_SYMBOLS = ("{", "}", ";", "(", ")", "=", "[", "]")
_CODE_KEYWORDS = ("def ", "return ", "import ", "class ", "void ", "func ")
# Deterministic probe: the synthetic corpus is word salad (every
# code signal 0 — a constant output is a weak oracle check), so
# docs with doc_id % 7 == 0 get a code fragment appended on BOTH
# engines before scoring; the operator logic itself is unchanged.
_CODE_SNIPPET = "def probe(x) { return x[0]; }"


def _sym_count_spark() -> str:
    terms = [
        f"(length(text) - length(replace(text, '{c}', '')))"
        for c in _CODE_SYMBOLS
    ]
    return " + ".join(terms)


def _sym_count_sql() -> str:
    terms = [
        f"(length(text) - length(replace(text, '{c}', '')))"
        for c in _CODE_SYMBOLS
    ]
    return " + ".join(terms)


def _kw_hits_sql() -> str:
    return " + ".join(
        f"CASE WHEN contains(lower(text), '{kw}') THEN 1 ELSE 0 END"
        for kw in _CODE_KEYWORDS
    )


@register(
    "code_detect",
    oracle=f"""
    WITH probe AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' {_CODE_SNIPPET}' ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST({_sym_count_sql()} AS BIGINT) AS n_symbols,
           CAST({_kw_hits_sql()} AS INTEGER) AS n_keywords,
           round(({_sym_count_sql()}) / CAST(length(text) AS DOUBLE), 6)
             AS symbol_ratio,
           (({_sym_count_sql()}) * 20 > length(text)) AS looks_like_code
    FROM probe
    WHERE length(text) > 0
    ORDER BY doc_id
    """,
    tags=("text", "quality", "code"),
)
def code_detect(spark, sf_dir):
    """Code-vs-prose detection: structural-symbol density and
    programming-keyword hits — the routing signal an LLM data
    pipeline uses to separate code into its own mixture bucket
    before tokenizer/quality decisions. The verdict is an exact
    integer cross-multiplication (symbols × 20 > length, i.e.
    density > 5%), so no float threshold can disagree across
    engines; symbol counts are length-difference arithmetic (one
    codegen'd projection, no regex engine in the loop, no UDF).

    Plan shape: a single narrow projection over the scan — column-
    pruned to (doc_id, text), embarrassingly parallel at any scale."""
    sym = F.expr(_sym_count_spark())
    kw = sum(
        F.when(F.lower(F.col("text")).contains(k), 1).otherwise(0)
        for k in _CODE_KEYWORDS
    )
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(" " + _CODE_SNIPPET)),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .where(F.length("text") > 0)
    )
    return d.select(
        "doc_id",
        sym.cast("bigint").alias("n_symbols"),
        kw.cast("int").alias("n_keywords"),
        F.round(sym / F.length("text").cast("double"), 6).alias(
            "symbol_ratio"
        ),
        (sym * 20 > F.length("text")).alias("looks_like_code"),
    ).orderBy("doc_id")


# ----------------------------------------------------- bigram_novelty
@register(
    "bigram_novelty",
    oracle="""
    WITH shingled AS (
      SELECT doc_id,
             CASE WHEN len(string_split_regex(trim(lower(text)), ' +')) < 2
                  THEN []
                  ELSE list_distinct(list_transform(
                         range(1, len(string_split_regex(trim(lower(text)), ' +'))),
                         i -> string_split_regex(trim(lower(text)), ' +')[i]
                              || ' '
                              || string_split_regex(trim(lower(text)), ' +')[i + 1]))
             END AS shingles
      FROM documents
    ),
    exploded AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM shingled
      WHERE len(shingles) > 0
    ),
    dfreq AS (
      SELECT shingle, count(*) AS df FROM exploded GROUP BY shingle
    )
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique_to_doc,
           round(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS novelty_ratio,
           CAST(min(d.df) AS BIGINT) AS min_df,
           CAST(max(d.df) AS BIGINT) AS max_df
    FROM exploded e JOIN dfreq d USING (shingle)
    GROUP BY e.doc_id ORDER BY e.doc_id
    """,
    tags=("text", "quality", "novelty"),
)
def bigram_novelty(spark, sf_dir):
    """Per-document novelty signal: how much of a doc's bigram set
    exists NOWHERE else in the corpus (df = 1). High novelty marks
    original content worth upweighting; near-zero novelty marks
    template instantiations the dedup stack should visit — the
    cheap corpus-level prioritizer that runs before any pair join.

    Plan shape: one shingle-keyed df aggregation (map-side combined,
    uniform hashed keys) joined back to the exploded relation, then
    a doc-keyed rollup. No self-joins, no windows; work is linear in
    total shingle count — runnable on the full corpus at any scale."""
    from ingestor_etl_spark.plans.layout import materialize
    from ingestor_etl_spark.queries.dedup_ops import _shingled

    # Round 13 (guide §2.1): the exploded shingle relation feeds both
    # the df aggregation and the join-back — un-materialized, the
    # interpreted shingling HOFs executed twice (once per consumer).
    exploded = materialize(
        _shingled(spark, sf_dir).select(
            "doc_id", F.explode("shingles").alias("shingle")
        )
    )
    dfreq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return (
        exploded.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique_to_doc"),
            F.round(
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("novelty_ratio"),
            F.min("df").cast("bigint").alias("min_df"),
            F.max("df").cast("bigint").alias("max_df"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------- source_lang_purity
@register(
    "source_lang_purity",
    oracle="""
    WITH cells AS (
      SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
    ),
    per_source AS (
      SELECT source, sum(n) AS src_total, max(n) AS max_n FROM cells GROUP BY source
    )
    SELECT c.source, c.lang, CAST(c.n AS BIGINT) AS n_docs,
           round(c.n / CAST(p.src_total AS DOUBLE), 6) AS lang_share,
           (c.n = p.max_n) AS is_dominant
    FROM cells c JOIN per_source p USING (source)
    ORDER BY c.source, c.lang
    """,
    tags=("text", "quality", "language"),
)
def source_lang_purity(spark, sf_dir):
    """Per-source language composition: how monolingual each feed
    is (the source × declared-lang matrix with shares and the
    dominant flag) — the routing sanity check a multilingual
    pipeline runs before per-language mixture decisions
    (lang_id_confusion audits the CLASSIFIER; this audits the
    FEEDS). Two aggregations over a |sources|×|langs|-bounded key
    space, map-side combined; the per-source totals join back on
    the small aggregated relation."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    per_source = cells.groupBy("source").agg(
        F.sum("n").alias("src_total"), F.max("n").alias("max_n")
    )
    return (
        cells.join(per_source, "source")
        .select(
            "source",
            "lang",
            F.col("n").cast("bigint").alias("n_docs"),
            F.round(F.col("n") / F.col("src_total").cast("double"), 6).alias(
                "lang_share"
            ),
            (F.col("n") == F.col("max_n")).alias("is_dominant"),
        )
        .orderBy("source", "lang")
    )
