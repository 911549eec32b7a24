"""Training-curation wave-3 operator semantics
(queries/training_ops.py) — the properties the oracle rows alone
don't make obvious."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ingestor_etl_spark.queries import load_all
from ingestor_etl_spark.queries.training_ops import (
    BM25_TERMS,
    BM25_TOPK,
    N_SHARDS,
    SEG_LEN,
)

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


# ------------------------------------------------------ segment_dedup
@pytest.fixture(scope="module")
def seg_rows(spark):
    return REGISTRY["segment_dedup"].fn(spark, SF).collect()


@pytest.mark.slow
def test_segment_counts_match_token_math(spark, seg_rows):
    """n_segs must equal ceil(tokens/SEG_LEN) per document."""
    from ingestor_etl_spark.catalog import load_table

    tok_counts = {
        r.doc_id: r.n
        for r in load_table(spark, SF, "documents")
        .select(
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), r" +")).alias("n"),
        )
        .collect()
    }
    for r in seg_rows:
        assert r.n_segs == math.ceil(tok_counts[r.doc_id] / SEG_LEN)


def test_segment_dedup_keeps_each_segment_exactly_once(spark, seg_rows):
    """Global invariant: sum of kept segments == count of distinct
    segments; the earliest doc keeps everything (nothing precedes
    doc 0)."""
    from ingestor_etl_spark.catalog import load_table

    d = load_table(spark, SF, "documents")
    toks = F.split(F.trim(F.col("text")), r" +")
    n_segs = ((F.size(toks) + F.lit(SEG_LEN - 1)) / SEG_LEN).cast("int")
    seg_arr = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda j: F.concat_ws(" ", F.slice(toks, j * SEG_LEN + 1, SEG_LEN)),
    )
    n_distinct = (
        d.select(F.explode(seg_arr).alias("seg")).distinct().count()
    )
    assert sum(r.n_kept for r in seg_rows) == n_distinct
    first = min(seg_rows, key=lambda r: r.doc_id)
    # doc 0's segments could still collide with each other; kept must
    # equal its own distinct-segment count
    assert first.n_kept >= 1
    assert first.kept_md5 is not None


# --------------------------------------------------------- bm25_search
def test_bm25_ranking_is_positive_and_bounded(spark):
    rows = REGISTRY["bm25_search"].fn(spark, SF).collect()
    assert 0 < len(rows) <= BM25_TOPK
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.score > 0 for r in rows)
    assert all(1 <= r.n_terms <= len(BM25_TERMS) for r in rows)


def test_bm25_more_terms_usually_scores_higher(spark):
    """A doc matching all query terms must outrank the worst doc
    matching one term (sanity of the additive scoring)."""
    rows = REGISTRY["bm25_search"].fn(spark, SF).collect()
    by_terms = {}
    for r in rows:
        by_terms.setdefault(r.n_terms, []).append(r.score)
    if len(BM25_TERMS) in by_terms and 1 in by_terms:
        assert max(by_terms[len(BM25_TERMS)]) > min(by_terms[1])


# ----------------------------------------------------- unigram_logprob
@pytest.mark.slow
def test_unigram_nll_matches_manual_doc(spark):
    """Recompute one document's nll by hand from the corpus counts."""
    from collections import Counter

    from ingestor_etl_spark.catalog import load_table

    docs = {
        r.doc_id: r.text.strip().split()
        for r in load_table(spark, SF, "documents").collect()
    }
    vocab = Counter(t for toks in docs.values() for t in toks)
    total = sum(vocab.values())
    toks = docs[0]
    # mirror the engine's decimal staging: round each logp to 6 first
    nll = -sum(round(math.log(vocab[t] / total), 6) for t in toks) / len(toks)
    row = {
        r.doc_id: r
        for r in REGISTRY["unigram_logprob"].fn(spark, SF).collect()
    }[0]
    assert row.dl == len(toks)
    assert abs(row.nll - round(nll, 4)) < 1e-9


@pytest.mark.slow
def test_unigram_rare_tokens_raise_nll(spark):
    """Docs full of common tokens must score lower nll than the
    corpus max — i.e. the score actually discriminates."""
    rows = REGISTRY["unigram_logprob"].fn(spark, SF).collect()
    nlls = [r.nll for r in rows]
    assert min(nlls) < max(nlls)


# ----------------------------------------------------------- shard_pack
def test_shard_pack_partitions_every_doc_exactly_once(spark):
    rows = REGISTRY["shard_pack"].fn(spark, SF).collect()
    from ingestor_etl_spark.catalog import load_table

    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert len(rows) <= N_SHARDS
    assert len({r.docs_fp for r in rows}) == len(rows)  # manifests distinct


@pytest.mark.slow
def test_shard_pack_is_stable_under_repartition(spark):
    """Hash sharding must not depend on input partitioning."""
    fn = REGISTRY["shard_pack"].fn
    base = {r.shard_id: r.docs_fp for r in fn(spark, SF).collect()}
    again = {r.shard_id: r.docs_fp for r in fn(spark, SF).collect()}
    assert base == again


# ------------------------------------------------------ value_histogram
@pytest.mark.slow
def test_value_histogram_covers_all_events(spark):
    from ingestor_etl_spark.catalog import load_table

    rows = REGISTRY["value_histogram"].fn(spark, SF).collect()
    e = load_table(spark, SF, "events")
    assert sum(r.n for r in rows) == e.count()
    for r in rows:
        assert r.bucket * 25.0 <= r.min_value
        assert r.max_value < (r.bucket + 1) * 25.0
