"""Wave-23 operators: exact_substring_dedup (char-gram seed match),
lsh_band_whatif (banding-config evaluation), mixture_token_allocation
(integer budget waterfill). Oracle parity runs in test_oracle_parity;
these tests pin the semantic invariants on controlled fixtures."""

from __future__ import annotations

import pytest

from ingestor_etl_spark.queries import load_all

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    return load_all()


@pytest.mark.slow
def test_exact_substring_seed_guarantee(spark, tmp_path, registry):
    """Any shared verbatim run of >= K + stride - 1 chars must
    produce a pair; unrelated docs must not."""
    from ingestor_etl_spark.queries.dedup_ops import (
        SUBSTR_K,
        SUBSTR_STRIDE,
        exact_substring_dedup,
    )

    quote = "x".join(str(i) for i in range(SUBSTR_K + SUBSTR_STRIDE))  # > 39 chars
    assert len(quote) >= SUBSTR_K + SUBSTR_STRIDE - 1
    rows = [
        (1, "prefix one " + quote + " suffix alpha"),
        (2, "totally different preamble " + quote + " and another tail"),
        (3, "no shared content here at all just filler words repeated words"),
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        src.rsplit("/", 1)[0] + "/docs/documents.parquet"
    )
    out = exact_substring_dedup(spark, src.rsplit("/", 1)[0] + "/docs").toPandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


@pytest.mark.slow
def test_lsh_band_whatif_monotone(spark, registry):
    """Fewer rows per band can only keep MORE candidates: with the 6
    salts laid out as 1x6 / 2x3 / 3x2 / 6x1, kept counts must be
    monotone and 3x2 must equal the production candidate count."""
    out = registry["lsh_band_whatif"].fn(spark, SF).toPandas()
    by = {r.config: r for r in out.itertuples()}
    assert set(by) == {"1x6", "2x3", "3x2", "6x1"}
    assert (
        by["1x6"].n_candidates
        <= by["2x3"].n_candidates
        <= by["3x2"].n_candidates
        <= by["6x1"].n_candidates
    )
    assert by["3x2"].vs_production == 1.0
    # the population is the loosest config (any single equal minhash),
    # so 6x1 catches ALL of it and is strictly looser than production
    # on this templated corpus
    assert by["6x1"].n_candidates > by["3x2"].n_candidates
    # a 3x2 band of 2 equal minhashes implies both singles equal, so
    # the production catch set within the loose population must equal
    # the production candidate generator's output exactly
    cand = registry["minhash_lsh_pairs"].fn(spark, SF).toPandas()
    assert by["3x2"].n_candidates == len(cand)


def test_mixture_allocation_invariants(spark, registry):
    from ingestor_etl_spark.queries.curation_ops import MIX_BUDGET_TOKENS

    out = registry["mixture_token_allocation"].fn(spark, SF).toPandas()
    assert (out.final_tokens <= out.avail_tokens).all()
    assert (out.alloc_tokens <= out.target_tokens).all()
    assert (out.final_tokens >= out.alloc_tokens).all()
    # integer floor shares can only under-spend, never over-spend
    assert out.target_tokens.sum() <= MIX_BUDGET_TOKENS
    assert out.final_tokens.sum() <= MIX_BUDGET_TOKENS
