"""Wave-25 (round 8): the census-gated exact-Jaccard pair plan
(round-7 verdict item 1). Oracle parity for the registered queries
runs in test_oracle_parity; these pin the gate itself — which plan
the df census picks, and that both plans emit byte-identical pairs
on inputs with real structure (near-dups at several similarity
levels, hot shingles, size mismatches)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ingestor_etl_spark.plans.layout import release_caches
from ingestor_etl_spark.queries.dedup_ops import (
    JACCARD_UNCUT_MASS_MAX,
    _jaccard_census,
    _jaccard_pairs_prefix,
    _jaccard_pairs_uncut,
    _jaccard_sets,
    _shingled,
    jaccard_pairs,
)

SF = "/root/testdata/sf0.01"


def _hot_corpus(spark, n_docs: int, hot_every: int):
    """n_docs docs x ~10 shingles; every hot_every-th doc carries ONE
    shared boilerplate shingle, the rest drawn from a wide universe."""
    return spark.range(n_docs).selectExpr(
        "id AS doc_id",
        "array_distinct(concat("
        " transform(sequence(0, 8), i -> concat('sh', pmod(hash(id, i), 1000000))),"
        f" CASE WHEN id % {hot_every} = 0 THEN array('the quick brown')"
        "      ELSE array(concat('sh', pmod(hash(id, 99), 1000000))) END"
        ")) AS shingles",
    )


def test_census_measures_uncut_join_rows_exactly(spark):
    # 4 docs: shingle x in 3 of them (C(3,2)=3), y in 2 (1), z in 1 (0)
    df = spark.createDataFrame(
        [
            (1, ["x", "y"]),
            (2, ["x", "y"]),
            (3, ["x", "z"]),
            (4, ["w"]),
        ],
        "doc_id long, shingles array<string>",
    )
    sets = _jaccard_sets(spark, df)
    max_df, mass = _jaccard_census(sets)
    release_caches()
    assert max_df == 3
    assert mass == 3 + 1  # C(3,2) + C(2,2)


def test_gate_routes_hot_corpus_to_prefix_plan(spark):
    """A hot shingle on 1/3 of 40k docs puts Σ C(df,2) ≈ 8.9e7 x ...
    over the cap via C(13334,2) alone? No — C(13334,2) ≈ 8.9e7 < 2e8,
    so use 1/2 of 50k docs: C(25000,2) ≈ 3.1e8 > cap → prefix plan
    (visible as the row_number ranking in the optimized plan). The
    sf0.01 corpus stays under the cap → uncut plan (no window)."""
    hot = _hot_corpus(spark, 50_000, 2)
    plan = jaccard_pairs(spark, hot)._jdf.queryExecution().optimizedPlan().toString()
    release_caches()
    assert "row_number" in plan  # prefix ranking present → PPJoin path

    small = _shingled(spark, SF)
    plan_small = (
        jaccard_pairs(spark, small)._jdf.queryExecution().optimizedPlan().toString()
    )
    release_caches()
    assert "row_number" not in plan_small  # direct join path


def test_prefix_and_uncut_plans_agree_exactly(spark):
    """Byte-identical pair relations from both plans on a corpus with
    planted near-dups at several similarity levels AND a hot shingle
    present in every doc (the adversarial case for prefix filtering:
    the hot shingle must be excluded from prefixes yet still counted
    by the verification's array_intersect)."""
    rows = []
    # 60 base docs of 12 distinct tokens each + the shared 'hot' token
    for i in range(60):
        toks = [f"t{i}_{j}" for j in range(12)] + ["hot"]
        rows.append((i * 10, " ".join(toks)))
        # a near-exact dup (drop one token) -> high jaccard
        if i % 3 == 0:
            rows.append((i * 10 + 1, " ".join(toks[:-2] + ["hot"])))
        # a half-overlap doc -> borderline jaccard
        if i % 5 == 0:
            toks2 = toks[:6] + [f"u{i}_{j}" for j in range(6)] + ["hot"]
            rows.append((i * 10 + 2, " ".join(toks2)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    shingled = df.selectExpr(
        "doc_id",
        "array_distinct(split(text, ' ')) AS shingles",
    )
    sets = _jaccard_sets(spark, shingled)
    uncut = (
        _jaccard_pairs_uncut(sets, 0.5).orderBy("doc_a", "doc_b").collect()
    )
    prefix = (
        _jaccard_pairs_prefix(spark, sets, 0.5)
        .orderBy("doc_a", "doc_b")
        .collect()
    )
    release_caches()
    assert len(uncut) > 0  # the fixture actually plants qualifying pairs
    assert uncut == prefix


def test_gate_constant_is_sane():
    # the sf0.1 corpus measures 3.65e7 — comfortably inside the
    # uncut budget; one 25k-doc boilerplate shingle is outside it
    assert 3.65e7 < JACCARD_UNCUT_MASS_MAX < 25_000 * 24_999 / 2
