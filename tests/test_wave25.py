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
    max_df, mass, mass_capped = _jaccard_census(sets)
    release_caches()
    assert max_df == 3
    assert mass == 3 + 1  # C(3,2) + C(2,2)
    assert mass_capped == mass  # every df far below JACCARD_HOT_DF


def test_prefix_routing_needs_both_size_and_concentration():
    """The sf1 lesson (SCALING §29): 10× df-uniform growth pushed
    mass past the absolute budget while max df stayed 338 — and the
    PPJoin plan was 8× SLOWER there (118 s vs 14 s). The gate must
    require the hot head to dominate, not just absolute size."""
    from ingestor_etl_spark.queries.dedup_ops import _use_prefix_plan

    assert not _use_prefix_plan(3.65e7, 3.65e7)  # sf0.1: small
    assert not _use_prefix_plan(3.65e8, 3.65e8)  # sf1: big but uniform
    assert _use_prefix_plan(1.8e9, 2.6e6)  # one 60k-doc boilerplate shingle
    assert not _use_prefix_plan(1.0e6, 1.0e3)  # concentrated but tiny


def test_agg_partition_gate_calibration():
    """Round-12 (round-11 verdict item 7, SCALING §46): the uncut
    pair agg's group-state gate must be the IDENTITY (None — leave
    the exchange to AQE, today's plan) at every oracle and bench
    scale, and engage near the measured 320-partition knee at sf3.
    Pre-aggregation was measured dead (per-partition duplication
    1.068), so the only lever is agg partition count."""
    from ingestor_etl_spark.queries.dedup_ops import _jaccard_agg_partitions

    assert _jaccard_agg_partitions(0.0) is None  # no census
    assert _jaccard_agg_partitions(3.65e7) is None  # sf0.1
    assert _jaccard_agg_partitions(1.09e8) is None  # sf0.3
    assert _jaccard_agg_partitions(3.65e8) is None  # sf1 (109M groups)
    assert _jaccard_agg_partitions(1.094167170e9) == 329  # sf3
    assert _jaccard_agg_partitions(1e10) == 1024  # capped


@pytest.mark.slow
def test_agg_partition_gate_output_identical(spark):
    """Engaged vs identity output equality on a small corpus (the
    cap-inactive ≡ plain pattern): the gate changes WHERE the agg
    runs, never WHAT it computes."""
    from ingestor_etl_spark.queries.dedup_ops import (
        _jaccard_pairs_uncut as _uncut,
        _jaccard_sets as _sets_fn,
    )

    df = spark.range(200).selectExpr(
        "id AS doc_id",
        "array_distinct(transform(sequence(0, 9),"
        " i -> concat('s', pmod(hash(id, i), 300)))) AS shingles",
    )
    sets = _sets_fn(spark, df)
    plain = _uncut(sets, 0.5).orderBy("doc_a", "doc_b").collect()
    # a mass far past the wall forces the repartition path
    engaged = (
        _uncut(sets, 0.5, mass=2e9).orderBy("doc_a", "doc_b").collect()
    )
    release_caches()
    assert plain == engaged


@pytest.mark.slow
def test_gate_routes_hot_corpus_to_prefix_plan(spark):
    """One boilerplate shingle on 1/2 of 50k docs contributes
    C(25000,2) ≈ 3.1e8 uncut join rows > JACCARD_UNCUT_MASS_MAX →
    the census must route to the PPJoin plan (visible as the
    row_number prefix ranking in the optimized plan); the sf0.01
    corpus stays under the budget → direct-join plan (no window)."""
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


@pytest.mark.slow
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


def test_near_dup_occupancy_rule_calibration():
    """The occupancy rule is the identity at the oracle scales and
    reproduces the measured sf1 configuration (N_PLANES + 3 at 10×)."""
    from ingestor_etl_spark.queries.vector_ops import N_PLANES, _near_dup_planes

    assert _near_dup_planes(500) == N_PLANES  # sf0.01
    assert _near_dup_planes(2_000) == N_PLANES  # sf0.1
    assert _near_dup_planes(20_000) == N_PLANES + 3  # sf1
    assert _near_dup_planes(200_000) > _near_dup_planes(20_000)


@pytest.mark.slow
def test_near_dup_auto_equals_uncapped_at_oracle_scale(spark):
    """Below the mass budget the auto census must leave the plan on
    the plain bucket join — output byte-identical to the
    fixed-parameter uncapped form (this is what keeps the driver's
    sf0.01 oracle row untouched)."""
    from pyspark.sql import functions as F

    from ingestor_etl_spark.catalog import load_table
    from ingestor_etl_spark.queries.vector_ops import _as_double, _near_dup_from

    e = load_table(spark, SF, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    auto = _near_dup_from(e, auto_scale=True).collect()
    release_caches()
    fixed = _near_dup_from(e).collect()
    release_caches()
    assert auto == fixed


def test_xml_ingest_error_semantics(spark):
    """§2.8 on the XML source: missing element → null (clean);
    type-mismatch → whole record flagged with raw text preserved
    (XML does NOT keep parseable sibling fields, unlike JSONL);
    broken markup → flagged. File = error-isolation unit."""
    from ingestor_etl_spark.queries.corpus_ops import xml_ingest

    out = xml_ingest(spark, SF).toPandas()
    clean = out[~out.is_corrupt]
    corrupt = out[out.is_corrupt]
    assert sorted(clean.doc_id) == [0, 1, 6]
    assert clean[clean.doc_id == 6].n_chars.isna().all()  # missing field
    assert len(corrupt) == 2
    assert corrupt.doc_id.isna().all()  # whole record flagged
    assert set(corrupt.corrupt_excerpt) == {
        "<doc><doc_id>nan<",
        "<doc><doc_id>7<te",
    }


def test_xml_corrupt_file_does_not_poison_siblings(spark, tmp_path):
    """A malformed file corrupts only its own row(s); other FILES in
    the same read are untouched (the isolation contract the fixture
    layout documents)."""
    from ingestor_etl_spark.sources.xml_source import read_xml_documents

    (tmp_path / "good.xml").write_text(
        "<doc><doc_id>10</doc_id><text>fine</text>"
        "<lang>en</lang><source>web</source></doc>"
    )
    (tmp_path / "bad.xml").write_text("<doc><doc_id>11<text>oops</doc>")
    out = read_xml_documents(spark, str(tmp_path)).toPandas()
    good = out[out._corrupt.isna()]
    assert list(good.doc_id) == [10] and list(good.text) == ["fine"]
    assert len(out[out._corrupt.notna()]) == 1
