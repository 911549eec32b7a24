"""Wave-24 operators: exact_substring_extend (maximal verbatim run
via gaps-and-islands over seed-match diagonals) and
cross_source_dup_overlap (source×source verified-duplicate matrix).
Oracle parity runs in test_oracle_parity; these pin the semantic
invariants."""

from __future__ import annotations

import pytest

from ingestor_etl_spark.queries import load_all

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    return load_all()


@pytest.mark.slow
def test_extend_covers_every_seed_pair(spark, registry):
    """The extend stage reports exactly the seed stage's pair set
    (both are 'share ≥1 live gram'), and every pair's longest run is
    at least the window length K."""
    from ingestor_etl_spark.queries.dedup_ops import SUBSTR_K

    seed = registry["exact_substring_dedup"].fn(spark, SF).toPandas()
    ext = registry["exact_substring_extend"].fn(spark, SF).toPandas()
    assert set(zip(seed.doc_a, seed.doc_b)) == set(zip(ext.doc_a, ext.doc_b))
    assert (ext.max_run_chars >= SUBSTR_K).all()
    assert (ext.n_runs >= 1).all()


@pytest.mark.slow
def test_extend_recovers_planted_run_length(spark, tmp_path, registry):
    """A planted shared quote must be recovered with max_run_chars
    equal to the full quote length (one clean run, no flanking
    overlap in the fixture)."""
    from ingestor_etl_spark.queries.dedup_ops import (
        SUBSTR_K,
        exact_substring_extend,
    )

    quote = "q".join(str(i) for i in range(SUBSTR_K))  # 3x K chars, aperiodic
    # flanking characters differ BETWEEN the docs (X./Y, vs -;:) so the
    # maximal shared run is exactly the quote — a shared space on
    # either side would legitimately extend the run past it
    rows = [
        (1, "AAAA BBBBX." + quote + ",YCCCC DDDD"),
        (2, "unrelated lead-in text-;" + quote + ":different tail here"),
        (3, "nothing shared with the others in this one at all"),
    ]
    base = str(tmp_path / "ext")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        base + "/documents.parquet"
    )
    out = exact_substring_extend(spark, base).toPandas()
    got = {(r.doc_a, r.doc_b): r.max_run_chars for r in out.itertuples()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == len(quote)


@pytest.mark.slow
def test_cross_source_matrix_accounts_for_every_pair(spark, registry):
    """The overlap matrix partitions the verified near-dup pair set:
    cell counts sum to the total pair count, and the matrix is in
    canonical (source_a <= source_b) form."""
    pairs = registry["ngram_jaccard_pairs"].fn(spark, SF).toPandas()
    mat = registry["cross_source_dup_overlap"].fn(spark, SF).toPandas()
    assert mat.n_dup_pairs.sum() == len(pairs)
    assert (mat.source_a <= mat.source_b).all()
    assert (mat.n_docs_a <= mat.n_dup_pairs).all()
    assert mat.avg_jaccard.between(0.5, 1.0).all()


@pytest.mark.slow
def test_near_dup_bucket_cap_consistency(spark, registry):
    """The hot-bucket sub-split (bucket_cap) may only DROP candidate
    pairs, never invent them: capped output ⊆ uncapped output, and a
    cap no bucket reaches reproduces the registered output exactly."""
    import pyspark.sql.functions as F

    from ingestor_etl_spark.catalog import load_table
    from ingestor_etl_spark.queries.vector_ops import _as_double, _near_dup_from

    e = (
        load_table(spark, SF, "embeddings")
        .repartition(32)
        .select("vec_id", _as_double(F.col("embedding")).alias("v"))
    )
    full = set(map(tuple, _near_dup_from(e).select("vec_a", "vec_b").collect()))
    capped = set(
        map(
            tuple,
            _near_dup_from(e, bucket_cap=4).select("vec_a", "vec_b").collect(),
        )
    )
    huge = set(
        map(
            tuple,
            _near_dup_from(e, bucket_cap=10**9)
            .select("vec_a", "vec_b")
            .collect(),
        )
    )
    assert capped <= full
    assert huge == full
