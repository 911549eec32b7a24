"""Wave-31 (round 14, optimization): the fixture invariants behind
the plan-constant recall denominators (round-13 verdict item 4) and
the shingle_df_profile count(*) rewrite (ADVICE r13), plus the memo
hygiene contract (_coord_memo holds trained-model parameters only —
zero count-censuses, zero query results).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from ingestor_etl_spark.queries.vector_ops import (
    _HAM_TOPK,
    IVF_TOPK,
    N_QUERIES,
)

SCALES = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")


@pytest.mark.parametrize("sf", SCALES)
def test_doc_id_unique(sf):
    """shingle_df_profile's count(*) == count(DISTINCT doc_id)
    rewrite requires doc_id-unique documents rows (ADVICE r13)."""
    ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    assert len(ids) == len(set(ids))


@pytest.mark.parametrize("sf", SCALES)
def test_embeddings_query_block_contiguous(sf):
    """The plan-constant denominators (n_edges = N_QUERIES × TOPK in
    hamming_pool_whatif / ivf_nprobe_whatif / ann_quality_scoreboard)
    hold iff vec_ids 0..N_QUERIES−1 all exist and every query has
    ≥ TOPK non-self neighbors. The fixture ships contiguous vec_ids
    from 0 with a comfortable margin."""
    ids = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id"])[
        "vec_id"
    ].to_pylist()
    n = len(ids)
    assert n >= N_QUERIES + max(IVF_TOPK, _HAM_TOPK)
    assert set(ids) == set(range(n))


def test_exact_leg_cardinality_is_plan_constant(spark, sf_dir):
    """|exact top-k edge set| == N_QUERIES × IVF_TOPK — the value the
    round-14 rewrite embeds as a literal instead of counting the
    exact leg at build (r13 verdict item 4)."""
    from ingestor_etl_spark.queries import load_all

    from pyspark.sql import functions as F

    reg = load_all()
    n = (
        reg["ann_cosine_topk"]
        .fn(spark, sf_dir)
        .where(F.col("rnk") <= IVF_TOPK)
        .count()
    )
    assert n == N_QUERIES * IVF_TOPK


def test_coord_memo_holds_models_only(spark, sf_dir):
    """After building the heaviest IVF stacks, every memo entry is a
    trained-model parameter (Lloyd books / collected seed rows) —
    zero count-censuses (r13 verdict item 4: 'Done = _coord_memo
    holds only trained-model parameters')."""
    from ingestor_etl_spark.plans.layout import release_caches
    from ingestor_etl_spark.queries import load_all
    from ingestor_etl_spark.queries.vector_ops import _COORD_MEMO

    reg = load_all()
    for name in ("ann_ivf_pq", "ivf_nprobe_whatif", "hamming_pool_whatif"):
        reg[name].fn(spark, sf_dir)
        release_caches()
    allowed = {
        "ivf_seed_rows",
        "ivf_book",
        "pq_raw_books",
        "pq_resid_books",
        "sub_books",
    }
    kinds = {k[0] for k in _COORD_MEMO}
    assert kinds <= allowed, kinds - allowed
