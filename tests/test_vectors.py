"""Vector-operator scale-shape tests: the LSH-bucketed near-dup must
be a strict subset of the exact all-pairs result (precision 1.0 —
candidates are verified with the exact cosine) with pinned recall,
and the plans must be free of all-pairs joins / corpus broadcasts."""

from __future__ import annotations

import pytest

from ingestor_etl_spark.plans.layout import plan_facts
from ingestor_etl_spark.queries import vector_ops as V


@pytest.mark.slow
def test_near_dup_lsh_recall_vs_exact(spark, sf_dir):
    lsh = {(r.vec_a, r.vec_b) for r in V.embedding_near_dup(spark, sf_dir).collect()}
    exact = {
        (r.vec_a, r.vec_b) for r in V.embedding_near_dup_exact(spark, sf_dir).collect()
    }
    # precision 1.0: every emitted pair is verified with the exact cosine
    assert lsh <= exact, lsh - exact
    # recall pinned at sf0.01: 13/14 with 10 tables x 4 planes
    assert len(lsh & exact) >= 0.85 * len(exact), (len(lsh), len(exact))


def _plan_text(df):
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.mark.slow
def test_near_dup_plan_has_no_all_pairs_join(spark, sf_dir):
    txt = _plan_text(V.embedding_near_dup(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in txt
    assert "CartesianProduct" not in txt


def test_ann_ivf_broadcast_is_filtered_query_set(spark, sf_dir):
    """The q-side broadcast must carry only the N_QUERIES query
    vectors, not the whole corpus: the vec_id < 20 filter must reach
    a parquet scan (it feeds the broadcast build side)."""
    facts = plan_facts(V.ann_ivf(spark, sf_dir))
    assert any(
        f"LessThan(vec_id,{V.N_QUERIES})" in f.replace(" ", "")
        for f in facts["pushed_filters"]
    ), facts["pushed_filters"]


def test_ann_cosine_topk_broadcasts_queries_not_corpus(spark, sf_dir):
    facts = plan_facts(V.ann_cosine_topk(spark, sf_dir))
    assert any(
        f"LessThan(vec_id,{V.N_QUERIES})" in f.replace(" ", "")
        for f in facts["pushed_filters"]
    ), facts["pushed_filters"]
