"""Wave-30 (round 13, optimization): the Arrow-batched numpy Hamming
sketch kernel (_vec_np.np_ham_words) replaces the 64 interpreted
aggregate/zip_with plane folds in the sketch family (guide §4 —
heavyweight per-row numeric work in vectorized Arrow batches).

The kernel accumulates k-sequentially over dimensions, so every
plane dot is the EXACT left-to-right fold the hof computed — the
packed words must be bitwise-identical at every oracle scale. These
pins fail immediately if the kernel ever switches to a pairwise-
summing matmul (which could flip a sign bit on a near-zero dot)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries.vector_ops import (
    _as_double,
    _ham_word_spark,
    _np_ham_words,
)

SCALES = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


@pytest.mark.parametrize("sf_dir", SCALES)
def test_np_sketch_bitwise_equals_hof_fold(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    hof = e.selectExpr(
        "vec_id",
        f"CAST({_ham_word_spark(0)} AS BIGINT) AS w0",
        f"CAST({_ham_word_spark(1)} AS BIGINT) AS w1",
    )
    np_ = _np_ham_words(e).select("vec_id", "w0", "w1")
    n = e.count()
    eq = hof.alias("a").join(np_.alias("b"), "vec_id").where(
        "a.w0 = b.w0 AND a.w1 = b.w1"
    )
    assert eq.count() == n


def test_np_sketch_single_python_eval(spark):
    """The struct-returning kernel is evaluated ONCE per pass even
    though two fields are extracted from it (the optimizer must not
    duplicate the UDF when collapsing the field-extract projection)."""
    e = load_table(spark, SCALES[0], "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    plan = (
        _np_ham_words(e)
        .select("vec_id", "w0", "w1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan
