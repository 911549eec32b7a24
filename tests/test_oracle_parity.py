"""The correctness gate, locally: every registered query whose
oracle exists must match DuckDB exactly at sf0.01 (the same
comparison the driver performs for CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from ingestor_etl_spark.queries import load_all
from tests.oracle import compare, run_oracle

REGISTRY = load_all()
NAMES = sorted(REGISTRY)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    assert len(spark_pdf) >= 0  # smoke: query runs
    if q.oracle is None:
        assert len(spark_pdf) > 0, f"{name}: rows-only query returned no rows"
        return
    oracle_pdf = run_oracle(q.oracle, sf_dir)
    problems = compare(spark_pdf, oracle_pdf, name)
    assert not problems, "\n".join(problems)
