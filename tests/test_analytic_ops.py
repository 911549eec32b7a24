"""Sketch aggregates now carry their own oracle surface: the query
emits the EXACT values plus a ``within_bound`` flag that asserts the
estimator landed inside its error budget (see analytic_ops module
docstring). These tests cross-check that surface against DuckDB
independently of the driver's oracle run."""

from __future__ import annotations

import pytest

import duckdb

from ingestor_etl_spark.catalog import table_path
from ingestor_etl_spark.queries import load_all

REGISTRY = load_all()


@pytest.mark.slow
def test_hll_distinct_within_bound(spark, sf_dir):
    rows = REGISTRY["sketch_distinct_users"].fn(spark, sf_dir).collect()
    exact = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id) FROM "
            f"read_parquet('{table_path(sf_dir, 'events')}') GROUP BY 1"
        ).fetchall()
    )
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        assert r.exact_users == exact[r.event_type], (r.event_type, r.exact_users)
        assert r.within_bound, (r.event_type, "sketch outside error budget")


def test_quantile_sketch_within_bound(spark, sf_dir):
    rows = REGISTRY["sketch_value_quantiles"].fn(spark, sf_dir).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{table_path(sf_dir, 'events')}')"
    )
    for r in rows:
        assert r.within_bound, (r.event_type, "sketch outside error budget")
        for q, v in ((0.5, r.p50_exact), (0.95, r.p95_exact), (0.99, r.p99_exact)):
            want = con.execute(
                "SELECT round(quantile_cont(value, ?), 4) FROM events WHERE event_type = ?",
                [q, r.event_type],
            ).fetchone()[0]
            assert abs(v - want) < 1e-9, (r.event_type, q, v, want)
