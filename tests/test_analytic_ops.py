"""Sketch aggregates have no SQL oracle (estimator-specific output);
assert their estimates against exact values within the estimator's
error bound instead (see analytic_ops module docstring)."""

from __future__ import annotations

import duckdb

from ingestor_etl_spark.catalog import table_path
from ingestor_etl_spark.queries import load_all

REGISTRY = load_all()


def test_hll_distinct_within_bound(spark, sf_dir):
    got = {
        r.event_type: (r.approx_users, r.n_events)
        for r in REGISTRY["sketch_distinct_users"].fn(spark, sf_dir).collect()
    }
    exact = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id) FROM "
            f"read_parquet('{table_path(sf_dir, 'events')}') GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(exact)
    for etype, (approx, _n) in got.items():
        assert abs(approx - exact[etype]) / exact[etype] < 0.05, (etype, approx, exact[etype])


def test_quantile_sketch_rank_error(spark, sf_dir):
    rows = REGISTRY["sketch_value_quantiles"].fn(spark, sf_dir).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{table_path(sf_dir, 'events')}')"
    )
    for r in rows:
        for q, v in ((0.5, r.p50), (0.95, r.p95), (0.99, r.p99)):
            frac = con.execute(
                "SELECT CAST(SUM(CASE WHEN value <= ? THEN 1 ELSE 0 END) AS DOUBLE)"
                " / COUNT(*) FROM events WHERE event_type = ?",
                [v, r.event_type],
            ).fetchone()[0]
            # GK sketch with accuracy 10000: observed rank must sit at
            # (or above) the requested quantile within tight slack.
            assert frac >= q - 0.02 and frac <= min(1.0, q + 0.05), (
                r.event_type, q, v, frac,
            )
