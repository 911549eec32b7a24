"""Round-4 wave-3 operator semantics: time-series gap-fill,
count-min heavy hitters, source reputation gate, compaction
planner, LSH kNN graph. (Oracle parity is swept separately by
test_oracle_parity.py; these assert the operator CONTRACTS.)"""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


# ------------------------------------------------------ events_gapfill
def test_gapfill_grid_is_dense_and_fill_is_carry_forward(spark):
    rows = REGISTRY["events_gapfill"].fn(spark, SF).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    hour_us = 3_600_000_000
    assert by_user, "no gap-fill output"
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.hr_us)
        # dense hourly grid: consecutive rows exactly one hour apart
        for a, b in zip(rs, rs[1:]):
            assert b.hr_us - a.hr_us == hour_us, (user, a.hr_us, b.hr_us)
        # first grid hour is observed by construction (span starts at
        # the user's first event)
        assert rs[0].is_observed
        # forward fill: unobserved hours repeat the last observed value
        last = None
        for r in rs:
            if r.is_observed:
                last = r.filled_value
            else:
                assert r.filled_value == last, (user, r.hr_us)


def test_gapfill_observed_hours_match_events(spark):
    from ingestor_etl_spark.queries.analytic_ops import GAPFILL_USERS

    e = (
        load_table(spark, SF, "events")
        .where(F.col("user_id") < GAPFILL_USERS)
        .select(
            "user_id",
            F.unix_micros(F.date_trunc("hour", "ts")).alias("hr_us"),
        )
        .distinct()
        .collect()
    )
    observed = {(r.user_id, r.hr_us) for r in e}
    rows = REGISTRY["events_gapfill"].fn(spark, SF).collect()
    got = {(r.user_id, r.hr_us) for r in rows if r.is_observed}
    assert got == observed


# --------------------------------------------------- cms_heavy_hitters
def test_cms_never_undercounts_and_matches_python_sketch(spark):
    from ingestor_etl_spark.queries.analytic_ops import (
        CMS_DEPTH,
        CMS_TOPK,
        CMS_WIDTH,
    )

    rows = REGISTRY["cms_heavy_hitters"].fn(spark, SF).collect()
    assert len(rows) == CMS_TOPK
    for r in rows:
        assert r.overcount >= 0, r
        assert r.cms_n == r.exact_n + r.overcount

    # Python reference sketch over the same token stream
    texts = [
        r.text for r in load_table(spark, SF, "documents").select("text").collect()
    ]
    toks = [w for t in texts for w in t.strip().split()]

    def bucket(j: int, w: str) -> int:
        return int(hashlib.md5(f"{j}:{w}".encode()).hexdigest()[:8], 16) % CMS_WIDTH

    cells = {}
    for w in toks:
        for j in range(CMS_DEPTH):
            key = (j, bucket(j, w))
            cells[key] = cells.get(key, 0) + 1
    from collections import Counter

    exact = Counter(toks)
    for r in rows:
        assert exact[r.token] == r.exact_n
        est = min(cells[(j, bucket(j, r.token))] for j in range(CMS_DEPTH))
        assert est == r.cms_n, r.token


# --------------------------------------------------- source_reputation
def test_source_reputation_gate_matches_python(spark):
    from ingestor_etl_spark.queries.corpus_ops import (
        REPUTATION_GOOD_CHARS,
        REPUTATION_KEEP_MILLI,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    per_src = {}
    for r in docs:
        n, good = per_src.get(r.source, (0, 0))
        per_src[r.source] = (n + 1, good + (r.n_chars >= REPUTATION_GOOD_CHARS))
    rep = {s: (1000 * g) // n for s, (n, g) in per_src.items()}
    expect = {
        (r.doc_id, r.source, rep[r.source])
        for r in docs
        if rep[r.source] >= REPUTATION_KEEP_MILLI
    }
    got = {
        (r.doc_id, r.source, r.rep_milli)
        for r in REGISTRY["source_reputation"].fn(spark, SF).collect()
    }
    assert got == expect
    assert got, "gate dropped every source — threshold degenerate"
    assert len(got) < len(docs), "gate kept everything — threshold degenerate"


# ----------------------------------------------------- compaction_plan
def test_compaction_bins_are_sequential_fill(spark):
    from ingestor_etl_spark.queries.warehouse_ops import COMPACTION_TARGET_BYTES

    rows = REGISTRY["compaction_plan"].fn(spark, SF).collect()
    rows.sort(key=lambda r: (-r.part_bytes, r.source, r.lang))
    cum = 0
    for r in rows:
        cum += r.part_bytes
        assert r.cum_bytes == cum
        assert r.bin_id == (cum - r.part_bytes) // COMPACTION_TARGET_BYTES
    # bins must actually pack multiple parts (not one bin per part,
    # not everything in one bin) at this sf
    bins = {r.bin_id for r in rows}
    assert 1 < len(bins) < len(rows)


# ----------------------------------------------------------- knn_graph
def test_knn_graph_edges_are_exact_cosines_ranked(spark):
    from ingestor_etl_spark.queries.vector_ops import KNN_K

    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF, "embeddings").collect()
    }
    rows = REGISTRY["knn_graph"].fn(spark, SF).collect()
    assert rows, "empty kNN graph"
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.rnk)
        assert len(rs) <= KNN_K
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        # ranks are descending in cos_sim with dst tiebreak
        key = [(-r.cos_sim, r.dst) for r in rs]
        assert key == sorted(key)
        for r in rs:
            a, b = vecs[r.src], vecs[r.dst]
            cos = float(a @ b / (math.sqrt(a @ a) * math.sqrt(b @ b)))
            assert abs(cos - r.cos_sim) < 5e-5, (r.src, r.dst)


def test_knn_graph_recall_vs_exact_topk(spark):
    """LSH recall REGRESSION guard (floor 0.3), not a quality bar:
    at the registered demo parameters (KNN_PLANES=6, N_TABLES=10)
    measured exact-top-3 recall is 0.37 at sf0.001 / 0.40 at sf0.01
    — the 6-bit buckets trade recall for candidate volume (a
    parameter sweep showed distinct candidates bottom out at ~0.7M
    for ANY plane/table setting on this label-clustered corpus, so
    more recall only comes from coarser buckets at ~2× the pair
    mass; production tunes this knob per corpus). The floor catches
    catastrophic breakage (a bucketing bug drives recall to ~0.05),
    not estimator tuning."""
    from ingestor_etl_spark.queries.vector_ops import KNN_K

    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF, "embeddings").collect()
    }
    ids = sorted(vecs)
    mat = np.stack([vecs[i] / np.linalg.norm(vecs[i]) for i in ids])
    sims = mat @ mat.T
    np.fill_diagonal(sims, -2.0)
    got = {(r.src, r.dst) for r in REGISTRY["knn_graph"].fn(spark, SF).collect()}
    hits = total = 0
    for row_idx, vid in enumerate(ids):
        order = np.argsort(-np.round(sims[row_idx], 4))[:KNN_K]
        for col in order:
            total += 1
            hits += (vid, ids[col]) in got
    assert hits / total >= 0.3, f"recall {hits}/{total}"
