"""Wave-29 (round 13, optimization): process-scoped memoization of
the IVF family's deterministic coordinator work (round-12 verdict
item 1). Lloyd training is a pure function of (data fingerprint,
seed ids, iteration count), yet every IVF-family build re-trained —
and the scoreboard's four IVF arms re-trained the identical coarse
book 3× over (measured: 24.9 s of build for one scoreboard
construction at sf0.1 split layout). _coord_memo collapses that to
once per process; outputs cannot change because the memoized values
are the deterministic inputs the plans embed as literals. (Round 14,
r13 verdict item 4: censuses are no longer memoized — the memo holds
trained-model parameters only; see tests/test_wave31.)

Pins here:
- the no-redundant-training budget (verdict item 6): one scoreboard
  build performs each distinct coordinator computation EXACTLY once,
  and exactly ONE coarse-book training total;
- memo-hit ≡ memo-miss: a rebuilt stack on a warm memo emits
  byte-identical rows to the cold build."""

from __future__ import annotations

import pytest

from ingestor_etl_spark.plans.layout import release_caches
from ingestor_etl_spark.queries import load_all
from ingestor_etl_spark.queries import vector_ops as vo

SF001 = "/root/testdata/sf0.01"


def _reset_memo():
    vo._COORD_MEMO.clear()
    vo._COORD_STATS["hits"] = 0
    vo._COORD_STATS["misses"] = 0


@pytest.mark.slow
def test_scoreboard_coordinator_budget(spark):
    """Building the 7-arm scoreboard must not repeat coordinator
    work: every distinct (kind, dir, seeds, iters) key is computed
    once (misses == stored keys), the shared coarse book is trained
    exactly once across all IVF arms, and a second scoreboard build
    adds ZERO coordinator jobs. Removing the memoization fails this
    immediately (the three IVF stacks would each re-train)."""
    reg = load_all()
    _reset_memo()
    reg["ann_quality_scoreboard"].fn(spark, SF001)
    misses = vo._COORD_STATS["misses"]
    assert misses == len(vo._COORD_MEMO), vo._COORD_STATS
    book_keys = [k for k in vo._COORD_MEMO if k[0] == "ivf_book"]
    assert len(book_keys) == 1, book_keys
    # warm rebuild: all hits, no new coordinator work
    reg["ann_quality_scoreboard"].fn(spark, SF001)
    assert vo._COORD_STATS["misses"] == misses, vo._COORD_STATS
    release_caches()


@pytest.mark.slow
def test_memo_hit_equals_memo_miss(spark):
    """The memo can only return what the thunk would have computed:
    a stack built on a warm memo must emit byte-identical rows to
    the cold build."""
    reg = load_all()
    for name in ("ann_ivf_pq", "ann_ivf_pq_residual", "ann_ivf_hamming"):
        _reset_memo()
        cold = [tuple(r) for r in reg[name].fn(spark, SF001).collect()]
        release_caches()
        assert vo._COORD_STATS["misses"] > 0
        warm_stats_before = vo._COORD_STATS["misses"]
        warm = [tuple(r) for r in reg[name].fn(spark, SF001).collect()]
        release_caches()
        assert vo._COORD_STATS["misses"] == warm_stats_before, name
        assert cold == warm, name
