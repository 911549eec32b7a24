"""Round-4 wave-8 operator semantics: CUBE grouping sets, HLL shard
merge, z-order layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_cube_subtotals_are_consistent(spark):
    rows = REGISTRY["cube_revenue"].fn(spark, SF).collect()
    detail = [r for r in rows if r.grp_id == 0]
    by_flag = {r.returnflag: r for r in rows if r.grp_id == 1}
    by_status = {r.linestatus: r for r in rows if r.grp_id == 2}
    grand = [r for r in rows if r.grp_id == 3]
    assert len(grand) == 1
    # grand total = sum of detail cells (counts exactly; revenue to
    # the cent — each subtotal is its own decimal aggregation)
    assert grand[0].n == sum(r.n for r in detail)
    assert abs(grand[0].revenue - sum(r.revenue for r in detail)) < 1e-4
    for flag, r in by_flag.items():
        cells = [c for c in detail if c.returnflag == flag]
        assert r.n == sum(c.n for c in cells)
    for status, r in by_status.items():
        cells = [c for c in detail if c.linestatus == status]
        assert r.n == sum(c.n for c in cells)
    # 'ALL' labels appear only on subtotal rows (grp_id marks them)
    for r in detail:
        assert r.returnflag != "ALL" and r.linestatus != "ALL"


def test_hll_shard_merge_within_bound(spark):
    row = REGISTRY["sketch_shard_merge"].fn(spark, SF).collect()[0]
    from ingestor_etl_spark.queries.analytic_ops import SKETCH_SHARDS

    assert row.n_shards == SKETCH_SHARDS
    exact = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert row.exact_users == exact
    assert row.within_bound


def test_zorder_files_cover_small_rectangles(spark):
    from ingestor_etl_spark.queries.analytic_ops import ZORDER_FILES

    rows = REGISTRY["zorder_layout"].fn(spark, SF).collect()
    events = load_table(spark, SF, "events").count()
    assert sum(r.n_rows for r in rows) == events
    assert len(rows) <= ZORDER_FILES
    for r in rows:
        # each z-range file spans a bounded rectangle in BOTH dims:
        # 256 consecutive z-values cover at most a 16x16 bx/by block
        assert r.max_bx - r.min_bx <= 15, r
        assert r.max_by - r.min_by <= 15, r
        assert 0 <= r.min_bx and r.max_bx <= 63
        assert 0 <= r.min_by and r.max_by <= 63


def test_zorder_zvalue_is_morton_interleave(spark):
    from ingestor_etl_spark.queries.analytic_ops import ZORDER_DIM_BITS

    def morton(bx: int, by: int) -> int:
        z = 0
        for i in range(ZORDER_DIM_BITS):
            z |= ((bx >> i) & 1) << (2 * i + 1)
            z |= ((by >> i) & 1) << (2 * i)
        return z

    # python recount of the per-file histogram from raw events must
    # equal the operator's output (full morton + file-assignment path)
    events = load_table(spark, SF, "events").select("user_id", "value").collect()
    expect: dict[int, int] = {}
    for r in events:
        bx = r.user_id % 64
        by = int(round(r.value * 100)) % 64
        z = morton(bx, by)
        assert 0 <= z < 4096
        expect[z // 256] = expect.get(z // 256, 0) + 1
    got = {
        r.file_id: r.n_rows
        for r in REGISTRY["zorder_layout"].fn(spark, SF).collect()
    }
    assert got == expect


# ---------------------------------------------------- curation_pipeline
def test_curation_pipeline_dispositions_consistent(spark):
    from ingestor_etl_spark.queries.corpus_ops import REPUTATION_KEEP_MILLI
    from ingestor_etl_spark.queries.pipeline_ops import PIPE_MIN_TOKENS

    rows = REGISTRY["curation_pipeline"].fn(spark, SF).collect()
    docs = load_table(spark, SF, "documents").count()
    assert len(rows) == docs
    by_disp = {}
    for r in rows:
        by_disp.setdefault(r.disposition, []).append(r)
    # the gates that can fire at this sf must fire (the synthetic
    # corpus has no normalized-text exact duplicates at sf0.001 —
    # exact_dup is instead checked by count against exact_dedup)
    for d in ("bad_source", "low_quality", "near_dup", "kept"):
        assert d in by_disp, d
    by_disp.setdefault("exact_dup", [])
    # precedence sanity: low_quality rows are below the token floor;
    # kept and near_dup rows are at/above it
    for r in by_disp["low_quality"]:
        assert r.n_toks < PIPE_MIN_TOKENS
    for r in by_disp["kept"] + by_disp["near_dup"]:
        assert r.n_toks >= PIPE_MIN_TOKENS

    # consistency with the standalone operators: a doc flagged
    # exact_dup here is a non-first member of an exact_dedup cluster
    exact = {
        r.keep_doc_id: r.n_copies
        for r in REGISTRY["exact_dedup"].fn(spark, SF).collect()
    }
    n_exact_dups = sum(n - 1 for n in exact.values())
    assert len(by_disp["exact_dup"]) == n_exact_dups
    # a doc from a source below the reputation floor (and not an
    # exact dup) must be bad_source
    reps = {
        (r.doc_id): r.rep_milli
        for r in REGISTRY["source_reputation"].fn(spark, SF).collect()
    }
    good_source_docs = set(reps)
    for r in by_disp["bad_source"]:
        assert r.doc_id not in good_source_docs
    assert REPUTATION_KEEP_MILLI  # referenced constants stay live
