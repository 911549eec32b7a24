"""Round-3 curation operator semantics (queries/curation_ops.py)."""

from __future__ import annotations

from collections import Counter

from ingestor_etl_spark.queries import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_html_strip_removes_all_boilerplate(spark):
    """Every synthesized doc carries exactly 3 boilerplate blocks
    (script/nav/footer), and stripping is idempotent on the text."""
    rows = REGISTRY["html_strip"].fn(spark, SF).collect()
    assert len(rows) > 0
    assert all(r.n_boilerplate_blocks == 3 for r in rows)


def test_importance_resample_moves_mixture_toward_uniform(spark):
    """Overrepresented sources must get lower keep rates; every rate
    in (0, 1]."""
    rows = REGISTRY["importance_resample"].fn(spark, SF).collect()
    assert rows, "resample kept nothing"
    rates = {}
    for r in rows:
        rates[r.source] = r.rate
        assert 0 < r.rate <= 1
        assert r.bucket < r.rate * 10000
    from ingestor_etl_spark.catalog import load_table
    from pyspark.sql import functions as F

    toks = {
        r.source: r.n
        for r in load_table(spark, SF, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split(F.trim("text"), r" +"))).alias("n"))
        .collect()
    }
    shared = [s for s in rates if s in toks]
    big = max(shared, key=lambda s: toks[s])
    small = min(shared, key=lambda s: toks[s])
    if toks[big] > toks[small]:
        assert rates[big] <= rates[small]


def test_curriculum_bins_are_balanced_per_source(spark):
    rows = REGISTRY["curriculum_bins"].fn(spark, SF).collect()
    per = Counter((r.source, r.bin) for r in rows)
    per_source = Counter(r.source for r in rows)
    for (src, b), n in per.items():
        # ntile balance: bins differ by at most 1 within a source
        assert abs(n - per_source[src] / 10) <= 1
    # longest doc in a source sits in bin 1
    best = {}
    for r in rows:
        if r.source not in best or r.n_tokens > best[r.source].n_tokens:
            best[r.source] = r
    assert all(r.bin == 1 for r in best.values())


def test_bpe_pairs_match_python_reference(spark):
    from ingestor_etl_spark.catalog import load_table

    docs = [r.text for r in load_table(spark, SF, "documents").collect()]
    ref = Counter()
    for t in docs:
        for w in t.strip().split():
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    ref[w[i : i + 2]] += 1
    expected = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r.pair, r.n)
        for r in REGISTRY["bpe_pair_counts"].fn(spark, SF).collect()
    ]
    assert got == expected


def test_orc_roundtrip_preserves_every_row(spark):
    from ingestor_etl_spark.catalog import load_table

    got = REGISTRY["orc_ingest"].fn(spark, SF).count()
    assert got == load_table(spark, SF, "documents").count()
