"""Round-4 operator semantics: snapshot diff, hashed-feature quality
classifier, canonical-doc election, RRF hybrid fusion, PQ ANN."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ingestor_etl_spark.queries import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_snapshot_diff_statuses_match_synthesis_rules(spark):
    from ingestor_etl_spark.catalog import load_table
    from ingestor_etl_spark.queries.warehouse_ops import _NEW_KEY_OFFSET

    rows = REGISTRY["snapshot_diff"].fn(spark, SF).collect()
    ids = {r.event_id for r in load_table(spark, SF, "events").select("event_id").collect()}
    by_status = {}
    for r in rows:
        by_status.setdefault(r.status, []).append(r)
    # removed = every key % 500 == 0; added = every key % 977 == 0 (offset)
    assert {r.event_id for r in by_status.get("removed", [])} == {
        i for i in ids if i % 500 == 0
    }
    assert {r.event_id for r in by_status.get("added", [])} == {
        i + _NEW_KEY_OFFSET for i in ids if i % 977 == 0
    }
    for r in by_status.get("removed", []):
        assert r.new_value is None and r.old_value is not None
    for r in by_status.get("added", []):
        assert r.old_value is None and r.new_value is not None
    # changed = %13 keys surviving deletion whose value actually moved
    for r in by_status.get("changed", []):
        assert r.event_id % 13 == 0 and r.event_id % 500 != 0
        assert r.new_value == 2 * r.old_value


def test_quality_classifier_matches_python_reference(spark):
    """Exact margin recompute in Python: md5-hash the tokens, sum
    integer milli-weights, one division."""
    from ingestor_etl_spark.catalog import load_table

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents").limit(50).collect()
    }
    got = {
        r.doc_id: (r.score, r.keep)
        for r in REGISTRY["quality_classifier"].fn(spark, SF).collect()
    }
    for doc_id, text in docs.items():
        toks = text.strip().split()
        margin = sum(
            int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 1001 - 500
            for w in toks
        )
        score = margin / (1000.0 * len(toks))
        assert got[doc_id] == (score, margin > 0)


def test_canonical_docs_consistent_with_clusters(spark):
    clusters = {
        r.doc_id: r.cluster_id
        for r in REGISTRY["dedup_cc_clusters"].fn(spark, SF).collect()
    }
    from ingestor_etl_spark.catalog import load_table

    toks = {
        r.doc_id: r.n
        for r in load_table(spark, SF, "documents")
        .select("doc_id", F.size(F.split(F.trim("text"), r" +")).alias("n"))
        .collect()
    }
    rows = REGISTRY["canonical_docs"].fn(spark, SF).collect()
    by_cluster = {}
    for d, c in clusters.items():
        by_cluster.setdefault(c, []).append(d)
    assert {r.cluster_id for r in rows} == set(by_cluster)
    for r in rows:
        members = by_cluster[r.cluster_id]
        assert r.n_members == len(members)
        best = min(members, key=lambda d: (-toks[d], d))
        assert r.canonical_id == best and r.n_tokens == toks[best]


def test_rrf_scores_follow_formula_and_fusion_property(spark):
    rows = REGISTRY["rrf_hybrid_search"].fn(spark, SF).collect()
    assert rows
    per_query = {}
    for r in rows:
        # score recomputes from the two ranks exactly
        assert abs(r.rrf_score - round(1.0 / (60 + r.r_cos) + 1.0 / (60 + r.r_l2), 6)) < 1e-12
        per_query.setdefault(r.query_id, []).append(r)
    for q, rs in per_query.items():
        assert [r.rnk for r in sorted(rs, key=lambda r: r.rnk)] == list(
            range(1, len(rs) + 1)
        )
        # a doc ranked #1 by BOTH signals must be fused rank 1
        both_first = [r for r in rs if r.r_cos == 1 and r.r_l2 == 1]
        for r in both_first:
            assert r.rnk == 1


def test_pq_approximates_exact_neighbors(spark):
    """PQ is lossy but must stay a real approximation: every query
    gets exactly TOPK neighbors with non-negative distances, and
    averaged recall@5 vs the exact cosine baseline is well above
    chance (random would be ~TOPK/n)."""
    from ingestor_etl_spark.queries.vector_ops import TOPK

    pq = {}
    for r in REGISTRY["ann_pq_topk"].fn(spark, SF).collect():
        pq.setdefault(r.query_id, set()).add(r.neighbor_id)
        assert r.approx_dist >= -1e-6
    exact = {}
    for r in REGISTRY["ann_cosine_topk"].fn(spark, SF).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(pq) == set(exact)
    assert all(len(v) == TOPK for v in pq.values())
    from ingestor_etl_spark.catalog import load_table

    n = load_table(spark, SF, "embeddings").count()
    recall = sum(len(pq[q] & exact[q]) for q in exact) / (len(exact) * TOPK)
    assert recall > 3 * TOPK / max(n, 1), recall


def test_lsh_eval_confusion_identities(spark):
    """Full Python re-derivation of lsh_dedup_eval: fixed-size md5
    stratum, stop-shingle cut, aggregation-form minhash, banding,
    exact Jaccard truth — demand the identical confusion row."""
    import hashlib
    from collections import defaultdict

    from ingestor_etl_spark.catalog import load_table
    from ingestor_etl_spark.queries.dedup_ops import (
        EVAL_N,
        N_BANDS,
        SALTS,
        STOP_SHINGLE_MAX_DOCS,
        _JACCARD_THRESHOLD,
    )

    row = REGISTRY["lsh_dedup_eval"].fn(spark, SF).collect()[0]
    assert row.tp + row.fp == row.n_candidates
    assert row.tp + row.fn == row.n_truth
    assert 0.0 <= row.precision <= 1.0 and 0.0 <= row.recall <= 1.0
    assert row.n_truth > 0, "stratum degenerate — no truth pairs at this sf"

    docs = {
        r.doc_id: r.text for r in load_table(spark, SF, "documents").collect()
    }
    md5hex = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    stratum = sorted(docs, key=lambda d: (md5hex(str(d)), d))[:EVAL_N]
    shingles = {}
    for d in stratum:
        toks = docs[d].strip().lower().split()
        sset = {f"{a} {b}" for a, b in zip(toks, toks[1:])}
        if sset:
            shingles[d] = sset
    df_count = defaultdict(set)
    for d, sset in shingles.items():
        for s in sset:
            df_count[s].add(d)
    hot = {s for s, ds in df_count.items() if len(ds) > STOP_SHINGLE_MAX_DOCS}
    live = {
        d: {s for s in sset if s not in hot} for d, sset in shingles.items()
    }
    live = {d: sset for d, sset in live.items() if sset}
    h60 = lambda s: int(md5hex(s)[:15], 16)  # noqa: E731
    sigs = {
        d: [min(h60(salt + s) for s in sset) for salt in SALTS]
        for d, sset in live.items()
    }
    buckets = defaultdict(set)
    for d, sig in sigs.items():
        for i in range(N_BANDS):
            buckets[(i, f"{sig[2 * i]}:{sig[2 * i + 1]}")].add(d)
    cand = set()
    for ds in buckets.values():
        ds = sorted(ds)
        for i_, a in enumerate(ds):
            for b in ds[i_ + 1 :]:
                cand.add((a, b))
    truth = set()
    ids = sorted(live)
    for i_, a in enumerate(ids):
        for b in ids[i_ + 1 :]:
            inter = len(live[a] & live[b])
            if inter and inter / (len(live[a]) + len(live[b]) - inter) >= _JACCARD_THRESHOLD:
                truth.add((a, b))
    tp = len(cand & truth)
    assert (row.n_candidates, row.n_truth, row.tp, row.fp, row.fn) == (
        len(cand),
        len(truth),
        tp,
        len(cand) - tp,
        len(truth) - tp,
    )


def test_stop_shingle_cut_bounds_hot_shingles(spark):
    """The truth-leg blowup guard: a boilerplate shingle shared by
    many more docs than STOP_SHINGLE_MAX_DOCS is dropped entirely
    (zero pairs from it), normal shingles survive, and the hot list
    is applied as a broadcast anti-join (never shuffled)."""
    from ingestor_etl_spark.queries.dedup_ops import (
        STOP_SHINGLE_MAX_DOCS,
        stop_shingle_cut,
    )

    n_hot = STOP_SHINGLE_MAX_DOCS * 3
    rows = [(i, "hot shingle") for i in range(n_hot)]
    rows += [(1000, "rare pair"), (1001, "rare pair"), (1002, "loner one")]
    exploded = spark.createDataFrame(rows, ["doc_id", "shingle"])
    live = stop_shingle_cut(exploded)
    got = sorted((r.doc_id, r.shingle) for r in live.collect())
    assert got == [
        (1000, "rare pair"),
        (1001, "rare pair"),
        (1002, "loner one"),
    ]
    plan = live._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # at exactly the threshold the shingle survives (cut is strict >)
    at_cap = spark.createDataFrame(
        [(i, "edge") for i in range(STOP_SHINGLE_MAX_DOCS)],
        ["doc_id", "shingle"],
    )
    assert stop_shingle_cut(at_cap).count() == STOP_SHINGLE_MAX_DOCS


def test_vocab_coverage_python_reference(spark):
    from collections import Counter

    from ingestor_etl_spark.catalog import load_table

    docs = {
        r.doc_id: r.text.strip().lower().split()
        for r in load_table(spark, SF, "documents").collect()
    }
    counts = Counter(w for toks in docs.values() for w in toks)
    vocab = {
        w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    }
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
        for r in REGISTRY["vocab_coverage"].fn(spark, SF).collect()
    }
    for doc_id, toks in docs.items():
        oov = sum(1 for w in toks if w not in vocab)
        assert got[doc_id] == (len(toks), oov, oov / len(toks))


def test_mixture_drift_is_a_distribution_distance(spark):
    rows = REGISTRY["mixture_drift"].fn(spark, SF).collect()
    assert rows
    assert abs(sum(r.p for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.q for r in rows) - 1.0) < 1e-9
    tv = {r.tv_distance for r in rows}
    assert len(tv) == 1  # one global number repeated per row
    tv = tv.pop()
    assert 0.0 <= tv <= 1.0
    assert abs(tv - 0.5 * sum(abs(r.shift) for r in rows)) < 1e-6


def test_partitioned_roundtrip_prunes_partitions(spark):
    """The point of partitionBy(lang): a lang-selective read of the
    written copy must show PartitionFilters in the scan (directory
    pruning), and partition counts must match the source table."""
    from ingestor_etl_spark.catalog import load_table
    from ingestor_etl_spark.queries.curation_ops import _part_dir

    rows = REGISTRY["partitioned_write_roundtrip"].fn(spark, SF).collect()
    src = {
        (r.lang, r.n): None
        for r in load_table(spark, SF, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {(r.lang, r.n_docs) for r in rows} == set(src)
    back = spark.read.parquet(_part_dir(SF))
    one_lang = rows[0].lang
    plan = (
        back.where(F.col("lang") == one_lang)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "lang" in plan.split("PartitionFilters")[1][:120]


def test_dedup_report_consistent_with_parts(spark):
    row = REGISTRY["dedup_report"].fn(spark, SF).collect()[0]
    n_pairs = REGISTRY["minhash_lsh_pairs"].fn(spark, SF).count()
    clusters = REGISTRY["dedup_cc_clusters"].fn(spark, SF).collect()
    assert row.n_lsh_pairs == n_pairs
    assert row.n_clustered_docs == len(clusters)
    assert row.n_clusters == len({r.cluster_id for r in clusters})
    assert row.n_docs_removed == row.n_clustered_docs - row.n_clusters
    assert abs(row.keep_rate - (row.n_docs - row.n_docs_removed) / row.n_docs) < 1e-12


def test_salted_agg_is_two_phase_and_exact(spark):
    df = REGISTRY["salted_hot_agg"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # phase-1 key includes the salt
    got = {(r.event_type, r.n_events, r.total_value) for r in df.collect()}
    from ingestor_etl_spark.catalog import load_table

    direct = {
        (r.event_type, r.n_events, r.total_value)
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    assert got == direct
