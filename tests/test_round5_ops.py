"""Round-5 operator semantics: independent Python re-derivations and
composition checks at sf0.001 (oracle parity itself is covered by the
registry-wide sweep in test_oracle_parity.py)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import load_all

REG = load_all()
SF = "/root/testdata/sf0.001"


def test_funnel_conversion_python_reference(spark):
    events = [
        (r.user_id, r.event_type, int(r.ts.timestamp() * 1_000_000))
        for r in load_table(spark, SF, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    ]
    by_user = defaultdict(list)
    for u, t, ts in events:
        by_user[u].append((ts, t))
    s1 = s2 = s3 = 0
    for evs in by_user.values():
        t1 = min((ts for ts, t in evs if t == "view"), default=None)
        if t1 is None:
            continue
        s1 += 1
        t2 = min((ts for ts, t in evs if t == "click" and ts > t1), default=None)
        if t2 is None:
            continue
        s2 += 1
        if any(t == "purchase" and ts > t2 for ts, t in evs):
            s3 += 1
    rows = {r.stage: r.n_users for r in REG["funnel_conversion"].fn(spark, SF).collect()}
    assert rows == {"view": s1, "click": s2, "purchase": s3}


def test_bigram_novelty_python_reference(spark):
    docs = {
        r.doc_id: r.text.strip().lower().split()
        for r in load_table(spark, SF, "documents").collect()
    }
    shingles = {
        d: {f"{a} {b}" for a, b in zip(t, t[1:])} for d, t in docs.items() if len(t) >= 2
    }
    df = Counter(s for ss in shingles.values() for s in ss)
    got = {
        r.doc_id: (r.n_bigrams, r.n_unique_to_doc)
        for r in REG["bigram_novelty"].fn(spark, SF).collect()
    }
    assert set(got) == {d for d, ss in shingles.items() if ss}
    for d, ss in shingles.items():
        if not ss:
            continue
        uniq = sum(1 for s in ss if df[s] == 1)
        assert got[d] == (len(ss), uniq), d


def test_tfidf_cosine_pairs_python_reference(spark):
    from ingestor_etl_spark.queries.similarity_ops import (
        TFIDF_COS_DEN,
        TFIDF_COS_NUM,
        TFIDF_DF_CAP,
        _IDF_SCALE,
    )

    docs = {
        r.doc_id: r.text.strip().lower().split()
        for r in load_table(spark, SF, "documents").collect()
    }
    bags = {
        d: Counter(" ".join(t[i : i + 3]) for i in range(len(t) - 2))
        for d, t in docs.items()
        if len(t) >= 3
    }
    df = Counter(g for bag in bags.values() for g in bag)
    w = {
        d: {
            g: tf * (_IDF_SCALE // df[g])
            for g, tf in bag.items()
            if df[g] <= TFIDF_DF_CAP
        }
        for d, bag in bags.items()
    }
    nrm = {d: sum(x * x for x in ws.values()) for d, ws in w.items()}
    expected = {}
    ids = sorted(w)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = set(w[a]) & set(w[b])
            if not shared:
                continue
            dot = sum(w[a][g] * w[b][g] for g in shared)
            if (
                TFIDF_COS_DEN * TFIDF_COS_DEN * dot * dot
                >= TFIDF_COS_NUM * TFIDF_COS_NUM * nrm[a] * nrm[b]
            ):
                expected[(a, b)] = (dot, nrm[a], nrm[b])
    got = {
        (r.doc_a, r.doc_b): (r.dot, r.norm_a, r.norm_b)
        for r in REG["tfidf_cosine_pairs"].fn(spark, SF).collect()
    }
    assert got == expected


def test_minhash_jaccard_estimate_is_calibrated(spark):
    """Estimator identities: n_equal ∈ [0,6], est = n_equal/6, the
    exact column equals a Python set-Jaccard recompute, and on this
    templated corpus the aggregate estimate sits at or above the
    aggregate exact value (band-collision selection bias — candidates
    exist BECAUSE bands collided, which is exactly why the operator
    reports both columns side by side)."""
    docs = {
        r.doc_id: r.text.strip().lower().split()
        for r in load_table(spark, SF, "documents").collect()
    }
    shingles = {
        d: {f"{a} {b}" for a, b in zip(t, t[1:])} for d, t in docs.items() if len(t) >= 2
    }
    rows = REG["minhash_jaccard_estimate"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_equal_minhashes <= 6
        assert abs(r.jaccard_est - round(r.n_equal_minhashes / 6, 6)) < 1e-9
        sa, sb = shingles[r.doc_a], shingles[r.doc_b]
        exact = len(sa & sb) / len(sa | sb)
        # Python round() is half-even, the engines round half-up —
        # allow one ulp of the 6th decimal at exact .5 boundaries
        assert abs(r.jaccard_exact - exact) < 5.1e-7
    mean_est = sum(r.jaccard_est for r in rows) / len(rows)
    mean_exact = sum(r.jaccard_exact for r in rows) / len(rows)
    assert 0.0 <= mean_exact <= mean_est <= 1.0


def test_ann_recall_eval_consistent_with_component_queries(spark):
    exact = defaultdict(set)
    for r in REG["ann_cosine_topk"].fn(spark, SF).collect():
        exact[r.query_id].add(r.neighbor_id)
    approx = defaultdict(set)
    for r in REG["ann_lsh_bucketed"].fn(spark, SF).collect():
        approx[r.query_id].add(r.neighbor_id)
    got = {r.query_id: r.n_hits for r in REG["ann_recall_eval"].fn(spark, SF).collect()}
    assert set(got) == set(exact)
    for q, hits in got.items():
        assert hits == len(exact[q] & approx[q]), q


def test_er_quality_eval_consistent_with_resolver(spark):
    truth = {
        r.p_partkey: r.p_name for r in load_table(spark, SF, "part").collect()
    }
    er = REG["entity_resolution"].fn(spark, SF).collect()
    row = REG["er_quality_eval"].fn(spark, SF).collect()[0]
    assert row.n_feed == len(truth)
    assert row.n_matched == len(er)
    n_exact = sum(1 for r in er if r.matched_name == truth[r.dirty_id])
    assert row.n_exact_name == n_exact
    # the blocking-coverage number the advisor asked to surface:
    # most of the feed must resolve (perturbation 1 on ≤3-char last
    # tokens is the only documented blocking loss)
    assert row.coverage > 0.9


def test_schema_profile_sanity(spark):
    rows = {r.column_name: r for r in REG["schema_profile"].fn(spark, SF).collect()}
    assert set(rows) == {
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        "l_shipdate",
    }
    n = load_table(spark, SF, "lineitem").count()
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_nulls <= n
        assert 1 <= r.n_distinct <= n
        if r.column_name in ("l_orderkey", "l_quantity", "l_extendedprice"):
            assert float(r.min_value) <= float(r.max_value)
        else:
            assert r.min_value <= r.max_value or r.n_distinct == 1


def test_dup_group_size_profile_mass_conservation(spark):
    rows = REG["dup_group_size_profile"].fn(spark, SF).collect()
    d = load_table(spark, SF, "documents")
    n_docs = d.count()
    n_groups = d.select("text").distinct().count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.n_groups for r in rows) == n_groups
    assert sum(r.n_removable for r in rows) == n_docs - n_groups


def test_label_balance_resample_balances(spark):
    from ingestor_etl_spark.queries.profile_ops import BALANCE_PER_LABEL

    rows = REG["label_balance_resample"].fn(spark, SF).collect()
    per_label = Counter(r.label for r in rows)
    counts = Counter(
        r.label for r in load_table(spark, SF, "embeddings").collect()
    )
    for lbl, n in counts.items():
        assert per_label[lbl] == min(n, BALANCE_PER_LABEL), lbl
    # deterministic: a second run returns the identical set
    again = {(r.vec_id, r.label) for r in REG["label_balance_resample"].fn(spark, SF).collect()}
    assert again == {(r.vec_id, r.label) for r in rows}


def test_semdedup_drops_are_witnessed(spark):
    rows = REG["semdedup_clusters"].fn(spark, SF).collect()
    by_id = {r.vec_id: r for r in rows}
    n_emb = load_table(spark, SF, "embeddings").count()
    assert len(rows) == n_emb
    for r in rows:
        if r.kept:
            assert r.dup_of is None
        else:
            w = by_id[r.dup_of]
            assert w.cluster_id == r.cluster_id and w.vec_id < r.vec_id
