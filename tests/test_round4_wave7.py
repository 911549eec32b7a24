"""Round-4 wave-7 operator semantics: Bloom-filter join pruning,
frequent session paths, cross-source quantile normalization."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


# ----------------------------------------------------- bloom_join_filter
def test_bloom_filter_invariants_and_python_parity(spark):
    from ingestor_etl_spark.queries.relational_wide import (
        BLOOM_BITS,
        BLOOM_BPW,
    )

    row = REGISTRY["bloom_join_filter"].fn(spark, SF).collect()[0]
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).collect()
    urgent = {o.o_orderkey for o in orders if o.o_orderpriority == "1-URGENT"}
    li = load_table(spark, SF, "lineitem").select("l_orderkey").collect()

    def pos(salt: str, k: int) -> int:
        return int(
            hashlib.md5(f"{salt}{k}".encode()).hexdigest()[:8], 16
        ) % BLOOM_BITS

    words: dict[int, int] = {}
    for k in urgent:
        for p in (pos("a", k), pos("b", k)):
            w, b = p // BLOOM_BPW, p % BLOOM_BPW
            words[w] = words.get(w, 0) | (1 << b)

    def member(k: int) -> bool:
        for salt in ("a", "b"):
            p = pos(salt, k)
            if not words.get(p // BLOOM_BPW, 0) & (1 << (p % BLOOM_BPW)):
                return False
        return True

    n_pass = sum(member(r.l_orderkey) for r in li)
    n_true = sum(r.l_orderkey in urgent for r in li)
    assert row.n_keys == len(urgent)
    assert row.bits_set == sum(bin(w).count("1") for w in words.values())
    assert row.n_lineitem == len(li)
    assert row.n_pass_bloom == n_pass
    assert row.n_true_match == n_true
    # no false negatives, ever
    assert row.n_pass_bloom >= row.n_true_match
    # the filter must actually prune at this sf
    assert row.n_pass_bloom < row.n_lineitem


# -------------------------------------------------------- frequent_paths
def test_frequent_paths_counts_match_transcript_census(spark):
    from ingestor_etl_spark.queries.events_ops import FREQUENT_PATHS_TOPK

    rows = REGISTRY["frequent_paths"].fn(spark, SF).collect()
    assert len(rows) == FREQUENT_PATHS_TOPK
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    key = [(-r.n_sessions, r.transcript) for r in rows]
    assert key == sorted(key)
    # spot-check the top path's count against session_transcripts
    # (restricted to its user range) plus a full python recount
    from ingestor_etl_spark.queries.events_ops import _SESSION_GAP_US

    e = (
        load_table(spark, SF, "events")
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "event_type")
        .collect()
    )
    by_user = {}
    for r in e:
        by_user.setdefault(r.user_id, []).append(r)
    census = {}
    for user, rs in by_user.items():
        rs.sort(key=lambda r: (r.ts_us, r.event_id))
        prev, cur = None, []
        sessions = []
        for r in rs:
            if prev is not None and r.ts_us - prev > _SESSION_GAP_US:
                sessions.append(cur)
                cur = []
            cur.append(r.event_type)
            prev = r.ts_us
        sessions.append(cur)
        for sess in sessions:
            t = ">".join(sess)
            census[t] = census.get(t, 0) + 1
    expect = sorted(census.items(), key=lambda kv: (-kv[1], kv[0]))[
        :FREQUENT_PATHS_TOPK
    ]
    assert [(r.transcript, r.n_sessions) for r in rows] == expect


# --------------------------------------------------- quantile_normalize
def test_quantile_normalize_matches_python_order_stats(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    all_scores = sorted(d.n_chars for d in docs)
    n_total = len(all_scores)
    per_src = {}
    for d in docs:
        per_src.setdefault(d.source, []).append(d.n_chars)
    for s in per_src:
        per_src[s].sort()

    def qnorm(source: str, score: int) -> int:
        vals = per_src[source]
        n_src = len(vals)
        cum_lt = sum(1 for v in vals if v < score)
        if n_src > 1:
            k = max(1, math.ceil(cum_lt * n_total / (n_src - 1)))
        else:
            k = 1
        return all_scores[min(k, n_total) - 1]

    rows = REGISTRY["quantile_normalize"].fn(spark, SF).collect()
    assert len(rows) == len(docs)
    for r in rows:
        assert r.qnorm_score == qnorm(r.source, r.raw_score), (
            r.source,
            r.raw_score,
        )
    # normalization must actually move some scores
    assert any(r.qnorm_score != r.raw_score for r in rows)
