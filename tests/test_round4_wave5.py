"""Round-4 wave-5 operator semantics: session transcript assembly,
incremental (batch-vs-index) dedup, int8 embedding quantization."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


# -------------------------------------------------- session_transcripts
def test_transcripts_match_python_session_assembly(spark):
    from ingestor_etl_spark.queries.events_ops import _SESSION_GAP_US

    events = (
        load_table(spark, SF, "events")
        .where(F.col("user_id") < 40)
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "event_type")
        .collect()
    )
    by_user = {}
    for e in events:
        by_user.setdefault(e.user_id, []).append(e)
    expect = {}
    for user, es in by_user.items():
        es.sort(key=lambda e: (e.ts_us, e.event_id))
        session = 0
        prev = None
        cur = []
        for e in es:
            if prev is None or e.ts_us - prev > _SESSION_GAP_US:
                if cur:
                    expect[(user, session)] = cur
                session += 1
                cur = []
            cur.append(e)
            prev = e.ts_us
        expect[(user, session)] = cur
    rows = REGISTRY["session_transcripts"].fn(spark, SF).collect()
    got = {(r.user_id, r.session_no): r for r in rows}
    assert set(got) == set(expect)
    for key, es in expect.items():
        r = got[key]
        assert r.n_events == len(es)
        assert r.transcript == ">".join(e.event_type for e in es)
        assert r.span_us == es[-1].ts_us - es[0].ts_us


# ---------------------------------------------------- incremental_dedup
def test_incremental_dedup_verdicts_match_python(spark):
    from ingestor_etl_spark.queries.dedup_ops import INCR_BATCH_MOD

    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    fp = {
        d.doc_id: hashlib.md5(d.text.strip().lower().encode()).hexdigest()
        for d in docs
    }
    corpus_fps = {
        f for i, f in fp.items() if i % INCR_BATCH_MOD != 0
    }
    batch = sorted(i for i in fp if i % INCR_BATCH_MOD == 0)
    firsts = {}
    for i in batch:
        firsts.setdefault(fp[i], i)
    expect = {}
    for i in batch:
        if fp[i] in corpus_fps:
            expect[i] = "dup_of_corpus"
        elif firsts[fp[i]] == i:
            expect[i] = "kept"
        else:
            expect[i] = "dup_in_batch"
    rows = REGISTRY["incremental_dedup"].fn(spark, SF).collect()
    assert {r.doc_id: r.verdict for r in rows} == expect
    assert {r.doc_id for r in rows} == set(batch)
    # a batch re-ingesting an existing corpus must flag dups here
    assert "kept" in expect.values()


# ---------------------------------------------- embedding_quantize_int8
def test_quantization_matches_numpy_and_bounds(spark):
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF, "embeddings").collect()
    }
    mat = np.stack([vecs[i] for i in sorted(vecs)])
    mn, mx = mat.min(axis=0), mat.max(axis=0)
    rows = REGISTRY["embedding_quantize_int8"].fn(spark, SF).collect()
    assert len(rows) == len(vecs)
    for r in rows:
        v = vecs[r.vec_id]
        q = np.round(255 * (v - mn) / (mx - mn)).astype(np.int64)
        assert r.q_min == q.min() and r.q_max == q.max()
        assert r.q_sum == q.sum()
        assert 0 <= r.q_min and r.q_max <= 255
        recon = mn + q * (mx - mn) / 255
        mae = np.abs(v - recon).mean()
        # engine value is the nano-unit-rounded fold; numpy is the
        # unrounded float mean — they agree to ~1e-6
        assert abs(mae - r.recon_mae) < 2e-6, r.vec_id
        # int8 quantization error is bounded by half a step per dim
        assert r.recon_mae <= (mx - mn).max() / 255
