"""Close the loop for the registered streaming-parity queries
(queries/streaming_parity.py): the ACTUAL Structured Streaming runs
(readStream → availableNow) must agree with the batch snapshots the
driver grades against DuckDB."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from ingestor_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"


def _await(q, secs=180):
    q.awaitTermination(secs)
    assert not q.isActive


@pytest.fixture(scope="module")
def registry():
    return load_all()


@pytest.mark.slow
def test_stream_neardup_run_matches_parity_families(spark, tmp_path, registry):
    """The availableNow run of stream_neardup_dedup suppresses each
    minhash-signature family to exactly ONE member with the same
    signature strings the registered query computes. (Which member
    survives inside a single trigger is engine-order; the registered
    snapshot pins the doc_id-ordered arrival decision min(doc_id).)"""
    from ingestor_etl_spark.streaming.pipeline import stream_neardup_dedup

    parity = registry["stream_neardup_parity"].fn(spark, SF).toPandas()
    fam = {r.minhash_sig: r.family_size for r in parity.itertuples()}

    src = str(tmp_path / "docs")
    (
        spark.read.parquet(f"{SF}/documents.parquet")
        .selectExpr(
            "doc_id",
            "timestamp_micros(1704067200000000 + doc_id * 1000000) AS ts",
            "text",
        )
        .write.parquet(src)
    )
    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, text string"
    ).parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        stream_neardup_dedup(stream, watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = spark.read.parquet(out_dir).toPandas()
    # Empty-shingle docs form one all-NULL-signature family in the
    # stream; the registered query scopes to shingled docs — drop
    # that family before comparing.
    got = got[got.minhash_sig.str.len() > 5]
    assert sorted(got.minhash_sig) == sorted(fam)  # one survivor per family
    # the survivor must BE a member: recompute sigs batch-side
    sig_of = {
        r.doc_id: r.minhash_sig
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .selectExpr("doc_id", "text")
        .join(
            registry["minhash_signatures"].fn(spark, SF).selectExpr(
                "doc_id",
                "concat_ws(':', cast(mh0 as string), cast(mh1 as string), "
                "cast(mh2 as string), cast(mh3 as string), cast(mh4 as string), "
                "cast(mh5 as string)) AS minhash_sig",
            ),
            "doc_id",
        )
        .toPandas()
        .itertuples()
    }
    for r in got.itertuples():
        assert sig_of[r.doc_id] == r.minhash_sig


@pytest.mark.slow
def test_stream_interval_join_run_matches_parity(spark, tmp_path, registry):
    """Stream-stream interval join (inner, eager emission) over the
    events micro-batch returns EXACTLY the registered snapshot's
    rows."""
    from ingestor_etl_spark.streaming.pipeline import stream_interval_join

    parity = registry["stream_interval_join_parity"].fn(spark, SF).toPandas()

    from ingestor_etl_spark.catalog import load_table

    e = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    ldir, rdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    e.where("event_type = 'view'").write.parquet(ldir)
    e.where("event_type = 'click'").write.parquet(rdir)
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    ls = spark.readStream.schema(schema).parquet(ldir)
    rs = spark.readStream.schema(schema).parquet(rdir)
    out_dir, ckpt = str(tmp_path / "ij_out"), str(tmp_path / "ij_ck")
    q = (
        stream_interval_join(ls, rs, key="user_id", lookahead="10 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    files = glob.glob(out_dir + "/*.parquet")
    got = (
        spark.read.parquet(out_dir)
        .select(
            "user_id",
            F.unix_micros("left_ts").alias("left_ts_us"),
            F.unix_micros("right_ts").alias("right_ts_us"),
            "left_event_id",
            "right_event_id",
        )
        .toPandas()
        if files
        else parity.iloc[0:0]
    )
    key = ["left_event_id", "right_event_id"]
    got = got.sort_values(key).reset_index(drop=True)[parity.columns.tolist()]
    exp = parity.sort_values(key).reset_index(drop=True)
    assert got.equals(exp)


@pytest.mark.slow
def test_stream_sessionize_run_matches_parity(spark, tmp_path, registry):
    """availableNow session-window run (append mode) equals the
    registered snapshot once a far-future sentinel event closes every
    real session (watermark = 2×gap behind max event time)."""
    from ingestor_etl_spark.streaming.pipeline import stream_sessionize

    parity = registry["stream_session_window_parity"].fn(spark, SF).toPandas()

    from ingestor_etl_spark.catalog import load_table

    e = load_table(spark, SF, "events").select("user_id", "ts")
    # sentinel 1 day past the corpus max — far beyond 2×gap, closes
    # every real session before the final no-data flush batch
    max_us = e.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(-1, max_us + 86_400_000_000)], "user_id long, us long"
    ).select("user_id", F.timestamp_micros("us").alias("ts"))
    src = str(tmp_path / "sess_events")
    e.unionByName(sentinel).write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    out_dir, ckpt = str(tmp_path / "s_out"), str(tmp_path / "s_ck")
    q = (
        stream_sessionize(stream, gap_seconds=1800)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = (
        spark.read.parquet(out_dir)
        .where("user_id >= 0")
        .select(
            "user_id",
            F.unix_micros("session.start").alias("session_start_us"),
            F.unix_micros("session.end").alias("session_end_us"),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.unix_micros("first_ts").alias("first_ts_us"),
            F.unix_micros("last_ts").alias("last_ts_us"),
        )
        .toPandas()
    )
    key = ["user_id", "session_start_us"]
    got = got.sort_values(key).reset_index(drop=True)[parity.columns.tolist()]
    exp = parity.sort_values(key).reset_index(drop=True)
    assert got.equals(exp)


@pytest.mark.slow
def test_stream_windowed_counts_run_matches_parity(spark, tmp_path, registry):
    """availableNow tumbling-window run (append mode) equals the
    registered snapshot once a far-future sentinel event advances the
    watermark past every real window."""
    from ingestor_etl_spark.catalog import load_table
    from ingestor_etl_spark.streaming.pipeline import stream_windowed_counts

    parity = registry["stream_windowed_counts_parity"].fn(spark, SF).toPandas()

    e = load_table(spark, SF, "events").select("event_type", "ts")
    max_us = e.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    sentinel = spark.createDataFrame(
        [("__sentinel__", max_us + 86_400_000_000)], "event_type string, us long"
    ).select("event_type", F.timestamp_micros("us").alias("ts"))
    src = str(tmp_path / "wc_events")
    e.unionByName(sentinel).write.parquet(src)
    stream = spark.readStream.schema("event_type string, ts timestamp").parquet(src)
    out_dir, ckpt = str(tmp_path / "wc_out"), str(tmp_path / "wc_ck")
    q = (
        stream_windowed_counts(
            stream, window="5 minutes", watermark="1 hour", key_cols=["event_type"]
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = (
        spark.read.parquet(out_dir)
        .where("event_type <> '__sentinel__'")
        .select(
            "event_type",
            F.unix_micros("win_start").alias("win_start_us"),
            F.unix_micros("win_end").alias("win_end_us"),
            F.col("n_events").cast("bigint").alias("n_events"),
        )
        .toPandas()
    )
    key = ["event_type", "win_start_us"]
    got = got.sort_values(key).reset_index(drop=True)[parity.columns.tolist()]
    exp = parity.sort_values(key).reset_index(drop=True)
    assert got.equals(exp)
