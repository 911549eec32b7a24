"""Golden tests: TCAP transaction assembly (J6/J7/O1-O4/A3)."""

from __future__ import annotations

import pytest

from ingestor_etl_spark.operators.transactions import (
    diameter_transactions,
    exclude_cidrs,
    filter_transactions,
    order_by_frame,
    order_by_transaction,
    tcap_transactions,
    transaction_stats,
)


@pytest.fixture(scope="module")
def tcap_msgs(spark):
    """Txn A: begin(otid=1) ← continue(otid=9, dtid=1) ← end(dtid=9).
    Txn B: begin(otid=2), never answered.
    Stray: end(dtid=77) with no begin."""
    rows = [
        ("f", [1], "2024-01-01 00:00:00", "begin", 1, None, 45, 1),
        ("f", [2], "2024-01-01 00:00:01", "continue", 9, 1, None, 2),
        ("f", [3], "2024-01-01 00:00:02", "end", None, 9, None, 2),
        ("f", [4], "2024-01-01 00:00:03", "begin", 2, None, 2, 1),
        ("f", [5], "2024-01-01 00:00:04", "end", None, 77, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "file string, frames_list array<long>, ts string, tcap_mess_type string, "
        "tcap_otid long, tcap_dtid long, gsm_op_code int, gsm_component int",
    )
    return df.withColumn("ts", df.ts.cast("timestamp"))


def test_tcap_transactions_alias_resolution(spark, tcap_msgs):
    tas = tcap_transactions(tcap_msgs).toPandas()
    assert len(tas) == 1  # only txn A is complete
    ta = tas.iloc[0]
    assert ta.txn == 1
    assert ta.n_messages == 3
    assert list(ta.frames) == [1, 2, 3]
    assert ta.has_begin == 1 and ta.has_end == 1


def test_tcap_alias_map_not_force_broadcast(spark, tcap_msgs):
    """The tid alias map has one row per transaction — it grows
    linearly with input, so it must never be force-BROADCAST-HINTED
    (at 100 TB that build would OOM). Spark remains free to pick
    broadcast from real statistics when the map is actually small —
    the assertion is that no hint FORCES it: the analyzed plan must
    contain no ResolvedHint/broadcast node."""
    plan = (
        tcap_transactions(tcap_msgs)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "ResolvedHint" not in plan and "UnresolvedHint" not in plan, plan


def test_tcap_transactions_keep_incomplete(spark, tcap_msgs):
    tas = tcap_transactions(tcap_msgs, keep_incomplete=True).toPandas()
    assert sorted(tas.txn) == [1, 2]  # stray end still unresolvable


@pytest.mark.slow
def test_filter_and_orderings(spark, tcap_msgs):
    tas = tcap_transactions(tcap_msgs, keep_incomplete=True)
    match = spark.createDataFrame([("f", 2)], "file string, frame_no long")
    kept = filter_transactions(tas, match).toPandas()
    assert list(kept.txn) == [1]  # J7: frame 2 belongs to txn 1
    by_ta = order_by_transaction(tas).toPandas()
    assert list(by_ta.frame_no) == [1, 2, 3, 4]  # O1
    by_frame = order_by_frame(tas).toPandas()
    assert list(by_frame.frame_no) == [1, 2, 3, 4]  # O2
    stats = transaction_stats(tcap_msgs, tas).toPandas()
    assert stats.iloc[0].messages_read == 5 and stats.iloc[0].transactions == 2


def test_exclude_cidrs(spark):
    df = spark.createDataFrame(
        [("10.1.2.3", "8.8.8.8"), ("192.168.5.1", "10.0.0.1"), ("172.16.0.9", "1.1.1.1")],
        "src_ip string, dst_ip string",
    )
    out = exclude_cidrs(df, ["10.0.0.0/8", "192.168.0.0/16"], ["src_ip", "dst_ip"]).toPandas()
    assert list(out.src_ip) == ["172.16.0.9"]  # O4


def test_diameter_transactions(spark):
    rows = [
        ("f", 100, 200, "2024-01-01 00:00:00", True, [10]),
        ("f", 100, 200, "2024-01-01 00:00:01", False, [11]),
        ("f", 300, 400, "2024-01-01 00:00:02", True, [12]),
    ]
    df = spark.createDataFrame(
        rows,
        "file string, hop_by_hop_id long, end_to_end_id long, ts string, "
        "request boolean, frames_list array<long>",
    )
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    tas = diameter_transactions(df).toPandas().sort_values("hop_by_hop_id")
    assert len(tas) == 2
    full = tas.iloc[0]
    assert full.has_request == 1 and full.has_answer == 1
    assert list(full.frames) == [10, 11]


def test_asof_tolerance(spark):
    from ingestor_etl_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([("u", 100, 1), ("u", 500, 2)], "k string, ts long, lid int")
    right = spark.createDataFrame([("u", 90, "recent")], "k string, ts long, tag string")
    out = asof_join_backward(
        left, right, by=["k"], ts_col="ts", carry_cols=["tag"], tolerance_us=50
    ).toPandas().sort_values("lid")
    assert out.iloc[0].tag == "recent"  # 100-90 = 10 <= 50
    assert out.iloc[1].tag is None  # 500-90 = 410 > 50 → nulled
