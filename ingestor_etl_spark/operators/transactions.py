"""TCAP/Diameter transaction assembly + transaction-level filtering.

SURVEY §2.4 J6 (sigshark's begin/continue/end state machine with
bidirectional tid aliasing, sigshark.py:426-545), J7 (keep whole
transactions when ≥1 member frame matches a predicate — a left-semi
join at transaction granularity, sigshark.py:557-576), §2.6 O1/O2
(transaction-time vs frame-order output, sigshark.py:578-597), O4
(CIDR exclusion, sigshark.py:447-456), §2.5 A3 (disposition stats,
sigshark.py:548-554).

Spark shape: the sequential state machine becomes two joins —
(1) continues that answer a begin contribute a tid-alias row
    (their otid → the begin's otid);
(2) every message resolves its transaction id through the alias
    table (root ids resolve to themselves).
Then one groupBy(txn) assembles members in frame order. The alias
table has one row per transaction — it grows linearly with input,
so it is NOT force-broadcast: the resolution joins shuffle on
(file, tid) and AQE converts them to broadcast at runtime only
when the map actually fits. The final assembly shuffles on the
same transaction key the reference hashed its dicts by."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tcap_transactions(
    messages: DataFrame,
    keep_incomplete: bool = False,
) -> DataFrame:
    """Assemble TCAP transactions from decoded GSM-MAP rows
    (protocols.gsm_map.decode_gsm_map output).

    A transaction's canonical id is the BEGIN's otid. continues from
    the far end carry (their own otid, dtid == a known tid) — their
    otid becomes an alias (sigshark map_tids, sigshark.py:471-522).
    end/abort close via dtid (direct or alias). Without
    ``keep_incomplete``, transactions missing a begin or an
    end/abort are dropped (the --incomplete flag,
    sigshark.py:543-546)."""
    from ingestor_etl_spark.plans.layout import materialize

    # begins/continues/probe-resolution are three consumers of the
    # decoded message stream — evaluate it once
    msgs = materialize(
        messages.select(
            "file", "frames_list", "ts", "tcap_mess_type", "tcap_otid", "tcap_dtid",
            "gsm_op_code", "gsm_component",
        )
    )
    begins = msgs.where("tcap_mess_type = 'begin' AND tcap_otid IS NOT NULL")
    conts = msgs.where("tcap_mess_type = 'continue'")
    roots = begins.select("file", F.col("tcap_otid").alias("tid"), F.col("tcap_otid").alias("txn"))
    aliases = (
        conts.alias("c")
        .join(
            begins.select("file", "tcap_otid").alias("b"),
            (F.col("c.file") == F.col("b.file"))
            & (F.col("c.tcap_dtid") == F.col("b.tcap_otid")),
        )
        .select(
            F.col("c.file").alias("file"),
            F.col("c.tcap_otid").alias("tid"),
            F.col("b.tcap_otid").alias("txn"),
        )
        .where("tid IS NOT NULL")
    )
    alias_map = roots.unionByName(aliases).dropDuplicates(["file", "tid"])

    # each message probes the alias table with its own tid first
    # (otid for begin/continue, dtid for end/abort — already merged
    # as tcap_tid upstream), then with the complementary tid.
    probe1 = F.when(
        F.col("tcap_mess_type").isin("begin", "continue"), F.col("tcap_otid")
    ).otherwise(F.col("tcap_dtid"))
    probe2 = F.when(
        F.col("tcap_mess_type") == "continue", F.col("tcap_dtid")
    ).otherwise(F.col("tcap_otid"))
    with_probes = msgs.withColumn("p1", probe1).withColumn("p2", probe2)
    a1 = alias_map.withColumnRenamed("tid", "p1").withColumnRenamed("txn", "txn1")
    a2 = alias_map.withColumnRenamed("tid", "p2").withColumnRenamed("txn", "txn2")
    resolved = (
        # no forced broadcast: the alias map is unbounded (one row per
        # transaction). Shuffle-join and let AQE pick broadcast when small.
        with_probes.join(a1, ["file", "p1"], "left")
        .join(a2, ["file", "p2"], "left")
        .withColumn("txn", F.coalesce("txn1", "txn2"))
        .where(F.col("txn").isNotNull())
    )
    assembled = (
        resolved.groupBy("file", "txn")
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.sort_array(
                F.collect_list(F.struct("frames_list", "ts", "tcap_mess_type", "gsm_op_code"))
            ).alias("members"),
            F.max(F.when(F.col("tcap_mess_type") == "begin", 1).otherwise(0)).alias("has_begin"),
            F.max(
                F.when(F.col("tcap_mess_type").isin("end", "abort"), 1).otherwise(0)
            ).alias("has_end"),
        )
        .withColumn("n_messages", F.size("members"))
        .withColumn("frames", F.flatten(F.transform("members", lambda m: m["frames_list"])))
    )
    if not keep_incomplete:
        assembled = assembled.where("has_begin = 1 AND has_end = 1")
    return assembled


def diameter_transactions(messages: DataFrame) -> DataFrame:
    """sigshark's Diameter grouping: transactions keyed by
    (hop_by_hop_id, end_to_end_id) with the request flag
    (sigshark.py:524-539)."""
    return (
        messages.groupBy("file", "hop_by_hop_id", "end_to_end_id")
        .agg(
            F.min("ts").alias("start_ts"),
            F.sort_array(F.collect_list(F.struct("ts", "request", "frames_list"))).alias("members"),
            F.max(F.when(F.col("request"), 1).otherwise(0)).alias("has_request"),
            F.max(F.when(~F.col("request"), 1).otherwise(0)).alias("has_answer"),
        )
        .withColumn("frames", F.flatten(F.transform("members", lambda m: m["frames_list"])))
    )


def filter_transactions(transactions: DataFrame, matching_frames: DataFrame) -> DataFrame:
    """J7: keep transactions having ≥1 member frame in
    ``matching_frames`` (columns: file, frame_no) — exploded
    left-semi join, then the already-assembled row passes whole."""
    exploded = transactions.select(
        "file", "txn", F.explode("frames").alias("frame_no")
    )
    hits = exploded.join(matching_frames, ["file", "frame_no"], "left_semi").select(
        "file", "txn"
    ).dropDuplicates()
    return transactions.join(hits, ["file", "txn"], "left_semi")


def order_by_transaction(transactions: DataFrame) -> DataFrame:
    """O1: transactions by start time, frames in arrival order
    within each (sigshark.py:578-593)."""
    return transactions.orderBy("start_ts").select(
        "file", "txn", "start_ts", F.posexplode("frames").alias("pos", "frame_no")
    )


def order_by_frame(transactions: DataFrame) -> DataFrame:
    """O2: global frame-order restore (sigshark.py:595-597)."""
    return (
        transactions.select("file", F.explode("frames").alias("frame_no"))
        .dropDuplicates()
        .orderBy("frame_no")
    )


def ip_to_long(col: Column) -> Column:
    """Dotted IPv4 → 32-bit int, native (no UDF)."""
    parts = F.split(col, r"\.")
    return (
        parts.getItem(0).cast("long") * 16777216
        + parts.getItem(1).cast("long") * 65536
        + parts.getItem(2).cast("long") * 256
        + parts.getItem(3).cast("long")
    )


def exclude_cidrs(df: DataFrame, cidrs: list[str], ip_cols: list[str]) -> DataFrame:
    """O4: drop rows whose src/dst lies in any excluded subnet
    (sigshark.py:447-456) — pure bit arithmetic, codegen-friendly."""
    if not cidrs:
        return df
    conds = []
    for cidr in cidrs:
        base, _, bits = cidr.partition("/")
        bits = int(bits or 32)
        mask = ((1 << 32) - 1) ^ ((1 << (32 - bits)) - 1)
        base_long = sum(
            int(o) << (8 * (3 - i)) for i, o in enumerate(base.split("."))
        ) & mask
        for c in ip_cols:
            conds.append(ip_to_long(F.col(c)).bitwiseAND(F.lit(mask)) == F.lit(base_long))
    excluded = conds[0]
    for c in conds[1:]:
        excluded = excluded | c
    return df.where(~F.coalesce(excluded, F.lit(False)))


def transaction_stats(messages: DataFrame, transactions: DataFrame) -> DataFrame:
    """A3: packets read / saved-transaction counts by disposition
    (sigshark.py:548-554)."""
    total = messages.groupBy("file").agg(F.count(F.lit(1)).alias("messages_read"))
    tas = transactions.groupBy("file").agg(
        F.count(F.lit(1)).alias("transactions"),
        F.sum("n_messages").alias("messages_in_transactions"),
    )
    return total.join(tas, "file", "left")
