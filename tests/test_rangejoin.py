"""Interval join (operators/rangejoin.py): bin-edge semantics."""

from __future__ import annotations

import datetime as dt

from ingestor_etl_spark.operators.rangejoin import interval_join


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second)


def test_half_open_and_bin_spanning(spark):
    points = spark.createDataFrame(
        [
            (1, _ts(0)),     # == window start → included
            (2, _ts(44)),    # inside, in a later bin than the start
            (3, _ts(45)),    # == window end → excluded (half-open)
            (4, _ts(46)),    # outside
        ],
        ["pid", "ts"],
    )
    # one 45-minute window spanning multiple 10-minute bins
    windows = spark.createDataFrame(
        [(100, _ts(0), _ts(45))], ["win_id", "win_start", "win_end"]
    )
    got = sorted(
        (r.pid, r.win_id)
        for r in interval_join(
            points, windows, "ts", "win_start", "win_end", bin_width_s=600
        ).collect()
    )
    assert got == [(1, 100), (2, 100)]


def test_overlapping_windows_multiple_matches(spark):
    points = spark.createDataFrame([(1, _ts(15))], ["pid", "ts"])
    windows = spark.createDataFrame(
        [(1, _ts(0), _ts(30)), (2, _ts(10), _ts(20)), (3, _ts(16), _ts(40))],
        ["win_id", "win_start", "win_end"],
    )
    got = sorted(
        r.win_id
        for r in interval_join(
            points, windows, "ts", "win_start", "win_end", bin_width_s=60
        ).collect()
    )
    assert got == [1, 2]


def test_empty_windows(spark):
    import pyspark.sql.types as T

    points = spark.createDataFrame([(1, _ts(0))], ["pid", "ts"])
    windows = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("win_id", T.LongType()),
                T.StructField("win_start", T.TimestampType()),
                T.StructField("win_end", T.TimestampType()),
            ]
        ),
    )
    assert (
        interval_join(points, windows, "ts", "win_start", "win_end").count() == 0
    )
