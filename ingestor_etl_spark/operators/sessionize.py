"""Gap-based sessionization (SURVEY §2.4 J6, §2.6 O1/O2).

Batch analogue of sigshark's transaction assembly
(sigshark.py:426-545): rows are partitioned by entity key, ordered
by event time, and a new session opens after an inactivity gap.
Implemented as lag → boundary flag → running sum, all over a single
window (one shuffle on the partition key). The streaming variant
(session windows / applyInPandasWithState) lives in
``ingestor_etl_spark.streaming``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    partition_cols: Sequence[str],
    ts_col: str,
    gap_us: int,
    order_cols: Sequence[str] = (),
    out_col: str = "session_no",
) -> DataFrame:
    """Add a per-partition 1-based ``session_no`` column."""
    partition_cols = list(partition_cols)
    order = [ts_col, *order_cols]
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = F.when(
        prev.isNull() | ((F.unix_micros(F.col(ts_col)) - prev) > gap_us), 1
    ).otherwise(0)
    running = Window.partitionBy(*partition_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(is_new).over(running))
