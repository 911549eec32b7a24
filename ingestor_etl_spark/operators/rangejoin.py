"""Scalable interval (range) join.

``point.ts BETWEEN window.start AND window.end`` has no equi key, so
Spark's only native plan is BroadcastNestedLoop — O(|L|·|R|), dead at
scale unless one side is tiny. The scalable formulation *creates*
the equi key: quantize time into fixed-width bins, explode each
window into every bin it overlaps, equi-join points to windows on
the bin, then re-check the exact range as a residual filter.

Cost: |R| × (span/bin_width + 1) exploded rows and one hash shuffle
on a uniformly distributed bin key — the standard time-bin trick
(the same shape Structured Streaming uses internally for stream-
stream interval joins). Pick ``bin_width`` ≈ the typical window
span: too small explodes the window side, too large packs many
windows per bin and inflates the residual filter's input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    windows: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_width_s: int = 1800,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to every window whose half-open interval
    ``[start, end)`` contains ``ts``. Timestamp columns throughout;
    bins computed in whole seconds of epoch time."""
    bw = F.lit(int(bin_width_s))
    p = points.withColumn("__bin", (F.unix_timestamp(F.col(ts_col)) / bw).cast("long"))
    w = windows.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bw).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / bw).cast("long"),
            )
        ),
    )
    joined = p.join(w, "__bin", how).where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__bin")
