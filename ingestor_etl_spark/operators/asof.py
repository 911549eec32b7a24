"""As-of (backward) join — a custom operator Spark lacks natively.

For each left row, attach the latest right row of the same key with
``right_ts <= left_ts`` (optionally within a tolerance). The classic
implementations are a range join (quadratic blowup) or a per-key
merge (sequential); the Spark-first shape used here is the
union-and-carry pattern:

    tag sides → unionByName → one window per key ordered by
    (ts, side) → last(right_value, ignorenulls) carried forward
    → keep left rows

One shuffle on the key, linear work, no range explosion — the same
plan holds at 100 TB because the window never materializes pairs.
Right rows must be unique per (key, ts); pre-aggregate if not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts_col: str,
    carry_cols: Sequence[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join.

    ``left`` and ``right`` must both expose ``by`` + ``ts_col``
    (numeric or timestamp); ``carry_cols`` exist only on ``right``
    and are attached to each left row from the latest right row at
    or before its ``ts_col``. ``tolerance_us`` (same unit as
    ts_col) nulls carried values older than the window."""
    by = list(by)
    carry_cols = list(carry_cols)
    l_tag = left.withColumn(_SIDE, F.lit(1))
    for c in carry_cols:
        l_tag = l_tag.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    l_tag = l_tag.withColumn("__asof_rts", F.lit(None).cast(right.schema[ts_col].dataType))
    r_tag = right.withColumn(_SIDE, F.lit(0)).withColumn("__asof_rts", F.col(ts_col))
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = l_tag.columns
    unioned = l_tag.select(*cols).unionByName(r_tag.select(*cols))
    # right rows sort before left rows at equal ts → "<=" semantics
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_col, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for c in carry_cols + ["__asof_rts"]:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = out.where(F.col(_SIDE) == 1).drop(_SIDE)
    if tolerance_us is not None:
        from pyspark.sql.types import TimestampType

        if isinstance(left.schema[ts_col].dataType, TimestampType):
            # timestamp - timestamp yields an interval, which can't be
            # compared to a numeric literal — measure the age in
            # microseconds explicitly.
            age = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__asof_rts"))
        else:
            age = F.col(ts_col) - F.col("__asof_rts")
        stale = F.col("__asof_rts").isNull() | (age > tolerance_us)
        for c in carry_cols:
            out = out.withColumn(c, F.when(~stale, F.col(c)))
        out = out.withColumn("__asof_rts", F.when(~stale, F.col("__asof_rts")))
    return out.withColumnRenamed("__asof_rts", "asof_matched_ts")
