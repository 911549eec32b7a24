"""Group-wise identifier propagation (SURVEY §2.4 J2, J3).

The reference walks each transaction group and copies the first
non-empty msisdn/imsi onto every member row (gtp_ingestor.py:42-71;
smpp_ingestor.py:379-408). Spark-first: aggregate one candidate per
group (min — deterministic under duplicates), then re-join. The
aggregated side is tiny relative to the fact side, so Spark
broadcast-joins it back automatically; only one shuffle of the fact
table on the group key happens, and AQE converts the enrich join to
broadcast when the group table fits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def propagate_group_value(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str,
    present_when: Column | None = None,
) -> DataFrame:
    """Attach ``out_col`` = the group's canonical value of
    ``value_col`` (min over rows where ``present_when``) to every
    row of the group."""
    group_cols = list(group_cols)
    candidate = F.col(value_col)
    if present_when is not None:
        candidate = F.when(present_when, candidate)
    # keep the value column's own type — casting to double would mangle
    # string identifiers (leading zeros, non-numeric → null); callers
    # that need a specific type cast the output column themselves.
    groups = df.groupBy(*group_cols).agg(F.min(candidate).alias(out_col))
    return df.join(groups, on=group_cols, how="left")
