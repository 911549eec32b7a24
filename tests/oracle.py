"""Driver-emulating oracle comparison: run a registered Spark query
and its DuckDB oracle on the same parquet tables, then compare
row count, column set, and values (order-insensitive, exact).

This intentionally compares EXACT values (doubles bit-for-bit):
queries are designed so aggregates are decimal-exact before their
final cast to double, which makes Spark and DuckDB agree bitwise.
If this harness passes, the driver's value-hash comparison passes.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from ingestor_etl_spark.catalog import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[ns]")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif s.dtype == object:
            # DuckDB HUGEINT / decimal results arrive as objects;
            # coerce numeric-looking columns so dtypes align.
            try:
                num = pd.to_numeric(s)
                if pd.api.types.is_integer_dtype(num) or (num.dropna() % 1 == 0).all():
                    df[c] = num.astype("Int64")
                else:
                    df[c] = num.astype("float64")
            except (ValueError, TypeError):
                pass
    sort_cols = list(df.columns)
    if sort_cols:
        df = df.sort_values(by=sort_cols, na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = np.array_equal(av.to_numpy(), bv.to_numpy(), equal_nan=True)
        else:
            ok = av.equals(bv)
        if not ok:
            diffs = []
            for i in range(len(av)):
                x, y = av.iloc[i], bv.iloc[i]
                same = (
                    (pd.isna(x) and pd.isna(y))
                    or (x == y)
                    or (
                        isinstance(x, float)
                        and isinstance(y, float)
                        and math.isclose(x, y, rel_tol=0, abs_tol=0)
                    )
                )
                if not same:
                    diffs.append(f"row {i}: spark={x!r} oracle={y!r}")
                if len(diffs) >= 3:
                    break
            problems.append(f"{name}: column '{c}' differs; first diffs: {diffs}")
    return problems
