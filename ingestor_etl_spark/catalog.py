"""Table catalog over the driver-provided parquet directories.

TESTDATA.md: tables ``region nation customer supplier part orders
lineitem events documents embeddings`` live as one parquet file each
under ``/root/testdata/sf{0.001,0.01,0.1}``. At cluster scale the
same loader points at partitioned parquet/Delta directories; nothing
here assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor.
BROADCAST_TABLES = {"region", "nation"}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Runtime-set so sessions built outside session.get_spark (e.g.
    # the driver's own) can also read TIMESTAMP(NANOS) parquet.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    # The physical flavor of events.ts has varied across testdata
    # generations: TIMESTAMP(NANOS) (arrives as a long of ns under
    # nanosAsLong), TIMESTAMP(MICROS) with isAdjustedToUTC=false
    # (arrives as TIMESTAMP_NTZ), or UTC-adjusted micros (arrives as
    # TimestampType). Normalize all three to TimestampType whose
    # instant equals the stored wall clock read as UTC — exactly the
    # value DuckDB's naive read + epoch_us sees — so every downstream
    # unix_micros/date_trunc (UTC session) matches the oracle.
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        if field.dataType.simpleString() == "bigint":
            # ns → µs with integral div; double division would lose
            # precision at 1e18 ns.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(field.dataType, TimestampNTZType):
            # Wall-clock µs since the NTZ epoch is pure calendar
            # arithmetic — independent of the session timezone, unlike
            # a cast, so the driver's session settings can't skew it.
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.timestamp_diff(
                        "MICROSECOND",
                        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
                        F.col("ts"),
                    )
                ),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every catalog table lazily; nothing is scanned until an
    action runs, so loading all ten is free."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every catalog table as a temp view so users can query
    the engine with raw ``spark.sql(...)`` — same table names the
    DuckDB oracle layer registers, so one ANSI-SQL string can run
    verbatim on both engines."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
