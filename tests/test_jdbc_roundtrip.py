"""S8/S9 JDBC round-trip against an embedded Derby database.

The reference's sink is SQLAlchemy bulk_save_objects into Postgres,
1,000 rows per commit (diameter.py:458-467). No Postgres exists in
the sandbox, but Apache Derby (embedded, in-JVM) ships inside the
Spark distribution — so the JDBC writer path (batchsize, storage
reshaping, append-mode id discipline) is exercised end-to-end
against a real database engine, not just unit-tested helpers.

Auto-skips if the Derby driver is absent (e.g. a stripped Spark
build) — the helpers' unit tests in test_sinks.py still run there.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ingestor_etl_spark.sinks.jdbc import (
    frames_list_as_string,
    with_epoch_columns,
    write_jdbc,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(spark, tmp_path) -> str:
    jvm = spark._jvm
    # keep derby.log out of the repo cwd
    jvm.java.lang.System.setProperty("derby.system.home", str(tmp_path))
    try:
        jvm.java.lang.Class.forName(DERBY_DRIVER)
    except Exception:
        pytest.skip("Derby embedded driver not on the Spark classpath")
    return f"jdbc:derby:{tmp_path}/testdb;create=true"


def _decoded_fixture(spark, n=2500, id_offset=0):
    """Decoded-transaction-shaped rows: pre-generated ids (S9),
    frames_list array, microsecond timestamp."""
    return (
        spark.range(id_offset, id_offset + n)
        .select(
            F.col("id"),
            F.concat(F.lit("52155500"), (F.col("id") % 100).cast("string")).alias(
                "msisdn"
            ),
            F.array(F.col("id") * 2, F.col("id") * 2 + 1).alias("frames_list"),
            F.timestamp_micros(
                F.lit(1_704_100_000_000_000) + F.col("id") * 1_000_003
            ).alias("ts"),
            (F.col("id") % 7 == 0).cast("int").alias("result_code"),
        )
    )


def _storage_shape(df):
    return (
        with_epoch_columns(frames_list_as_string(df), "ts")
        .drop("ts")  # the reference stores the epoch pair, not a TS
    )


def test_jdbc_bulk_roundtrip_with_batchsize(spark, tmp_path):
    url = _derby_url(spark, tmp_path)
    src = _storage_shape(_decoded_fixture(spark, n=2500))
    # reference chunk size 1000 → 3 batches per partition here
    write_jdbc(
        src,
        url,
        "transactions",
        mode="overwrite",
        batchsize=1000,
        num_partitions=2,
        driver=DERBY_DRIVER,
    )
    back = (
        spark.read.format("jdbc")
        .options(url=url, dbtable="transactions", driver=DERBY_DRIVER)
        .load()
    )
    assert back.count() == 2500
    # full value fidelity through the DB (join on the pre-generated id)
    diff = (
        back.alias("b")
        .join(src.alias("s"), F.col("b.id") == F.col("s.id"), "full_outer")
        .where(
            F.col("b.id").isNull()
            | F.col("s.id").isNull()
            | (F.col("b.msisdn") != F.col("s.msisdn"))
            | (F.col("b.frames_list") != F.col("s.frames_list"))
            | (F.col("b.time_epoch") != F.col("s.time_epoch"))
            | (F.col("b.useconds_epoch") != F.col("s.useconds_epoch"))
            | (F.col("b.result_code") != F.col("s.result_code"))
        )
        .count()
    )
    assert diff == 0


def test_jdbc_append_pregenerated_ids_no_collision(spark, tmp_path):
    """S9 redesign: ids are generated before the write, so append
    epochs are disjoint and idempotent-per-range — no readback."""
    url = _derby_url(spark, tmp_path)
    a = _storage_shape(_decoded_fixture(spark, n=500, id_offset=0))
    b = _storage_shape(_decoded_fixture(spark, n=500, id_offset=10_000))
    write_jdbc(a, url, "epochs", mode="overwrite", driver=DERBY_DRIVER)
    write_jdbc(b, url, "epochs", mode="append", driver=DERBY_DRIVER)
    back = (
        spark.read.format("jdbc")
        .options(url=url, dbtable="epochs", driver=DERBY_DRIVER)
        .load()
    )
    assert back.count() == 1000
    assert back.select("id").distinct().count() == 1000


def test_epoch_split_matches_timestamp(spark, tmp_path):
    """The (time_epoch, useconds_epoch) storage pair reassembles to
    the original microsecond timestamp (diameter.py:444-447)."""
    src = _decoded_fixture(spark, n=200)
    shaped = with_epoch_columns(src, "ts")
    bad = shaped.where(
        F.unix_micros("ts")
        != F.col("time_epoch") * 1_000_000 + F.col("useconds_epoch")
    ).count()
    assert bad == 0
