"""JSONL document-corpus source — the standard interchange format
for training-data pipelines (one JSON document per line).

Error-row semantics mirror the engine's §2.8 contract (errors become
rows, not exceptions): the reader runs PERMISSIVE with an explicit
schema — malformed lines land with the raw line in ``_corrupt`` and
typed fields null, so a ledger can count them per file while the
clean rows flow on. An explicit schema is mandatory: schema
inference reads the whole input twice and pins the job to a sample,
which is wrong at corpus scale and non-deterministic across runs.

The same function serves batch and Structured Streaming (file-drop
ingestion with ``availableNow`` backfill), matching the reference's
queue-of-files topology (database.py ingestion_queue) re-expressed
as a streaming file source + checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("_corrupt", StringType()),
    ]
)


def read_jsonl_documents(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """Read a JSONL document corpus (batch or streaming) with
    corrupt lines preserved as rows."""
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(DOCUMENT_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def split_errors(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the corrupt column, error rows) — the
    §2.8 split: errors feed the ledger, clean rows feed the
    pipeline.

    The parsed relation is materialized first: Spark disallows plans
    that reference ONLY the corrupt-record column of a raw JSON scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the error branch is
    exactly that shape. Materializing also means the file is parsed
    once for both branches instead of once per consumer — the same
    stage-sharing contract as every other multi-consumer lineage
    (plans/layout.materialize; release via release_caches)."""
    from ingestor_etl_spark.plans.layout import materialize

    with_file = materialize(docs.withColumn("file", F.input_file_name()))
    is_bad = F.col("_corrupt").isNotNull()
    clean = with_file.where(~is_bad).drop("_corrupt", "file")
    errors = with_file.where(is_bad).select(
        F.col("_corrupt").alias("raw_line"), "file"
    )
    return clean, errors
