"""CSV document-corpus source — the other ubiquitous interchange
format for tabular corpus metadata and crawled-text exports.

Error-row semantics mirror the engine's §2.8 contract (errors become
rows, not exceptions) exactly as sources/jsonl.py does for JSONL:
explicit schema (no inference pass — inference scans the input twice
and is sample-dependent at corpus scale), PERMISSIVE mode, raw line
preserved in ``_corrupt``. CSV differs from JSONL in one observed
way worth pinning (tests/test_corpus_ops.py): a *missing trailing
field* is corrupt in CSV (arity is part of the format) while in
JSONL a missing key is merely null; extra fields are likewise
corrupt but the parseable prefix is kept.

Batch and Structured Streaming share the reader (file-drop ingestion
with ``availableNow`` backfill), same as the JSONL source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ingestor_etl_spark.sources.jsonl import DOCUMENT_SCHEMA


def read_csv_documents(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """Read a CSV document corpus (batch or streaming) with corrupt
    lines preserved as rows. Quoted fields may contain the
    delimiter; the schema is the shared document-corpus schema."""
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(DOCUMENT_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
