"""XML document-corpus source — Spark 4's built-in XML datasource
(the spark-xml package merged into core, SPARK-44265) with the
engine's §2.8 error-row contract.

Error-row semantics mirror the JSONL source (sources/jsonl.py,
reference parity: ingestor-etl turns malformed inputs into ledger
rows, never exceptions): the reader runs PERMISSIVE with an explicit
schema — a record that fails XML parsing or type coercion lands with
the raw record text in ``_corrupt`` and typed fields null, so a
ledger can count errors per file while the clean rows flow on. An
explicit schema is mandatory: XML schema inference reads and parses
the whole input an extra time, which is wrong at corpus scale.

One XML-reader behavior the JSONL source does not share (and the
fixture layout accounts for): a malformed record can break RECORD
SPLITTING for the rest of its file — rowTag boundaries inside
unbalanced markup are ambiguous — so the corrupt row may carry the
remainder of the file, not one record. Real XML corpora (patent,
PubMed, Wikipedia dumps) ship one-document-per-file or
well-formed-wrapper layouts for exactly this reason; ingestion
treats the FILE as the error-isolation unit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ingestor_etl_spark.sources.jsonl import DOCUMENT_SCHEMA


def read_xml_documents(spark: SparkSession, path: str) -> DataFrame:
    """Read an XML document corpus (``<doc>`` row tag, one or more
    docs per file) with corrupt records preserved as rows. Batch
    only: Spark's XML datasource is not a streaming source; file-drop
    XML ingestion routes through the archive/queue topology like the
    reference's pcap queue, not through readStream."""
    return (
        spark.read.format("xml")
        .schema(DOCUMENT_SCHEMA)
        .option("rowTag", "doc")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .load(path)
    )
