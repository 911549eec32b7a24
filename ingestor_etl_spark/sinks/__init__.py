"""Sinks: JDBC bulk load, parquet tables, ingestion ledger."""
