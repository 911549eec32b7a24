"""Protocol decoders: frames → typed per-message DataFrames.

Each module covers one protocol family from SURVEY §2.2-§2.4. The
byte-level walks live in plain-Python parser functions (unit-testable
without Spark) invoked from Arrow-batched ``mapInPandas`` passes; all
relational work downstream (filters, correlation joins, group
enrichment, sessionization) is native DataFrame API so Catalyst
prunes and pushes as usual.
"""
