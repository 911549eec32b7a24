"""Scalar column kit — native Spark expressions wherever possible.

Each helper mirrors a scalar behavior of the reference (citations
are ``/root/reference/<file>:<lines>``) but is implemented as a
Catalyst expression so it stays inside whole-stage codegen; only
``html_unescape`` needs Python (stdlib lookup table), and it is an
Arrow-batched pandas UDF.
"""

from __future__ import annotations

import html

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def dec(col: Column | str, precision: int = 12, scale: int = 2) -> Column:
    """Cast to an explicit decimal so aggregate arithmetic is exact
    and engine-independent (used to make results bit-stable versus
    the DuckDB oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def bcd_decode(hex_col: Column | str) -> Column:
    """TBCD decode: swap each hex nibble pair, truncate at the first
    ``f`` filler nibble. Mirrors gtp_ingestor.py:268-281 and
    gsm_map.py:315-322 without a UDF: pair-swap is a regexp
    substitution, filler cut is ``substring_index``.
    """
    c = F.col(hex_col) if isinstance(hex_col, str) else hex_col
    swapped = F.regexp_replace(F.lower(c), "(.)(.)", "$2$1")
    return F.substring_index(swapped, "f", 1)


def nai_to_imsi(user_name: Column | str) -> Column:
    """Extract the IMSI from a Diameter User-Name NAI: when the value
    is longer than 16 chars and shaped ``digits@realm``, keep the
    digits (diameter.py:155-161)."""
    c = F.col(user_name) if isinstance(user_name, str) else user_name
    digits = F.regexp_extract(c, r"^([0-9]+)@", 1)
    return F.when((F.length(c) > 16) & (digits != ""), digits).otherwise(c)


def sip_user(header: Column | str) -> Column:
    """SIP From/To user: grab the ``sip:``/``tel:`` user token; if it
    is a 13-digit number keep digits 5.. (sip_ingestor.py:232-236).
    Returns a struct (user, original)."""
    c = F.col(header) if isinstance(header, str) else header
    raw = F.regexp_extract(c, r"(?:sip|tel):\+?(\w+)", 1)
    trimmed = F.when(raw.rlike(r"^[0-9]{13}$"), F.substring(raw, 5, 16)).otherwise(raw)
    return F.struct(trimmed.alias("user"), raw.alias("original"))


def msisdn_truncate(col: Column | str, limit: int = 32) -> Column:
    """Values longer than ``limit`` chars become first-29 + ``...``
    (http_ss7_ingestor.py:372-373)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) > limit, F.concat(F.substring(c, 1, limit - 3), F.lit("..."))
    ).otherwise(c)


def hex_to_long(col: Column | str) -> Column:
    """Hex string → BIGINT (cap_ingestor.py:126-127 int(x,16))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(c, 16, 10).cast("long")


@pandas_udf(StringType())
def html_unescape_udf(s: pd.Series) -> pd.Series:
    """``html.unescape`` over a string column
    (http_ss7_ingestor.py:348,365)."""
    return s.map(lambda v: html.unescape(v) if v is not None else None)
