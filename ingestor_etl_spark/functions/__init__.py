from ingestor_etl_spark.functions.scalar import (  # noqa: F401
    bcd_decode,
    dec,
    hex_to_long,
    html_unescape_udf,
    msisdn_truncate,
    nai_to_imsi,
    sip_user,
)
