"""Command-line ingest driver — the reference's per-protocol entry
points as one CLI.

The reference runs one OS process per pcap per protocol
(``python diameter.py <pcap> <queue_id>``, diameter.py:616-629;
``python gsm_map.py <pcap> <queue_id>``, gsm_map.py:517-544; etc.),
each bulk-loading one Postgres table and updating the
``ingestion_queue``. Here one command ingests a *glob* of capture
files in a single Spark job (files are the parallelism unit), writes
the protocol table as parquet (or any ``--format``), and appends
processed / not_processed counters per file to the ingestion ledger
(S10/S11 semantics):

    python -m ingestor_etl_spark --protocol diameter \
        --input '/data/caps/*.pcap' --out /data/tables/diameter \
        --ledger /data/ledger

``--streaming`` switches the same pipeline to a file-source
readStream with checkpointing (new files picked up as they land —
the queue-table polling loop of diameter.sh replaced by the source's
own file tracking).
"""

from __future__ import annotations

import argparse
import sys


def build_pipeline(spark, protocol: str, input_glob: str):
    """Compose source → decode → correlate for one protocol.
    Returns ``(output_df, decoded_df)`` — the table to write and the
    per-message decode stage the ledger counts are taken from
    (correlated outputs merge req/ans rows and lose the per-file
    grain the A1 counters need). Mirrors §3's lifecycles."""
    from ingestor_etl_spark.protocols.net import expand_l4
    from ingestor_etl_spark.sources.pcap import read_pcap

    if protocol == "cap":
        from ingestor_etl_spark.protocols.cap import decode_cap, read_tshark_json

        out = decode_cap(read_tshark_json(spark, input_glob))
        return out, out

    frames = expand_l4(read_pcap(spark, input_glob))
    if protocol == "diameter":
        from ingestor_etl_spark.protocols.diameter import (
            correlate_diameter,
            decode_diameter,
        )

        msgs = decode_diameter(frames)
        return correlate_diameter(msgs), msgs
    if protocol == "gsm_map":
        from ingestor_etl_spark.protocols.gsm_map import decode_gsm_map

        out = decode_gsm_map(frames)
        return out, out
    if protocol == "gtp":
        from ingestor_etl_spark.protocols.gtp import decode_gtp, enrich_gtp_transactions

        msgs = decode_gtp(frames)
        return enrich_gtp_transactions(msgs), msgs
    if protocol == "sip":
        from ingestor_etl_spark.protocols.sip import decode_sip

        out = decode_sip(frames)
        return out, out
    if protocol == "smpp":
        from ingestor_etl_spark.protocols.smpp import decode_smpp, group_smpp_transactions

        msgs = decode_smpp(frames)
        return group_smpp_transactions(msgs), msgs
    if protocol in ("http_ocs", "http_ss7", "http_smpp", "http_camel", "http_diameter"):
        from ingestor_etl_spark.protocols.http_sig import (
            extract_generic,
            extract_ocs,
            extract_ss7sms,
            http_messages,
            link_http,
        )

        msgs = http_messages(frames)
        if protocol == "http_ocs":
            out = link_http(extract_ocs(msgs), enrich_cols=["msisdn", "calling", "called"])
        elif protocol == "http_ss7":
            out = link_http(extract_ss7sms(msgs), enrich_cols=["msisdn", "imsi"])
        else:
            dialect = protocol.split("_", 1)[1].upper()
            out = link_http(extract_generic(msgs, dialect), enrich_cols=["msisdn", "imsi"])
        return out, msgs
    raise SystemExit(f"unknown protocol: {protocol}")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m ingestor_etl_spark")
    ap.add_argument(
        "--protocol",
        required=True,
        choices=[
            "diameter", "gsm_map", "gtp", "sip", "smpp", "cap",
            "http_ocs", "http_ss7", "http_smpp", "http_camel", "http_diameter",
        ],
    )
    ap.add_argument("--input", required=True, help="capture-file glob (pcap/pcapng; tshark JSON for cap)")
    ap.add_argument("--out", required=True, help="output table directory")
    ap.add_argument("--format", default="parquet", help="output format (parquet/jdbc/...)")
    ap.add_argument("--ledger", default=None, help="ingestion-ledger directory (S10/S11)")
    ap.add_argument("--streaming", action="store_true", help="readStream + checkpoint instead of batch")
    ap.add_argument("--checkpoint", default=None, help="checkpoint dir (streaming)")
    args = ap.parse_args(argv)

    from ingestor_etl_spark.session import get_spark

    spark = get_spark(f"ingest-{args.protocol}")

    if args.streaming:
        if args.protocol != "diameter":
            raise SystemExit("--streaming currently supports the diameter pipeline")
        from ingestor_etl_spark.protocols.net import expand_l4
        from ingestor_etl_spark.streaming.pipeline import (
            stream_decode_diameter,
            stream_frames,
            write_stream_with_ledger,
        )

        msgs = stream_decode_diameter(expand_l4(stream_frames(spark, args.input)))
        q = write_stream_with_ledger(
            msgs.drop("ts"),
            args.out,
            args.checkpoint or args.out + "_ckpt",
            args.ledger,
        )
        q.awaitTermination()
        return 0

    df, decoded = build_pipeline(spark, args.protocol, args.input)
    df.write.format(args.format).mode("append").save(args.out)

    if args.ledger:
        from ingestor_etl_spark.sinks.ledger import append_ledger, file_counters, ledger_rows

        append_ledger(ledger_rows(file_counters(decoded)), args.ledger)
    return 0


if __name__ == "__main__":
    sys.exit(main())
