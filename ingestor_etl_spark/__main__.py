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
        "--query",
        default=None,
        metavar="NAME",
        help="run a registered engine query by name over --sf-dir "
        "(see --list-queries) instead of a protocol ingest",
    )
    ap.add_argument(
        "--list-queries",
        action="store_true",
        help="print every registered query name and exit",
    )
    ap.add_argument(
        "--sf-dir",
        default=None,
        help="table directory for --query (default $SPARK_GRAFT_SF_DIR "
        "or /root/testdata/sf0.01)",
    )
    ap.add_argument(
        "--protocol",
        required=False,
        choices=[
            "diameter", "gsm_map", "gtp", "sip", "smpp", "cap",
            "http_ocs", "http_ss7", "http_smpp", "http_camel", "http_diameter",
        ],
    )
    ap.add_argument("--input", required=False, help="capture-file glob (pcap/pcapng; tshark JSON for cap)")
    ap.add_argument("--out", required=False, help="output table directory (query mode: omit to print)")
    ap.add_argument("--format", default="parquet", help="output format (parquet/jdbc/...)")
    ap.add_argument("--ledger", default=None, help="ingestion-ledger directory (S10/S11)")
    ap.add_argument("--streaming", action="store_true", help="readStream + checkpoint instead of batch")
    ap.add_argument("--checkpoint", default=None, help="checkpoint dir (streaming)")
    args = ap.parse_args(argv)

    if args.list_queries:
        from ingestor_etl_spark.queries import load_all

        for name, q in sorted(load_all().items()):
            doc = (q.doc or "").strip().split("\n")[0]
            print(f"{name}\t{doc}")
        return 0

    from ingestor_etl_spark.session import get_spark

    if args.query:
        import os

        from ingestor_etl_spark.queries import load_all

        registry = load_all()
        if args.query not in registry:
            raise SystemExit(
                f"unknown query: {args.query} (see --list-queries)"
            )
        sf_dir = args.sf_dir or os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
        )
        spark = get_spark(f"query-{args.query}")
        df = registry[args.query].fn(spark, sf_dir)
        if args.out:
            df.write.format(args.format).mode("overwrite").save(args.out)
        else:
            df.show(50, truncate=False)
        return 0

    if not (args.protocol and args.input and args.out):
        ap.error("--protocol/--input/--out are required for ingest mode "
                 "(or use --query / --list-queries)")

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
