"""Multi-protocol smoke corpus: one capture SET with mixed formats
and DLTs — ethernet pcap files, a BIG-ENDIAN pcapng section, and a
raw-MTP3 (DLT 141) pcapng — holding interleaved flows of all five
protocols. Every decoder runs over the SAME segment scan of the
whole directory and must pull exactly its own traffic: per-protocol
row counts pinned, zero cross-talk between files or protocols."""

from __future__ import annotations

import struct

import pytest

from ingestor_etl_spark.protocols.diameter import decode_diameter
from ingestor_etl_spark.protocols.gsm_map import decode_gsm_map
from ingestor_etl_spark.protocols.gtp import decode_gtp
from ingestor_etl_spark.protocols.net import expand_l4
from ingestor_etl_spark.protocols.sip import decode_sip
from ingestor_etl_spark.protocols.smpp import decode_smpp
from ingestor_etl_spark.sources.pcap import read_pcap
from tests import pcapgen as g


def _sip_msg(first_line: str, call_id: str) -> bytes:
    return "\r\n".join(
        [
            first_line,
            "Via: SIP/2.0/UDP a.example",
            "From: <sip:5215550100@x>;tag=1",
            "To: <sip:5215550200@x>",
            f"Call-ID: {call_id}",
            "CSeq: 1 INVITE",
            "Content-Length: 0",
            "",
            "",
        ]
    ).encode()


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")

    # diameter: two INTERLEAVED transactions over SCTP ppid 46
    msgs = []
    for i in (1, 2):
        msgs.append(g.diameter_msg(272, True, i, i, [g.diameter_avp(263, b"s;%d" % i)]))
    for i in (1, 2):
        msgs.append(
            g.diameter_msg(272, False, i, i, [g.diameter_avp(263, b"s;%d" % i),
                                              g.diameter_avp(268, struct.pack("!I", 2001))])
        )
    diam_frames = [
        (1700, n, g.eth(g.ipv4(g.sctp([(0, n, 46, m)], 40001, 3868), 132)))
        for n, m in enumerate(msgs)
    ]
    (d / "diam.pcap").write_bytes(g.pcap(diam_frames))

    # smpp: submit/resp with an unknown PDU interleaved in-segment
    submit = g.smpp_pdu(0x4, 0, 7, g.smpp_submit_body("100", "200"))
    resp = g.smpp_pdu(0x80000004, 0, 7, b"ID\x00")
    enquire = g.smpp_pdu(0x15, 0, 9)
    (d / "smpp.pcap").write_bytes(
        g.pcap(
            [
                (1700, 0, g.eth(g.ipv4(g.tcp(enquire + submit, 40000, 2775, flags=24), 6))),
                (1700, 1, g.eth(g.ipv4(g.tcp(resp, 2775, 40000, flags=24), 6,
                                       src="10.0.0.2", dst="10.0.0.1"))),
            ]
        )
    )

    # sip over UDP 5060
    (d / "sip.pcap").write_bytes(
        g.pcap(
            [
                (1700, 0, g.eth(g.ipv4(g.udp(_sip_msg("INVITE sip:5215550200@x SIP/2.0", "c1@a"), 5060, 5060), 17))),
                (1700, 1, g.eth(g.ipv4(g.udp(_sip_msg("SIP/2.0 200 OK", "c1@a"), 5060, 5060), 17,
                                       src="10.0.0.2", dst="10.0.0.1"))),
            ]
        )
    )

    # gtpv2 request/response on UDP 2123
    req = g.gtpv2(32, 0, 77, g.gtpv2_ie(1, g.tbcd("334020123456789")))
    res = g.gtpv2(33, 1, 77, g.gtpv2_ie(2, b"\x10\x00"))
    (d / "gtp.pcap").write_bytes(
        g.pcap(
            [
                (1700, 0, g.eth(g.ipv4(g.udp(req, 40000, 2123), 17))),
                (1700, 1, g.eth(g.ipv4(g.udp(res, 2123, 40000), 17,
                                       src="10.0.0.2", dst="10.0.0.1"))),
            ]
        )
    )

    # ss7 over M3UA in a BIG-ENDIAN pcapng section (ethernet DLT)
    begin = g.tcap_msg("begin", otid=0xAA01, components=[g.tcap_invoke(45)])
    end = g.tcap_msg("end", dtid=0xAA01)
    ss7_frames = [
        (1_700_000_000, g.eth(g.ipv4(g.sctp([(0, 0, 3, g.m3ua(g.sccp_udt(begin)))], 2905, 2905), 132))),
        (1_700_000_001, g.eth(g.ipv4(g.sctp([(0, 1, 3, g.m3ua(g.sccp_udt(end)))], 2905, 2905), 132,
                                     src="10.0.0.2", dst="10.0.0.1"))),
    ]
    (d / "ss7_be.pcapng").write_bytes(g.pcapng(ss7_frames, dlt=1, big_endian=True))

    # raw MTP3 (DLT 141) pcapng — exercises the frames-side dispatch
    word = (77 << 14) | 1234
    mtp3 = b"\x83" + struct.pack("!I", word)[::-1] + g.sccp_udt(
        g.tcap_msg("begin", otid=0xBB02)
    )
    (d / "mtp3.pcapng").write_bytes(g.pcapng([(1_700_000_002, mtp3)], dlt=141))

    raw = read_pcap(spark, str(d) + "/*")
    return raw, expand_l4(raw)


def _files(pdf):
    return {f.rsplit("/", 1)[-1] for f in pdf["file"]}


def test_diameter_only_from_diameter_file(corpus):
    _, segments = corpus
    out = decode_diameter(segments).toPandas()
    assert len(out) == 4
    assert _files(out) == {"diam.pcap"}
    assert sorted(out.hop_by_hop_id) == [1, 1, 2, 2]  # interleaving survived


def test_smpp_only_from_smpp_file(corpus):
    _, segments = corpus
    out = decode_smpp(segments).toPandas()
    assert len(out) == 2
    assert _files(out) == {"smpp.pcap"}
    assert set(out.sequence_number) == {7}  # enquire_link skipped


def test_sip_only_from_sip_file(corpus):
    _, segments = corpus
    out = decode_sip(segments).toPandas()
    assert len(out) == 2
    assert _files(out) == {"sip.pcap"}


def test_gtp_only_from_gtp_file(corpus):
    _, segments = corpus
    out = decode_gtp(segments).toPandas()
    assert len(out) == 2
    assert _files(out) == {"gtp.pcap"}


def test_gsm_map_across_dlts_no_cross_talk(corpus):
    raw, segments = corpus
    out = decode_gsm_map(segments, raw).toPandas()
    assert len(out) == 3
    assert _files(out) == {"ss7_be.pcapng", "mtp3.pcapng"}
    be = out[out.file.str.endswith("ss7_be.pcapng")]
    assert sorted(be.tcap_mess_type) == ["begin", "end"]
    assert set(be.tcap_tid) == {0xAA01}
    raw_mtp3 = out[out.file.str.endswith("mtp3.pcapng")].iloc[0]
    assert raw_mtp3.tcap_otid == 0xBB02
    assert (raw_mtp3.mtp3_opc, raw_mtp3.mtp3_dpc) == (77, 1234)
