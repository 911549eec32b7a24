"""Golden tests: GTP v1/v2 decode + J2 transaction enrichment."""

from __future__ import annotations

from ingestor_etl_spark.protocols.gtp import (
    decode_gtp,
    enrich_gtp_transactions,
    parse_gtp,
    tbcd,
)
from ingestor_etl_spark.protocols.net import expand_l4
from ingestor_etl_spark.sources.pcap import read_pcap
from tests import pcapgen as g

IMSI = "334020123456789"
MSISDN = "5215550100"


def test_tbcd_roundtrip():
    assert tbcd(g.tbcd(IMSI)) == IMSI
    assert tbcd(g.tbcd("12345")) == "12345"  # odd length, f filler


def test_parse_gtpv1_request():
    ies = g.gtpv1_ie_tv(2, g.tbcd(IMSI + "f"[: 16 - len(IMSI)]))  # 8-byte IMSI TV
    msg = parse_gtp(g.gtpv1(16, teid=0, seq=100, ies=ies))
    assert msg["gtp_version"] == 1
    assert msg["msg_name"] == "create_pdp_context_request"
    assert msg["seq"] == 100
    assert msg["imsi"] == IMSI


def test_parse_gtpv1_response_cause():
    msg = parse_gtp(g.gtpv1(17, teid=7, seq=100, ies=g.gtpv1_ie_tv(1, b"\x80")))
    assert msg["cause"] == 128 and msg["cause_text"] == "Request accepted"
    assert msg["teid"] == 7


def test_parse_gtpv2_create_session():
    ies = g.gtpv2_ie(1, g.tbcd(IMSI)) + g.gtpv2_ie(76, g.tbcd(MSISDN))
    msg = parse_gtp(g.gtpv2(32, teid=0x1234, seq=555, ies=ies))
    assert msg["gtp_version"] == 2
    assert msg["msg_name"] == "create_session_request"
    assert (msg["teid"], msg["seq"]) == (0x1234, 555)
    assert msg["imsi"] == IMSI and msg["msisdn"] == MSISDN


def test_parse_gtpv2_response_cause():
    msg = parse_gtp(g.gtpv2(33, teid=9, seq=555, ies=g.gtpv2_ie(2, b"\x10\x00")))
    assert msg["cause"] == 16 and msg["cause_text"] == "Request accepted"


def test_gtp_pipeline_j2_enrichment(spark, tmp_path):
    """Request carries IMSI/MSISDN; response carries none — J2
    propagates both onto the response row via the seq group."""
    req = g.gtpv2(
        32, 0, 777, g.gtpv2_ie(1, g.tbcd(IMSI)) + g.gtpv2_ie(76, g.tbcd(MSISDN))
    )
    res = g.gtpv2(33, 1, 777, g.gtpv2_ie(2, b"\x10\x00"))
    other = g.gtpv2(36, 2, 888)  # unrelated txn, no identifiers
    frames = [
        (1800, 0, g.eth(g.ipv4(g.udp(req, 40000, 2123), 17))),
        (1800, 1, g.eth(g.ipv4(g.udp(res, 2123, 40000), 17, src="10.0.0.2", dst="10.0.0.1"))),
        (1800, 2, g.eth(g.ipv4(g.udp(other, 40000, 2123), 17))),
    ]
    p = tmp_path / "gtp.pcap"
    p.write_bytes(g.pcap(frames))
    msgs = decode_gtp(expand_l4(read_pcap(spark, str(p))))
    out = enrich_gtp_transactions(msgs).toPandas().sort_values("frame_no")
    assert len(out) == 3
    res_row = out[out.msg_type == 33].iloc[0]
    assert res_row.imsi == IMSI and res_row.msisdn == MSISDN
    assert res_row.cause == 16
    other_row = out[out.msg_type == 36].iloc[0]
    assert other_row.imsi is None and other_row.msisdn is None
