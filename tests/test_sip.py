"""Golden tests: SIP decode, fragment reassembly, leg correlation."""

from __future__ import annotations

from ingestor_etl_spark.protocols.net import expand_l4
from ingestor_etl_spark.protocols.sip import (
    call_summary,
    correlate_sip_legs,
    decode_sip,
)
from ingestor_etl_spark.sources.pcap import read_pcap
from tests import pcapgen as g


def _sip_invite(call_id, from_user, to_user, sdp=None, compact=False):
    f, t, i = ("f", "t", "i") if compact else ("From", "To", "Call-ID")
    lines = [
        "INVITE sip:%s@carrier.example SIP/2.0" % to_user,
        f"{f}: <sip:{from_user}@carrier.example>;tag=1",
        f"{t}: <sip:{to_user}@carrier.example>",
        f"{i}: {call_id}",
        "Supported: 100rel",
    ]
    body = ""
    if sdp:
        sid, ver = sdp
        body = f"v=0\r\no=- {sid} {ver} IN IP4 10.1.1.1\r\n"
        lines.append("Content-Type: application/sdp")
    return ("\r\n".join(lines) + "\r\n\r\n" + body).encode()


def _sip_response(call_id, code=200, phrase="OK"):
    return (
        f"SIP/2.0 {code} {phrase}\r\nCall-ID: {call_id}\r\n"
        f"From: <sip:100@x>;tag=1\r\nTo: <sip:200@x>;tag=2\r\n\r\n"
    ).encode()


def test_decode_sip_request_response_and_compact(spark, tmp_path):
    inv = _sip_invite("call-1@a", "5215550123", "5215550456", sdp=(4242, 1))
    ok = _sip_response("call-1@a")
    compact = _sip_invite("call-2@b", "100", "200", compact=True)
    dns = g.udp(b"\x00" * 20, 12345, 53)  # dropped (port 53)
    frames = [
        (1900, 0, g.eth(g.ipv4(g.udp(inv, 5060, 5060), 17))),
        (1900, 1, g.eth(g.ipv4(g.udp(ok, 5060, 5060), 17, src="10.0.0.2", dst="10.0.0.1"))),
        (1900, 2, g.eth(g.ipv4(g.udp(compact, 5060, 5060), 17))),
        (1900, 3, g.eth(g.ipv4(dns, 17))),
    ]
    p = tmp_path / "sip.pcap"
    p.write_bytes(g.pcap(frames))
    out = decode_sip(expand_l4(read_pcap(spark, str(p)))).toPandas().sort_values("frame_no")
    assert len(out) == 3
    req = out.iloc[0]
    assert req.request and req.method == "INVITE"
    assert req.call_id == "call-1@a"
    assert req.from_user == "5215550123" and req.to_user == "5215550456"
    assert req.sdp_session_id == "4242" and req.sdp_version == "1"
    res = out.iloc[1]
    assert not res.request and res.status_code == 200
    assert res.status_line == "SIP/2.0 200 OK"
    cmp_row = out.iloc[2]
    assert cmp_row.call_id == "call-2@b" and cmp_row.from_user == "100"


def test_13_digit_user_trim(spark, tmp_path):
    inv = _sip_invite("c3", "5215551234567", "200")  # 13 digits → drop first 4
    p = tmp_path / "trim.pcap"
    p.write_bytes(g.pcap([(1900, 0, g.eth(g.ipv4(g.udp(inv, 5060, 5060), 17)))]))
    row = decode_sip(expand_l4(read_pcap(spark, str(p)))).collect()[0]
    assert row.from_user == "551234567"  # [4:] per sip_ingestor.py:235
    assert row.from_original == "5215551234567"


def test_fragment_reassembly_r4(spark, tmp_path):
    inv = _sip_invite("frag-call", "111", "222", sdp=(777, 3))
    dgram = g.udp(inv, 5060, 5060)
    cut = 24  # multiple of 8 required for frag offsets
    first = g.eth(g.ipv4(dgram[:cut], 17, ident=99, more_frags=True))
    second = g.eth(g.ipv4(dgram[cut:], 17, ident=99, frag_off=cut))
    p = tmp_path / "frag.pcap"
    p.write_bytes(g.pcap([(1901, 0, first), (1901, 1, second)]))
    out = decode_sip(expand_l4(read_pcap(spark, str(p)))).toPandas()
    assert len(out) == 1
    assert out.iloc[0].call_id == "frag-call"
    assert out.iloc[0].sdp_session_id == "777"


def test_correlate_sip_legs_j5(spark, tmp_path):
    pm = _sip_invite("pm-leg", "anonymous", "anonymous", sdp=(4242, 1))
    ice = _sip_invite("ice-leg", "5215550123", "5215550456", sdp=(4242, 1))
    frames = [
        (1902, 0, g.eth(g.ipv4(g.udp(pm, 5060, 5060), 17, src="10.9.9.1", dst="10.9.9.2"))),
        (1902, 1, g.eth(g.ipv4(g.udp(ice, 5060, 5060), 17, src="10.8.8.1", dst="10.8.8.2"))),
    ]
    p = tmp_path / "legs.pcap"
    p.write_bytes(g.pcap(frames))
    msgs = decode_sip(expand_l4(read_pcap(spark, str(p))))
    out = correlate_sip_legs(msgs, ["10.9.9.1"], ["10.8.8.1"]).toPandas()
    pm_row = out[out.call_id == "pm-leg"].iloc[0]
    assert pm_row.from_user == "5215550123"  # rewritten from ICE leg
    assert pm_row.from_original == "anonymous"  # original preserved
    assert pm_row.peer_call_id == "ice-leg"
    summary = call_summary(msgs).toPandas()
    assert set(summary.call_id) == {"pm-leg", "ice-leg"}


def test_invite_placeholder_owner_patched_and_correlated(spark, tmp_path):
    """sip_ingestor.py:430-433: a PM INVITE whose SDP owner is the
    '0 0' placeholder must (a) correlate to the B leg under the
    CALL's real owner key and (b) store the patched session id /
    version — the reference's post-join byte mutation."""
    from ingestor_etl_spark import capturegen as g
    from ingestor_etl_spark.protocols.net import expand_l4
    from ingestor_etl_spark.protocols.sip import correlate_sip_legs, decode_sip
    from ingestor_etl_spark.sources.pcap import read_pcap

    def msg(lines, sdp):
        body = f"v=0\r\no=- {sdp[0]} {sdp[1]} IN IP4 10.1.1.1\r\n" if sdp else ""
        return ("\r\n".join(lines) + "\r\n\r\n" + body).encode()

    invite_pm = msg(
        [
            "INVITE sip:200@demo SIP/2.0",
            "From: <sip:100@demo>;tag=1",
            "To: <sip:200@demo>",
            "Call-ID: pm-1",
        ],
        ("0", "0"),  # placeholder owner
    )
    ok_pm = msg(
        [
            "SIP/2.0 200 OK",
            "From: <sip:100@demo>;tag=1",
            "To: <sip:200@demo>;tag=2",
            "Call-ID: pm-1",
        ],
        ("7777", "3"),  # the call's REAL owner
    )
    invite_ice = msg(
        [
            "INVITE sip:555@demo SIP/2.0",
            "From: <sip:444@demo>;tag=9",
            "To: <sip:555@demo>",
            "Call-ID: ice-1",
        ],
        ("7777", "3"),
    )
    frames = [
        (3000, 0, g.eth(g.ipv4(g.udp(invite_pm, 5060, 5060), 17, src="10.9.9.1", dst="10.9.9.2"))),
        (3000, 1, g.eth(g.ipv4(g.udp(ok_pm, 5060, 5060), 17, src="10.9.9.2", dst="10.9.9.1"))),
        (3000, 2, g.eth(g.ipv4(g.udp(invite_ice, 5060, 5060), 17, src="10.8.8.1", dst="10.8.8.2"))),
    ]
    path = tmp_path / "sip00.pcap"
    path.write_bytes(g.pcap(frames))
    msgs = decode_sip(expand_l4(read_pcap(spark, str(path))))
    out = correlate_sip_legs(
        msgs, leg_a_ips=["10.9.9.1", "10.9.9.2"], leg_b_ips=["10.8.8.1", "10.8.8.2"]
    ).toPandas()
    inv = out[(out.call_id == "pm-1") & (out.method == "INVITE")].iloc[0]
    # patched bytes: placeholder replaced by the call's real owner
    assert (inv.sdp_session_id, inv.sdp_version) == ("7777", "3")
    # correlated: user rewrite from the ICE leg applied
    assert inv.from_user == "444" and inv.to_user == "555"
    assert inv.from_original == "100" and inv.to_original == "200"
    assert inv.peer_call_id == "ice-1"
