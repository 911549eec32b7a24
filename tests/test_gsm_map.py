"""Golden tests: M3UA/SCCP/TCAP decode + XUDT reassembly (R3)."""

from __future__ import annotations

import struct

from ingestor_etl_spark.protocols.gsm_map import (
    decode_gsm_map,
    parse_m3ua,
    parse_mtp3,
    parse_sccp,
    parse_tcap,
)
from ingestor_etl_spark.protocols.net import expand_l4
from ingestor_etl_spark.sources.pcap import read_pcap
from tests import pcapgen as g

IMSI_BCD = g.tbcd("334020123456789f"[:15] + "f")  # 8 bytes, trailing filler


def _begin_sri() -> bytes:
    """begin + invoke sendRoutingInfoForSM(45) with msisdn [0] param."""
    msisdn = g.ber(0x80, g.tbcd("5215550199"))  # 5-byte tbcd → context [0]
    param = g.ber(0x30, g.ber(0x80, b"\x91" + g.tbcd("521555019900")))
    return g.tcap_msg("begin", otid=0x11223344, components=[g.tcap_invoke(45, param)])


def test_parse_m3ua_and_sccp():
    tcap = g.tcap_msg("begin", otid=5)
    chunk = g.m3ua(g.sccp_udt(tcap), opc=7, dpc=9)
    opc, dpc, sccp = parse_m3ua(chunk)
    assert (opc, dpc) == (7, 9)
    info = parse_sccp(sccp)
    assert info["tcap"] == tcap and info["seg_ref"] is None


def test_parse_mtp3_raw():
    tcap = g.tcap_msg("end", dtid=6)
    word = (77 << 14) | 1234  # opc=77, dpc=1234
    packet = b"\x83" + struct.pack("!I", word)[::-1] + g.sccp_udt(tcap)
    opc, dpc, sccp = parse_mtp3(packet)
    assert (opc, dpc) == (77, 1234)
    assert parse_sccp(sccp)["tcap"] == tcap


def test_parse_tcap_begin_invoke():
    imsi_param = g.ber(0x30, g.ber(0x04, IMSI_BCD))
    buf = g.tcap_msg(
        "begin", otid=0xAABBCCDD, components=[g.tcap_invoke(2, imsi_param)]
    )
    out = parse_tcap(buf)
    assert out["tcap_mess_type"] == "begin"
    assert out["tcap_otid"] == 0xAABBCCDD
    assert out["tcap_tid"] == 0xAABBCCDD  # tid = otid for begin
    assert out["gsm_component"] == 1
    assert out["gsm_op_code"] == 2
    assert out["imsi"] == "334020123456789"  # P17 BCD swap + filler drop


def test_parse_tcap_end_return_result_and_dialogue():
    buf = g.tcap_msg(
        "end",
        dtid=0x00000042,
        dialogue_result=0,
        components=[g.tcap_return_result(45)],
    )
    out = parse_tcap(buf)
    assert out["tcap_mess_type"] == "end"
    assert out["tcap_tid"] == 0x42  # tid = dtid for end
    assert out["tcap_result"] == 0
    assert out["gsm_component"] == 2
    assert out["gsm_op_code"] == 45


def test_parse_tcap_return_error_and_abort():
    err = g.tcap_msg("end", dtid=9, components=[g.tcap_return_error(34)])
    out = parse_tcap(err)
    assert out["gsm_component"] == 3 and out["gsm_error_code"] == 34
    abort = g.tcap_msg("abort", dtid=0x0BADCAFE)
    out2 = parse_tcap(abort)
    assert out2["tcap_mess_type"] == "abort" and out2["tcap_tid"] == 0x0BADCAFE


def test_parse_tcap_sms_msisdn_p18():
    # mo-forwardSM (46): sm-RP-UI TPDU, deliver form, TON/NPI=1/1
    tpdu = bytes([0x00, 0x0C, 0x91]) + g.tbcd("521555010203") + b"\x00" * 8
    param = g.ber(0x30, g.ber(0x04, tpdu))
    buf = g.tcap_msg("begin", otid=1, components=[g.tcap_invoke(46, param)])
    out = parse_tcap(buf)
    assert out["gsm_op_code"] == 46
    assert out["msisdn"] == "521555010203"


def test_gsm_map_pipeline_with_xudt_reassembly(spark, tmp_path):
    whole = _begin_sri()
    seg_tcap = g.tcap_msg(
        "continue",
        otid=0x999,
        components=[g.tcap_invoke(2, g.ber(0x30, g.ber(0x04, IMSI_BCD)))],
    )
    half = len(seg_tcap) // 2
    frames = [
        (2100, 0, g.eth(g.ipv4(g.sctp([(0, 0, 3, g.m3ua(g.sccp_udt(whole)))], 2905, 2905), 132))),
        (2100, 1, g.eth(g.ipv4(g.sctp([(0, 1, 3, g.m3ua(g.sccp_xudt(seg_tcap[:half], True, 1, 0x70001)))], 2905, 2905), 132))),
        (2100, 2, g.eth(g.ipv4(g.sctp([(0, 2, 3, g.m3ua(g.sccp_xudt(seg_tcap[half:], False, 0, 0x70001)))], 2905, 2905), 132))),
        # non-M3UA ppid chunk: pruned by the native PPID filter (P7)
        (2100, 3, g.eth(g.ipv4(g.sctp([(0, 3, 46, b"\x01\x02\x03\x04")], 2905, 2905), 132))),
    ]
    p = tmp_path / "ss7.pcap"
    p.write_bytes(g.pcap(frames))
    raw = read_pcap(spark, str(p))
    out = decode_gsm_map(expand_l4(raw), raw).toPandas().sort_values("ts_us" if "ts_us" in [] else "tcap_otid")
    assert len(out) == 2
    sri = out[out.tcap_otid == 0x11223344].iloc[0]
    assert sri.tcap_mess_type == "begin"
    assert sri.gsm_op_code == 45
    assert sri.mtp3_opc == 101 and sri.mtp3_dpc == 202
    assert sri.msisdn == "521555019900"
    seg = out[out.tcap_otid == 0x999].iloc[0]
    assert seg.tcap_mess_type == "continue"
    assert list(seg.frames_list) == [2, 3]  # R3 merged two XUDT frames
    assert seg.imsi == "334020123456789"


def test_gsm_map_incomplete_segment_dropped(spark, tmp_path):
    seg_tcap = g.tcap_msg("begin", otid=0x777)
    frames = [
        (2100, 0, g.eth(g.ipv4(g.sctp([(0, 0, 3, g.m3ua(g.sccp_xudt(seg_tcap[:4], True, 1, 0x50)))], 2905, 2905), 132))),
    ]
    p = tmp_path / "incomplete.pcap"
    p.write_bytes(g.pcap(frames))
    raw = read_pcap(spark, str(p))
    assert decode_gsm_map(expand_l4(raw), raw).count() == 0


# ------------------------------------------------------- adversarial BER
# (VERDICT r1 item 3: encodings pycrate accepts from real captures that
# the simple short-form walker used to stop on)

def _indef(tag: int, content: bytes) -> bytes:
    """Constructed TLV in the indefinite-length form (len byte 0x80,
    terminated by the end-of-contents marker)."""
    return bytes([tag, 0x80]) + content + b"\x00\x00"


def test_indefinite_length_forms_decode():
    invoke = g.tcap_invoke(45)
    body = g.ber(0x48, struct.pack("!I", 0x31337)) + _indef(0x6C, invoke)
    out = parse_tcap(_indef(0x62, body))
    assert out["tcap_mess_type"] == "begin"
    assert out["tcap_otid"] == 0x31337
    assert out["gsm_component"] == 1 and out["gsm_op_code"] == 45


def test_indefinite_nested_inside_definite():
    # definite-length message whose components container is indefinite,
    # holding a definite invoke whose param is indefinite again
    param = _indef(0x30, g.ber(0x04, IMSI_BCD))
    invoke = g.tcap_invoke(2, param)
    buf = g.tcap_msg("begin", otid=7, components=[])[:0] + g.ber(
        0x62, g.ber(0x48, struct.pack("!I", 7)) + _indef(0x6C, invoke)
    )
    out = parse_tcap(buf)
    assert out["tcap_otid"] == 7
    assert out["gsm_op_code"] == 2
    assert out["imsi"] == "334020123456789"


def test_long_form_tag_at_depth_no_desync():
    from ingestor_etl_spark.protocols.gsm_map import ber_children

    # long-form tag 5F 2D before the imsi leaf: the walker must fold
    # it into tag 0x5F2D and continue to the next sibling intact
    longform = b"\x5f\x2d\x03abc"
    param = g.ber(0x30, longform + g.ber(0x04, IMSI_BCD))
    buf = g.tcap_msg("begin", otid=3, components=[g.tcap_invoke(2, param)])
    out = parse_tcap(buf)
    assert out["gsm_op_code"] == 2
    assert out["imsi"] == "334020123456789"
    seq = g.ber(0x30, longform + g.ber(0x04, b"x"))
    tags = [t for t, _, _ in ber_children(seq[2:])]
    assert tags == [0x5F2D, 0x04]


def test_multi_component_first_wins():
    # two invokes in one components container: component/opcode come
    # from the FIRST (reference reads component [0] only)
    imsi_param = g.ber(0x30, g.ber(0x04, IMSI_BCD))
    buf = g.tcap_msg(
        "begin", otid=4,
        components=[g.tcap_invoke(45), g.tcap_invoke(2, imsi_param)],
    )
    out = parse_tcap(buf)
    assert out["gsm_component"] == 1
    assert out["gsm_op_code"] == 45
    assert out.get("imsi") is None  # identities scoped to component [0]


def test_abort_with_undecodable_remainder():
    # reference gsm_map.py:268-273: an abort whose tail pycrate cannot
    # decode still yields mess_type=abort + dtid. The walker reads the
    # dtid leaf, then stops at the malformed trailing portion.
    body = g.ber(0x49, struct.pack("!I", 0x0BADCAFE)) + b"\x6b\x85\x01"
    out = parse_tcap(g.ber(0x67, body))
    assert out["tcap_mess_type"] == "abort"
    assert out["tcap_dtid"] == 0x0BADCAFE
    assert out["tcap_tid"] == 0x0BADCAFE


def test_truncated_and_garbage_tcap_yield_none():
    assert parse_tcap(b"") is None
    assert parse_tcap(b"\x62") is None
    assert parse_tcap(b"\xff\xff\xff") is None
    # primitive with indefinite length is illegal: walk stops → None
    assert parse_tcap(b"\x02\x80\x00\x00") is None


def test_sccp_party_address_parse():
    """Q.713 address decode (S6 field surface): SSN-only, PC+SSN,
    GTI-4 digits with odd-length filler, and the malformed truncated
    address must come back clean."""
    from ingestor_etl_spark.capturegen import sccp_gt_addr
    from ingestor_etl_spark.protocols.gsm_map import _parse_sccp_address

    assert _parse_sccp_address(b"\x42\x08") == (8, None)          # SSN only
    assert _parse_sccp_address(b"\x43\x00\x01\x09") == (9, None)  # PC + SSN
    assert _parse_sccp_address(sccp_gt_addr(8, "1234567")) == (8, "1234567")
    assert _parse_sccp_address(sccp_gt_addr(6, "987654")) == (6, "987654")
    assert _parse_sccp_address(b"\x43\x09") == (None, None)       # truncated PC
    assert _parse_sccp_address(b"") == (None, None)
