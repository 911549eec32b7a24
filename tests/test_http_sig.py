"""Golden tests: HTTP signaling reassembly, pairing, XML dialects."""

from __future__ import annotations

from ingestor_etl_spark.protocols.http_sig import (
    http_messages,
    extract_generic,
    extract_ocs,
    extract_ss7sms,
    link_http,
    parse_generic_body,
    parse_ocs_body,
    parse_ss7sms_body,
)
from ingestor_etl_spark.protocols.net import expand_l4
from ingestor_etl_spark.sources.pcap import read_pcap
from tests import pcapgen as g


def _http(first_line: str, body: bytes = b"", extra: str = "") -> bytes:
    hdr = first_line + "\r\n"
    if body:
        hdr += f"Content-Length: {len(body)}\r\nContent-Type: text/xml\r\n"
    hdr += extra + "\r\n"
    return hdr.encode() + body


OCS_XML = (
    b"<mo-acr-request id=\"7\"><msisdn>5215550001</msisdn>"
    b"<callactive>true</callactive><periodduration>30</periodduration>"
    b"<starttime>2024-01-01</starttime><starttime>2024-01-02</starttime>"
    b"<calling>100</calling><called>200</called></mo-acr-request>"
)


def test_parse_ocs_body():
    out = parse_ocs_body(OCS_XML.decode(), None)
    assert out["type"] == "mo-acr-request"
    assert out["operation_id"] == 7
    assert out["msisdn"] == "5215550001"
    assert out["call_active"] is True
    assert out["period_duration"] == 30
    assert out["start_time"] == "2024-01-01"  # first-of-list
    assert parse_ocs_body("<unknownop/>", None) == {}
    assert parse_ocs_body(None, "noContent") == {"type": "noContent"}


def test_parse_ss7sms_body():
    xml = (
        '<smsmo><orig ton="1">52155&amp;0001</orig>'
        f'<dest ton="1">{"9" * 40}</dest>'
        "<msc>mscA</msc><imsi>334020123456789</imsi>"
        "<smsSubmit><udhi>true</udhi></smsSubmit>"
        "<sessionId>abc123</sessionId></smsmo>"
    )
    out = parse_ss7sms_body(xml, None)
    assert out["type"] == "smsmo"
    assert out["msisdn_orig"] == "52155&0001"  # html.unescape
    assert out["msisdn_dest"] == "9" * 29 + "..."  # 32-char truncation
    assert out["udhi"] is True and out["session_id"] == "abc123"
    err = parse_ss7sms_body("<error><text>boom</text></error>", None)
    assert err["type"] == "error" and err["text"] == "boom"


def test_parse_generic_dialects():
    smpp = parse_generic_body(
        "<smpp><sequenceNumber>9</sequenceNumber><commandId>4</commandId>"
        "<sourceAddress><address>111</address></sourceAddress>"
        "<destAddress><address>222</address></destAddress></smpp>",
        None,
        "SMPP",
    )
    assert smpp["smpp_seq_number"] == "9"
    assert smpp["msisdn"] == "222"  # cmd 4 → msisdn = dst
    camel = parse_generic_body(
        '<dialog localId="10" remoteId="20">'
        '<initialDP_Request><imsi number="334567"/></initialDP_Request>'
        '<origAddress><gt digits="1234"/></origAddress></dialog>',
        None,
        "CAMEL",
    )
    assert (camel["tcap_otid"], camel["tcap_dtid"]) == ("10", "20")
    assert camel["imsi"] == "334567" and camel["camel_orig_address"] == "1234"
    # malformed-attribute quirk patch (http_ingestor.py:216-217)
    diam = parse_generic_body(
        '<diameter><e2e>42</e2e><avp code="268" value="null"/></diameter>',
        None,
        "DIAMETER",
    )
    assert diam["diam_e2e_id"] == "42" and diam["diam_result_code"] == "0"


def _flow(payload: bytes, frame_ts: tuple[int, int], seq: int, ack: int, reverse=False):
    src, dst = ("10.1.1.2", "10.1.1.1") if reverse else ("10.1.1.1", "10.1.1.2")
    sp, dp = (8080, 45000) if reverse else (45000, 8080)
    return (
        frame_ts[0],
        frame_ts[1],
        g.eth(g.ipv4(g.tcp(payload, sp, dp, seq=seq, ack=ack, flags=24), 6, src=src, dst=dst)),
    )


def test_http_pipeline_reassembly_pairing(spark, tmp_path):
    body = OCS_XML
    req = _http("POST /ocs HTTP/1.1", body)
    # split the request across two TCP segments (R5): continuation
    # has no start line and must claim the request side by ack key
    cut = len(req) // 2
    res_body = b"<mo-acr-response id=\"7\"><result>0</result></mo-acr-response>"
    res = _http("HTTP/1.1 200 OK", res_body)
    frames = [
        _flow(req[:cut], (2200, 0), seq=1000, ack=555),
        _flow(req[cut:], (2200, 1), seq=1000 + cut, ack=555),
        _flow(res, (2200, 2), seq=555, ack=1000 + len(req), reverse=True),
    ]
    p = tmp_path / "ocs.pcap"
    p.write_bytes(g.pcap([f for f in frames]))
    msgs = http_messages(expand_l4(read_pcap(spark, str(p))))
    out = extract_ocs(msgs)
    linked = link_http(out, enrich_cols=["msisdn", "calling", "called"]).toPandas()
    assert len(linked) == 2
    reqrow = linked[linked.http_is_request].iloc[0]
    assert list(reqrow.frames_list) == [1, 2]  # reassembled
    assert reqrow.http_request_method == "POST"
    assert reqrow.http_request_uri == "http://10.1.1.2:8080/ocs "
    assert reqrow.type == "mo-acr-request" and reqrow.msisdn == "5215550001"
    resrow = linked[~linked.http_is_request].iloc[0]
    assert resrow.http_response_code == 200
    assert resrow.type == "mo-acr-response" and resrow.result == 0
    # J4: request points at response's pre-generated id (frame 3)
    assert reqrow.http_response_in == resrow.http_id == 3
    # bidirectional enrichment: response inherited request's msisdn
    assert resrow.msisdn == "5215550001"


def test_http_nocontent_and_dialects(spark, tmp_path):
    req = _http("GET /ping HTTP/1.1")  # no Content-Length → noContent
    sms = (
        "<smsmt><imsi>33401</imsi><msc ton=\"1\">mscB</msc>"
        "<orig ton=\"1\">111</orig><smsDeliver><udhi>false</udhi></smsDeliver></smsmt>"
    ).encode()
    req2 = _http("POST /ss7 HTTP/1.1", sms)
    frames = [
        _flow(req, (2300, 0), seq=1, ack=1),
        _flow(req2, (2300, 1), seq=500, ack=900),
    ]
    p = tmp_path / "ss7http.pcap"
    p.write_bytes(g.pcap(frames))
    msgs = http_messages(expand_l4(read_pcap(spark, str(p))))
    out = extract_ss7sms(msgs).toPandas().sort_values("http_id" if "http_id" in [] else "tcp_sequence")
    assert len(out) == 2
    nocontent = out[out.type == "noContent"].iloc[0]
    assert nocontent.http_request_method == "GET"
    smsrow = out[out.type == "smsmt"].iloc[0]
    assert smsrow.imsi == "33401" and smsrow.msc == "mscB" and smsrow.udhi == False  # noqa: E712
