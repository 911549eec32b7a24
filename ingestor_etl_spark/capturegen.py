"""Synthetic packet-capture builders (pure struct.pack).

Deterministic inputs for the protocol layer: craft minimal but
well-formed frames bottom-up (L2→L7) and wrap them in classic-pcap
or pcapng containers. No randomness, no external tools. Used by the
golden tests (tests/) and by the registered protocol demo queries
(queries/protocol_ops.py), which must produce byte-identical
captures on every run so their outputs are oracle-stable.
"""

from __future__ import annotations

import struct


# ---------------------------------------------------------------- containers
def pcap(
    frames: list[tuple[int, int, bytes]],
    dlt: int = 1,
    nsec: bool = False,
    big_endian: bool = False,
) -> bytes:
    """frames = [(ts_sec, ts_frac, payload)] → classic pcap."""
    magic = 0xA1B23C4D if nsec else 0xA1B2C3D4
    e = ">" if big_endian else "<"
    out = [struct.pack(e + "IHHiIII", magic, 2, 4, 0, 0, 65535, dlt)]
    for ts_sec, ts_frac, payload in frames:
        out.append(struct.pack(e + "4I", ts_sec, ts_frac, len(payload), len(payload)))
        out.append(payload)
    return b"".join(out)


def pcapng(
    frames: list[tuple[int, bytes]],
    dlt: int = 1,
    tsresol: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """frames = [(ts_us, payload)] → pcapng with one interface.

    ``tsresol`` is the raw if_tsresol option byte (e.g. 9 → 10^-9);
    timestamps in ``frames`` are ALWAYS microseconds and are scaled
    into the interface resolution here."""
    e = ">" if big_endian else "<"

    def block(btype: int, body: bytes) -> bytes:
        pad = (-len(body)) % 4
        total = 12 + len(body) + pad
        return (
            struct.pack(e + "II", btype, total) + body + b"\x00" * pad + struct.pack(e + "I", total)
        )

    shb = block(0x0A0D0D0A, struct.pack(e + "IHHq", 0x1A2B3C4D, 1, 0, -1))
    options = b""
    per_sec = 1_000_000
    if tsresol is not None:
        options = struct.pack(e + "HHB3x", 9, 1, tsresol) + struct.pack(e + "HH", 0, 0)
        per_sec = 2 ** (tsresol & 0x7F) if tsresol & 0x80 else 10 ** (tsresol & 0x7F)
    idb = block(1, struct.pack(e + "HHI", dlt, 0, 65535) + options)
    out = [shb, idb]
    for ts_us, payload in frames:
        ticks = ts_us * per_sec // 1_000_000
        body = struct.pack(
            e + "IIIII", 0, ticks >> 32, ticks & 0xFFFFFFFF, len(payload), len(payload)
        ) + payload
        out.append(block(6, body))
    return b"".join(out)


# ---------------------------------------------------------------- L2-L4
def _aton(ip: str) -> bytes:
    return bytes(int(o) for o in ip.split("."))


def eth(payload: bytes, ethertype: int = 0x0800) -> bytes:
    return b"\x02" * 6 + b"\x04" * 6 + struct.pack("!H", ethertype) + payload


def ipv4(
    payload: bytes,
    proto: int,
    src: str = "10.0.0.1",
    dst: str = "10.0.0.2",
    ident: int = 0,
    more_frags: bool = False,
    frag_off: int = 0,
) -> bytes:
    flags_frag = (0x2000 if more_frags else 0) | (frag_off >> 3)
    hdr = struct.pack(
        "!BBHHHBBH4s4s",
        0x45,
        0,
        20 + len(payload),
        ident,
        flags_frag,
        64,
        proto,
        0,
        _aton(src),
        _aton(dst),
    )
    return hdr + payload


def tcp(
    payload: bytes,
    sport: int,
    dport: int,
    seq: int = 1,
    ack: int = 1,
    flags: int = 24,
) -> bytes:
    hdr = struct.pack("!HHIIBBHHH", sport, dport, seq, ack, 5 << 4, flags, 8192, 0, 0)
    return hdr + payload


def udp(payload: bytes, sport: int, dport: int) -> bytes:
    return struct.pack("!HHHH", sport, dport, 8 + len(payload), 0) + payload


def sctp(chunks: list[tuple[int, int, int, bytes]], sport: int, dport: int) -> bytes:
    """chunks = [(sid, ssn, ppid, payload)] → SCTP packet of DATA chunks."""
    out = [struct.pack("!HHII", sport, dport, 1, 0)]
    for i, (sid, ssn, ppid, payload) in enumerate(chunks):
        clen = 16 + len(payload)
        out.append(struct.pack("!BBHIHHI", 0, 3, clen, 100 + i, sid, ssn, ppid))
        out.append(payload + b"\x00" * ((-len(payload)) % 4))
    return b"".join(out)


def sctp_control(chunk_type: int, sport: int = 1, dport: int = 2) -> bytes:
    """A non-DATA SCTP chunk (INIT=1, INIT_ACK=2, SHUTDOWN=14...)."""
    return struct.pack("!HHII", sport, dport, 1, 0) + struct.pack("!BBH", chunk_type, 0, 4)


# ---------------------------------------------------------------- Diameter
def diameter_avp(code: int, data: bytes, vendor: int | None = None) -> bytes:
    flags = 0x80 if vendor is not None else 0x40
    hdr_len = 12 if vendor is not None else 8
    alen = hdr_len + len(data)
    hdr = struct.pack("!I", code) + bytes([flags]) + struct.pack("!I", alen)[1:]
    if vendor is not None:
        hdr += struct.pack("!I", vendor)
    return hdr + data + b"\x00" * ((-alen) % 4)


def diameter_msg(
    cmd: int,
    request: bool,
    hbh: int,
    e2e: int,
    avps: list[bytes],
    app_id: int = 16777251,
) -> bytes:
    body = b"".join(avps)
    length = 20 + len(body)
    flags = 0x80 if request else 0x00
    return (
        b"\x01"
        + struct.pack("!I", length)[1:]
        + bytes([flags])
        + struct.pack("!I", cmd)[1:]
        + struct.pack("!III", app_id, hbh, e2e)
        + body
    )


def subscription_id(sub_type: int, value: str) -> bytes:
    """Grouped Subscription-Id AVP: 450 (type) + 444 (data)."""
    inner = diameter_avp(450, struct.pack("!I", sub_type)) + diameter_avp(
        444, value.encode()
    )
    return diameter_avp(443, inner)


# ---------------------------------------------------------------- GTP
def gtpv1(msg_type: int, teid: int, seq: int, ies: bytes = b"") -> bytes:
    body = struct.pack("!HBB", seq, 0, 0) + ies
    return struct.pack("!BBHI", 0x32, msg_type, len(body), teid) + body


def gtpv2(msg_type: int, teid: int, seq: int, ies: bytes = b"") -> bytes:
    body = struct.pack("!I", seq << 8) + ies
    return struct.pack("!BBH", 0x48, msg_type, 8 + len(body)) + struct.pack("!I", teid) + body


def tbcd(digits: str) -> bytes:
    """Telephony BCD: nibble-swapped pairs, 0xf filler on odd length."""
    if len(digits) % 2:
        digits += "f"
    return bytes(int(digits[i + 1] + digits[i], 16) for i in range(0, len(digits), 2))


def gtpv1_ie_tv(ie_type: int, data: bytes) -> bytes:
    return bytes([ie_type]) + data


def gtpv2_ie(ie_type: int, data: bytes) -> bytes:
    return struct.pack("!BHB", ie_type, len(data), 0) + data


# ---------------------------------------------------------------- SS7 / TCAP
def ber(tag: int, content: bytes) -> bytes:
    n = len(content)
    if n < 0x80:
        return bytes([tag, n]) + content
    lb = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([tag, 0x80 | len(lb)]) + lb + content


def tcap_invoke(opcode: int, param: bytes = b"", invoke_id: int = 1) -> bytes:
    return ber(0xA1, ber(0x02, bytes([invoke_id])) + ber(0x02, bytes([opcode])) + param)


def tcap_return_result(opcode: int, param: bytes = b"", invoke_id: int = 1) -> bytes:
    return ber(0xA2, ber(0x02, bytes([invoke_id])) + ber(0x30, ber(0x02, bytes([opcode])) + param))


def tcap_return_error(errcode: int, invoke_id: int = 1) -> bytes:
    return ber(0xA3, ber(0x02, bytes([invoke_id])) + ber(0x02, bytes([errcode])))


def tcap_msg(
    mess_type: str,
    otid: int | None = None,
    dtid: int | None = None,
    components: list[bytes] = (),
    dialogue_result: int | None = None,
) -> bytes:
    tags = {"unidirectional": 0x61, "begin": 0x62, "end": 0x64, "continue": 0x65, "abort": 0x67}
    body = b""
    if otid is not None:
        body += ber(0x48, struct.pack("!I", otid))
    if dtid is not None:
        body += ber(0x49, struct.pack("!I", dtid))
    if dialogue_result is not None:
        body += ber(0x6B, ber(0x28, ber(0x61, ber(0xA2, ber(0x02, bytes([dialogue_result]))))))
    if components:
        body += ber(0x6C, b"".join(components))
    return ber(tags[mess_type], body)


def sccp_udt(tcap: bytes, called: bytes = b"\x42\x08", calling: bytes = b"\x43\x09") -> bytes:
    params = bytes([len(called)]) + called + bytes([len(calling)]) + calling
    p_called = 5
    p_calling = p_called + 1 + len(called)
    p_data = p_calling + 1 + len(calling)
    hdr = bytes([9, 0, p_called - 2, p_calling - 3, p_data - 4])
    return hdr + params + bytes([len(tcap)]) + tcap


def sccp_xudt(
    tcap_part: bytes,
    first: bool,
    remaining: int,
    ref: int,
    called: bytes = b"\x42\x08",
    calling: bytes = b"\x43\x09",
) -> bytes:
    params = bytes([len(called)]) + called + bytes([len(calling)]) + calling
    p_called = 7
    p_calling = p_called + 1 + len(called)
    p_data = p_calling + 1 + len(calling)
    p_opt = p_data + 1 + len(tcap_part)
    hdr = bytes([17, 0, 15, p_called - 3, p_calling - 4, p_data - 5, p_opt - 6])
    seg = bytes([((0x80 if first else 0) | remaining)]) + ref.to_bytes(3, "big")
    optional = bytes([16, 4]) + seg + b"\x00"
    return hdr + params + bytes([len(tcap_part)]) + tcap_part + optional


def m3ua(sccp: bytes, opc: int = 101, dpc: int = 202) -> bytes:
    value = struct.pack("!2I", opc, dpc) + b"\x03\x02\x00\x00" + sccp
    plen = 4 + len(value)
    param = struct.pack("!2H", 0x0210, plen) + value + b"\x00" * ((-plen) % 4)
    total = 8 + len(param)
    return struct.pack("!BBBBI", 1, 0, 1, 1, total) + param


# ---------------------------------------------------------------- SMPP
def smpp_pdu(command_id: int, status: int, seq: int, body: bytes = b"") -> bytes:
    return struct.pack("!4I", 16 + len(body), command_id, status, seq) + body


def smpp_submit_body(src: str, dst: str, text: bytes = b"hi") -> bytes:
    return (
        b"\x00"  # service_type
        + b"\x01\x01"  # src ton/npi
        + src.encode() + b"\x00"
        + b"\x01\x01"  # dst ton/npi
        + dst.encode() + b"\x00"
        + b"\x00\x00\x00"  # esm, protocol, priority
        + b"\x00\x00"  # schedule, validity (empty C-strings)
        + b"\x00\x00\x00"  # registered, replace, data_coding
        + b"\x00"  # sm_default_msg_id
        + bytes([len(text)]) + text
    )


def sccp_gt_addr(ssn: int, digits: str, tt: int = 0) -> bytes:
    """Q.713 party address with SSN + a GTI-4 global title (TT,
    numbering plan/encoding, nature-of-address, nibble-swapped BCD
    digits, odd length padded with 0xF) — the address shape whose
    digits tshark exposes as sccp.calling.digits / sccp.called.digits."""
    ai = 0x02 | (4 << 2)  # SSN present, GTI=4, route on GT
    if len(digits) % 2:
        digits += "f"
    bcd = bytes(
        int(digits[i + 1] + digits[i], 16) for i in range(0, len(digits), 2)
    )
    return bytes([ai, ssn, tt, 0x12, 0x04]) + bcd
