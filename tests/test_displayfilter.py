"""Display-filter string compiler (reference sigshark.py:557-576:
arbitrary wireshark -Y filter strings select frames; transactions
with ≥1 matching frame survive). Here the same strings compile to
native Catalyst predicates over the decoded message tables."""

from __future__ import annotations

import pytest

from ingestor_etl_spark.operators.displayfilter import (
    FilterError,
    compile_filter,
    filter_messages,
    filter_transactions_str,
)


@pytest.fixture(scope="module")
def msgs(spark):
    rows = [
        # frame, cmd, session, src, result, request
        (1, 272, "s;1", "10.0.0.1", None, True),
        (2, 272, "s;1", "10.0.0.2", 2001, False),
        (3, 280, None, "10.0.0.1", None, True),
        (4, 316, "s;2", "10.9.0.7", 5030, False),
    ]
    return spark.createDataFrame(
        rows, "frame_no int, command_code int, session_id string, "
              "src_ip string, result_code int, request boolean"
    )


def _frames(msgs, expr):
    return sorted(r.frame_no for r in filter_messages(msgs, expr).collect())


def test_eq_and_mapped_names(msgs):
    assert _frames(msgs, "diameter.cmd.code == 272") == [1, 2]
    assert _frames(msgs, "diameter.cmd.code eq 280") == [3]


def test_hex_and_comparisons(msgs):
    assert _frames(msgs, "diameter.Result-Code >= 0x7D1") == [2, 4]
    assert _frames(msgs, "frame.number < 3 && diameter.cmd.code != 280") == [1, 2]


def test_bool_flag_as_int(msgs):
    assert _frames(msgs, "diameter.flags.request == 1") == [1, 3]
    assert _frames(msgs, "diameter.flags.request == 0") == [2, 4]


def test_contains_matches_in(msgs):
    assert _frames(msgs, 'diameter.Session-Id contains "s;"') == [1, 2, 4]
    assert _frames(msgs, 'ip.src matches "^10\\.9\\."') == [4]
    assert _frames(msgs, "diameter.cmd.code in {280 316}") == [3, 4]


def test_existence_and_not_null_semantics(msgs):
    assert _frames(msgs, "diameter.Session-Id") == [1, 2, 4]
    # wireshark: !(f == v) also keeps frames where f is absent
    assert _frames(msgs, '!(diameter.Session-Id == "s;1")') == [3, 4]
    assert _frames(msgs, "not diameter.Result-Code") == [1, 3]


def test_precedence_and_parens(msgs):
    # and binds tighter than or
    assert _frames(
        msgs, "diameter.cmd.code == 316 or diameter.cmd.code == 272 "
              "and diameter.flags.request == 1"
    ) == [1, 4]
    assert _frames(
        msgs, "(diameter.cmd.code == 316 or diameter.cmd.code == 272) "
              "&& diameter.flags.request == 0"
    ) == [2, 4]


def test_quoted_strings_and_direct_columns(msgs):
    assert _frames(msgs, "src_ip == '10.0.0.2'") == [2]
    assert _frames(msgs, 'session_id == "s;2"') == [4]


def test_compile_errors(msgs):
    for bad in (
        "",
        "nosuch.field == 1",
        "diameter.cmd.code ==",
        "(diameter.cmd.code == 1",
        "diameter.cmd.code in {}",
        "diameter.cmd.code == 1 extra,,,",
    ):
        with pytest.raises(FilterError):
            compile_filter(bad, set(msgs.columns))


def test_filter_is_native_plan(msgs):
    """The compiled predicate must be a plain Catalyst filter —
    no Python eval in the plan."""
    plan = filter_messages(
        msgs, "diameter.cmd.code == 272 && !(ip.src contains '10.9.')"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_transaction_filter_integration(spark, tmp_path):
    from ingestor_etl_spark.operators.transactions import tcap_transactions
    from ingestor_etl_spark.protocols.gsm_map import decode_gsm_map
    from ingestor_etl_spark.protocols.net import expand_l4
    from ingestor_etl_spark.sources.pcap import read_pcap
    from tests import pcapgen as g

    imsi = g.tbcd("334020123456789f")
    mk = lambda b: g.eth(g.ipv4(g.sctp([(0, mk.n, 3, g.m3ua(g.sccp_udt(b)))], 2905, 2905), 132))
    mk.n = 0
    frames = []
    for i, buf in enumerate([
        g.tcap_msg("begin", otid=0x11,
                   components=[g.tcap_invoke(2, g.ber(0x30, g.ber(0x04, imsi)))]),
        g.tcap_msg("end", dtid=0x11),
        g.tcap_msg("begin", otid=0x22, components=[g.tcap_invoke(45)]),
        g.tcap_msg("end", dtid=0x22),
    ]):
        mk.n = i
        frames.append((2100, i, mk(buf)))
    p = tmp_path / "two_txn.pcap"
    p.write_bytes(g.pcap(frames))
    msgs = decode_gsm_map(expand_l4(read_pcap(spark, str(p))))
    tas = tcap_transactions(msgs)
    assert tas.count() == 2

    only45 = filter_transactions_str(tas, msgs, "gsm_old.localValue == 45")
    assert [r.txn for r in only45.collect()] == [0x22]
    by_imsi = filter_transactions_str(tas, msgs, 'e212.imsi contains "33402"')
    assert [r.txn for r in by_imsi.collect()] == [0x11]
    both = filter_transactions_str(
        tas, msgs, "gsm_old.localValue == 45 || tcap.otid == 0x11"
    )
    assert sorted(r.txn for r in both.collect()) == [0x11, 0x22]


def test_cidr_subnet_comparison(msgs):
    assert _frames(msgs, "ip.src == 10.0.0.0/24") == [1, 2, 3]
    assert _frames(msgs, "ip.src == 10.9.0.0/16") == [4]
    assert _frames(msgs, "ip.src != 10.9.0.0/16") == [1, 2, 3]
    assert _frames(msgs, "ip.src == 0.0.0.0/0") == [1, 2, 3, 4]
    with pytest.raises(FilterError):
        compile_filter("ip.src > 10.0.0.0/8", {"src_ip"})
    with pytest.raises(FilterError):
        compile_filter("ip.src == 10.0.0.0/40", {"src_ip"})


def test_protocol_presence_single_protocol_table(msgs):
    """Bare protocol name = layer presence. The diameter fixture has
    command_code on every row → `diameter` matches all; `sip` has no
    indicator column in this schema → matches none; `ip` keys on
    src/dst ip columns."""
    assert _frames(msgs, "diameter") == [1, 2, 3, 4]
    assert _frames(msgs, "sip") == []
    assert _frames(msgs, "ip") == [1, 2, 3, 4]
    assert _frames(msgs, "diameter && diameter.cmd.code == 280") == [3]
    assert _frames(msgs, "sip || diameter.cmd.code == 316") == [4]
    assert _frames(msgs, "not sip") == [1, 2, 3, 4]


def test_protocol_presence_with_protocol_column(spark):
    df = spark.createDataFrame(
        [(1, "diameter"), (2, "sip"), (3, "sip")],
        "frame_no int, protocol string",
    )
    got = sorted(r.frame_no for r in filter_messages(df, "sip").collect())
    assert got == [2, 3]
    got = sorted(r.frame_no for r in filter_messages(df, "diameter").collect())
    assert got == [1]


def test_len_upper_lower_functions(msgs):
    assert _frames(msgs, "len(diameter.Session-Id) == 3") == [1, 2, 4]
    assert _frames(msgs, 'upper(ip.src) contains "10.9"') == [4]
    assert _frames(msgs, 'lower(diameter.Session-Id) == "s;2"') == [4]
    # composition
    assert _frames(msgs, "len(upper(diameter.Session-Id)) eq 3") == [1, 2, 4]


def test_slices(msgs):
    # [i:n] = offset+LENGTH (wireshark), [i] single char, [i-j] range
    assert _frames(msgs, 'ip.src[0:4] == "10.0"') == [1, 2, 3]
    assert _frames(msgs, 'ip.src[3] == "9"') == [4]
    assert _frames(msgs, 'ip.src[0-1] == "10"') == [1, 2, 3, 4]
    assert _frames(msgs, 'len(diameter.Session-Id[0:1]) == 1') == [1, 2, 4]
    for bad in ("ip.src[2-1] == 'x'", "ip.src[a] == 'x'", "ip.src[1:b] == 'x'"):
        with pytest.raises(FilterError):
            compile_filter(bad, set(msgs.columns))


def test_new_forms_stay_native(msgs):
    plan = filter_messages(
        msgs, 'diameter && len(diameter.Session-Id) == 3 && ip.src[0:2] == "10"'
    )._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_protocol_name_as_column_still_wins(spark):
    """A real column named like a protocol is a field, not a layer."""
    df = spark.createDataFrame([(1, "x"), (2, None)], "frame_no int, sip string")
    got = sorted(r.frame_no for r in filter_messages(df, "sip").collect())
    assert got == [1]  # existence of the COLUMN, not layer-absence


def test_in_set_with_ranges(msgs):
    assert _frames(msgs, "diameter.cmd.code in {270..275}") == [1, 2]
    assert _frames(msgs, "diameter.cmd.code in {270..275 316}") == [1, 2, 4]
    assert _frames(msgs, "frame.number in {2..3 1}") == [1, 2, 3]
    with pytest.raises(FilterError):
        compile_filter("diameter.cmd.code in {275..270}", set(msgs.columns))
