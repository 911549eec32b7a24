"""Wireshark-style display-filter strings → native Spark predicates.

The reference accepts an arbitrary display-filter string and shells
out to tshark to evaluate it against each frame (sigshark.py:557-576
``filter_pcap``: ``tshark -Y '<filter_exp>'`` → matching frame
numbers; transactions keeping ≥1 matching frame survive). This
module closes that gap Spark-first: a recursive-descent parser
compiles the same filter syntax into a ``pyspark.sql.Column``
boolean expression over the DECODED message tables, so the filter
runs inside whole-stage codegen, is push-down-able into the scan,
and never leaves the JVM — no subprocess, no per-frame Python.

Supported syntax (the subset covering the reference's documented
usage — field comparisons over decoded protocol fields):

- comparisons: ``==  eq  !=  ne  >  gt  <  lt  >=  ge  <=  le``
- ``contains`` (substring), ``matches`` / ``~`` (regex)
- membership: ``field in {v1 v2 v3}`` including wireshark ranges
  ``field in {2000..2010 5060}``
- field existence: a bare field name is "field is present"
- protocol presence: a bare PROTOCOL name (``diameter``, ``sip``,
  ``tcap``…) is "this layer was decoded" — true when the row's
  ``protocol`` column equals the name, or (single-protocol decoded
  tables) when any of the layer's indicator fields is non-null
  (``PROTOCOL_FIELDS``); a protocol whose indicators are absent
  from the schema compiles to FALSE, like tshark on a frame with
  no such layer.
- functions: ``len(f)``, ``upper(f)``, ``lower(f)`` (tshark's
  string functions), composable: ``len(upper(f)) > 3``
- slices: ``f[i]``, ``f[i:n]`` (offset + LENGTH, wireshark
  semantics), ``f[i-j]`` (inclusive range) — evaluated over the
  engine's string-typed decoded columns (character slices; the
  reference's raw byte-slices don't exist post-decode — documented
  deviation)
- boolean: ``and  &&  or  ||  not  !`` and parentheses
- values: decimal / 0x-hex integers, floats, quoted strings
  (single or double), bare words (IPv4 literals etc.)

Field names resolve through a protocol field map (wireshark name →
engine column, e.g. ``diameter.cmd.code`` → ``command_code``); any
name not in the map but present in the DataFrame is used as a
column directly. Unknown fields raise ``FilterError`` at compile
time (tshark would likewise reject the filter before running).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class FilterError(ValueError):
    """Malformed filter string or unknown field name."""


# wireshark field name → engine column for the decoded tables.
# Keys cover the fields the reference extracts via tshark -e
# (sigshark.py:380-429) plus the identity fields this engine decodes.
FIELD_MAP: dict[str, str] = {
    "frame.number": "frame_no",
    "ip.src": "src_ip",
    "ip.dst": "dst_ip",
    # tcap / sccp (sigshark's -e field list)
    "tcap.otid": "tcap_otid",
    "tcap.dtid": "tcap_dtid",
    "tcap.tid": "tcap_tid",
    "sccp.calling.digits": "sccp_calling",
    "sccp.called.digits": "sccp_called",
    "gsm_old.localValue": "gsm_op_code",
    "gsm_map.old.localValue": "gsm_op_code",
    # diameter
    "diameter.cmd.code": "command_code",
    "diameter.hopbyhopid": "hop_by_hop_id",
    "diameter.endtoendid": "end_to_end_id",
    "diameter.Session-Id": "session_id",
    "diameter.Result-Code": "result_code",
    "diameter.Origin-Host": "origin_host",
    "diameter.applicationId": "application_id",
    # identities
    "e212.imsi": "imsi",
    "e164.msisdn": "msisdn",
    # sip
    "sip.Method": "method",
    "sip.Call-ID": "call_id",
    "sip.Status-Code": "status_code",
    # gtp
    "gtpv2.message_type": "message_type",
    "gtp.teid": "teid",
    # smpp
    "smpp.command_id": "command_id",
    "smpp.sequence_number": "sequence_number",
}

# fields whose engine column is boolean but whose wireshark form
# compares against 0/1 (e.g. diameter.flags.request == 1)
_BOOL_AS_INT = {"diameter.flags.request": "request"}

# protocol-layer presence: bare `diameter` / `sip` etc. With a
# `protocol` column (multi-protocol message logs) presence is an
# equality on it; on single-protocol decoded tables it falls back to
# "any indicator field of the layer is non-null". Indicator lists
# mirror what each decoder emits (protocols/*.py).
PROTOCOL_FIELDS: dict[str, tuple[str, ...]] = {
    "diameter": ("command_code", "hop_by_hop_id", "end_to_end_id"),
    "sip": ("method", "call_id", "status_code"),
    "tcap": ("tcap_otid", "tcap_dtid", "tcap_tid"),
    "gsm_map": ("gsm_op_code",),
    "sccp": ("sccp_calling", "sccp_called"),
    "gtp": ("teid",),
    "gtpv2": ("message_type",),
    "smpp": ("command_id", "sequence_number"),
    "http": ("http_is_request",),
    "ip": ("src_ip", "dst_ip"),
}

# tshark string functions → Spark builtins (column-in, column-out)
_FUNCS = {"len": F.length, "upper": F.upper, "lower": F.lower}

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<lbrace>\{) | (?P<rbrace>\}) |
        (?P<lbracket>\[) | (?P<rbracket>\]) |
        (?P<colon>:) |
        (?P<op>==|!=|>=|<=|>|<|~) |
        (?P<dquote>"(?:[^"\\]|\\.)*") |
        (?P<squote>'(?:[^'\\]|\\.)*') |
        (?P<bang>!) |
        (?P<amp>&&) | (?P<pipe>\|\|) |
        (?P<cidr>\d+\.\d+\.\d+\.\d+/\d+) |
        (?P<word>[A-Za-z0-9_.\-]+)
    )""",
    re.X,
)

_WORD_OPS = {"eq": "==", "ne": "!=", "gt": ">", "lt": "<", "ge": ">=", "le": "<="}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == m.start():
            rest = text[pos:].strip()
            if not rest:
                break
            raise FilterError(f"cannot tokenize at: {rest[:30]!r}")
        pos = m.end()
        kind = m.lastgroup
        tok = m.group(kind)
        if kind in ("dquote", "squote"):
            body = tok[1:-1]
            out.append(("str", re.sub(r"\\(.)", r"\1", body)))
        elif kind == "op":
            out.append(("op", tok))
        elif kind == "bang":
            out.append(("not", "!"))
        elif kind == "amp":
            out.append(("and", "&&"))
        elif kind == "pipe":
            out.append(("or", "||"))
        elif kind == "cidr":
            out.append(("cidr", tok))
        elif kind == "word":
            low = tok.lower()
            if low in ("and", "or", "not", "contains", "matches", "in"):
                out.append((low, tok))
            elif low in _WORD_OPS:
                out.append(("op", _WORD_OPS[low]))
            else:
                out.append(("word", tok))
        else:
            out.append((kind, tok))
    return out


class _Parser:
    """or → and → not → primary; predicates bind tighter than bools."""

    def __init__(self, tokens: list[tuple[str, str]], columns: set[str],
                 field_map: dict[str, str], bool_as_int: dict[str, str]):
        self.toks = tokens
        self.i = 0
        self.columns = columns
        self.field_map = field_map
        self.bool_as_int = bool_as_int

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, kind: str | None = None) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise FilterError("unexpected end of filter")
        if kind is not None and t[0] != kind:
            raise FilterError(f"expected {kind}, got {t[1]!r}")
        self.i += 1
        return t

    def parse(self) -> Column:
        col = self.or_expr()
        if self.peek() is not None:
            raise FilterError(f"trailing input: {self.peek()[1]!r}")
        return col

    def or_expr(self) -> Column:
        left = self.and_expr()
        while (t := self.peek()) and t[0] == "or":
            self.take()
            left = left | self.and_expr()
        return left

    def and_expr(self) -> Column:
        left = self.not_expr()
        while (t := self.peek()) and t[0] == "and":
            self.take()
            left = left & self.not_expr()
        return left

    def not_expr(self) -> Column:
        if (t := self.peek()) and t[0] == "not":
            self.take()
            inner = self.not_expr()
            # wireshark `!(f == v)` keeps frames where the field is
            # absent too; SQL three-valued logic would drop NULLs.
            return ~F.coalesce(inner, F.lit(False))
        return self.primary()

    def primary(self) -> Column:
        t = self.peek()
        if t is None:
            raise FilterError("unexpected end of filter")
        if t[0] == "lparen":
            self.take()
            inner = self.or_expr()
            self.take("rparen")
            return inner
        return self.predicate()

    # ---------------------------------------------------- predicates
    def field(self, name: str) -> Column:
        if name in self.bool_as_int:
            return F.col(self.bool_as_int[name]).cast("int")
        mapped = self.field_map.get(name, name)
        if self.columns and mapped not in self.columns:
            raise FilterError(f"unknown field: {name!r}")
        return F.col(mapped)

    def value(self) -> object:
        kind, tok = self.take()
        if kind == "str":
            return tok
        if kind == "cidr":
            return _Cidr(tok)
        if kind != "word":
            raise FilterError(f"expected a value, got {tok!r}")
        return _coerce(tok)

    def _is_protocol(self, name: str) -> bool:
        """A bare protocol name — only when it doesn't resolve to a
        real field (a column named like a protocol wins)."""
        low = name.lower()
        if low not in PROTOCOL_FIELDS:
            return False
        mapped = self.field_map.get(name, name)
        return not (self.columns and mapped in self.columns)

    def _protocol_presence(self, low: str) -> Column:
        if "protocol" in self.columns:
            return F.col("protocol") == low
        fields = PROTOCOL_FIELDS[low]
        cols = [c for c in fields if c in self.columns] if self.columns else [fields[0]]
        if not cols:
            # schema has no trace of this layer: no frame matches
            return F.lit(False)
        pred = F.col(cols[0]).isNotNull()
        for c in cols[1:]:
            pred = pred | F.col(c).isNotNull()
        return pred

    def term(self) -> Column:
        """function application / field reference / slice."""
        kind, name = self.take("word")
        low = name.lower()
        if low in _FUNCS and (t := self.peek()) and t[0] == "lparen":
            self.take()
            inner = self.term()
            self.take("rparen")
            col = _FUNCS[low](inner)
        else:
            col = self.field(name)
        if (t := self.peek()) and t[0] == "lbracket":
            col = self._slice(col)
        return col

    def _slice(self, col: Column) -> Column:
        """Wireshark slice forms: [i] byte, [i:n] offset+length,
        [i-j] inclusive range — as character slices on the decoded
        string columns."""
        self.take("lbracket")
        _, tok = self.take("word")
        if re.fullmatch(r"\d+-\d+", tok):
            i, j = (int(x) for x in tok.split("-"))
            if j < i:
                raise FilterError(f"bad slice range: {tok!r}")
            off, length = i, j - i + 1
        elif re.fullmatch(r"\d+", tok):
            off = int(tok)
            if (t := self.peek()) and t[0] == "colon":
                self.take()
                _, ltok = self.take("word")
                if not re.fullmatch(r"\d+", ltok):
                    raise FilterError(f"bad slice length: {ltok!r}")
                length = int(ltok)
            else:
                length = 1
        else:
            raise FilterError(f"bad slice: {tok!r}")
        self.take("rbracket")
        return F.substring(col.cast("string"), off + 1, length)

    def predicate(self) -> Column:
        if (t := self.peek()) and t[0] == "word" and self._is_protocol(t[1]):
            nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
            if nxt is None or nxt[0] in ("and", "or", "rparen"):
                self.take()
                return self._protocol_presence(t[1].lower())
        col = self.term()
        t = self.peek()
        if t is None or t[0] in ("and", "or", "rparen"):
            return col.isNotNull()  # bare field = existence test
        if t[0] == "op":
            op = self.take()[1]
            val = self.value()
            if isinstance(val, _Cidr):
                # wireshark subnet comparison: ip.src == 10.0.0.0/8
                if op == "==":
                    return val.contains(col)
                if op == "!=":
                    return ~val.contains(col)
                raise FilterError(f"CIDR supports ==/!= only, not {op}")
            return {
                "==": col.__eq__, "!=": col.__ne__,
                ">": col.__gt__, "<": col.__lt__,
                ">=": col.__ge__, "<=": col.__le__,
                "~": lambda v: col.rlike(str(v)),
            }[op](val)
        if t[0] == "contains":
            self.take()
            return col.contains(str(self.value()))
        if t[0] == "matches":
            self.take()
            return col.rlike(str(self.value()))
        if t[0] == "in":
            self.take()
            self.take("lbrace")
            vals: list[object] = []
            ranges: list[tuple[int, int]] = []
            while (t := self.peek()) and t[0] != "rbrace":
                # wireshark range member: {2000..2010}
                if t[0] == "word" and re.fullmatch(r"\d+\.\.\d+", t[1]):
                    self.take()
                    lo, hi = (int(x) for x in t[1].split(".."))
                    if hi < lo:
                        raise FilterError(f"bad range: {t[1]!r}")
                    ranges.append((lo, hi))
                else:
                    vals.append(self.value())
            self.take("rbrace")
            if not vals and not ranges:
                raise FilterError("empty in-set")
            pred = col.isin(vals) if vals else F.lit(False)
            for lo, hi in ranges:
                pred = pred | ((col >= lo) & (col <= hi))
            return pred
        raise FilterError(f"expected an operator after {name!r}, got {t[1]!r}")


class _Cidr:
    """CIDR literal (``10.0.0.0/8``) — compiles to the same native
    bit-arithmetic as operators.transactions.exclude_cidrs (O4), so
    subnet filters stay inside codegen too."""

    def __init__(self, tok: str):
        base, _, bits = tok.partition("/")
        bits = int(bits)
        if not 0 <= bits <= 32:
            raise FilterError(f"bad CIDR mask: {tok!r}")
        self.mask = ((1 << 32) - 1) ^ ((1 << (32 - bits)) - 1)
        self.base = (
            sum(int(o) << (8 * (3 - i)) for i, o in enumerate(base.split(".")))
            & self.mask
        )

    def contains(self, col: Column) -> Column:
        from ingestor_etl_spark.operators.transactions import ip_to_long

        return ip_to_long(col).bitwiseAND(F.lit(self.mask)) == F.lit(self.base)


def _coerce(tok: str) -> object:
    """Bare word → int (dec/hex) / float / string (IPs stay strings)."""
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    if re.fullmatch(r"0[xX][0-9a-fA-F]+", tok):
        return int(tok, 16)
    if re.fullmatch(r"-?\d+\.\d+", tok) and tok.count(".") == 1:
        return float(tok)
    return tok


def compile_filter(
    expr: str,
    columns: set[str] | None = None,
    field_map: dict[str, str] | None = None,
) -> Column:
    """Display-filter string → boolean ``Column``.

    ``columns`` (when given) validates field references at compile
    time; ``field_map`` overrides/extends the default wireshark-name
    mapping. The result is a pure Catalyst expression tree —
    filters compiled here push down like any hand-written
    ``.where()``."""
    fmap = dict(FIELD_MAP)
    if field_map:
        fmap.update(field_map)
    toks = _tokenize(expr)
    if not toks:
        raise FilterError("empty filter")
    return _Parser(toks, columns or set(), fmap, _BOOL_AS_INT).parse()


def filter_messages(messages: DataFrame, expr: str,
                    field_map: dict[str, str] | None = None) -> DataFrame:
    """Decoded-message rows matching a display-filter string."""
    return messages.where(
        compile_filter(expr, set(messages.columns), field_map)
    )


def filter_transactions_str(
    transactions: DataFrame,
    messages: DataFrame,
    expr: str,
    field_map: dict[str, str] | None = None,
) -> DataFrame:
    """J7 general form (reference sigshark.py:557-576): keep every
    transaction with ≥1 member frame matching the filter string.

    The filter evaluates on the decoded message table (native
    predicate, pushes into the message scan); matching (file,
    frame_no) pairs then left-semi join the transactions' exploded
    frame lists — same shape as ``filter_transactions``, so the
    shuffle is one exchange on (file, frame_no) and the assembled
    transaction rows pass through whole."""
    from ingestor_etl_spark.operators.transactions import filter_transactions

    matched = filter_messages(messages, expr, field_map)
    frames = (
        matched.select("file", F.explode("frames_list").alias("frame_no"))
        if "frames_list" in matched.columns
        else matched.select("file", "frame_no")
    )
    return filter_transactions(transactions, frames.dropDuplicates())
