"""Property test: random display-filter ASTs must agree with a
direct three-valued-logic reference evaluation, including wireshark
NULL semantics (comparisons on absent fields are unknown → dropped;
``not`` treats unknown as false → keeps absent-field rows)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ingestor_etl_spark.operators.displayfilter import filter_messages

ROWS = [
    # frame, cmd, session, src
    (1, 272, "s;1", "10.0.0.1"),
    (2, 272, None, "10.0.0.2"),
    (3, 280, "s;2", None),
    (4, None, "s;2", "10.9.0.7"),
    (5, 316, "x", "10.9.0.7"),
    (6, None, None, None),
]

INT_FIELDS = {"command_code": 1, "frame_no": 0}
STR_FIELDS = {"session_id": 2, "src_ip": 3}

int_leaf = st.tuples(
    st.sampled_from(sorted(INT_FIELDS)),
    st.sampled_from(["==", "!=", "<", ">", "<=", ">="]),
    st.sampled_from([272, 280, 316, 3, 0x134]),
)
str_leaf = st.tuples(
    st.sampled_from(sorted(STR_FIELDS)),
    st.sampled_from(["==", "!=", "contains"]),
    st.sampled_from(["s;1", "s;2", "10.0", "x", "zzz"]),
)
exists_leaf = st.tuples(
    st.sampled_from(sorted(INT_FIELDS | STR_FIELDS.keys())),
    st.just("exists"),
    st.none(),
)
in_leaf = st.tuples(
    st.just("command_code"),
    st.just("in"),
    st.lists(st.sampled_from([272, 280, 316, 3]), min_size=1, max_size=3),
)
leaf = st.one_of(int_leaf, str_leaf, exists_leaf, in_leaf)

ast = st.recursive(
    leaf,
    lambda kids: st.one_of(
        st.tuples(st.just("not"), kids),
        st.tuples(st.just("and"), kids, kids),
        st.tuples(st.just("or"), kids, kids),
    ),
    max_leaves=6,
)


def render(node) -> str:
    if node[0] == "not":
        return f"!({render(node[1])})"
    if node[0] in ("and", "or"):
        op = "&&" if node[0] == "and" else "||"
        return f"({render(node[1])} {op} {render(node[2])})"
    field, op, val = node
    if op == "exists":
        return field
    if op == "in":
        return f"{field} in {{{' '.join(str(v) for v in val)}}}"
    if isinstance(val, str):
        return f'{field} == "{val}"' if op == "==" else f'{field} {op} "{val}"'
    return f"{field} {op} {val}"


def ref_eval(node, row):
    """Kleene 3VL: True / False / None(unknown)."""
    kind = node[0]
    if kind == "not":
        inner = ref_eval(node[1], row)
        return not bool(inner)  # unknown → treated false, negated true
    if kind in ("and", "or"):
        a, b = ref_eval(node[1], row), ref_eval(node[2], row)
        if kind == "and":
            if a is False or b is False:
                return False
            if a is None or b is None:
                return None
            return True
        if a is True or b is True:
            return True
        if a is None or b is None:
            return None
        return False
    field, op, val = node
    idx = INT_FIELDS.get(field, STR_FIELDS.get(field))
    cell = row[idx]
    if op == "exists":
        return cell is not None
    if cell is None:
        return None
    if op == "in":
        return cell in val
    if op == "contains":
        return val in cell
    return {
        "==": cell == val,
        "!=": cell != val,
        "<": cell < val,
        ">": cell > val,
        "<=": cell <= val,
        ">=": cell >= val,
    }[op]


@pytest.fixture(scope="module")
def msgs(spark):
    return spark.createDataFrame(
        ROWS,
        "frame_no int, command_code int, session_id string, src_ip string",
    )


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=ast)
def test_compiled_filter_matches_reference(msgs, tree):
    expr = render(tree)
    got = sorted(r.frame_no for r in filter_messages(msgs, expr).collect())
    want = sorted(
        row[0] for row in ROWS if ref_eval(tree, row) is True
    )
    assert got == want, expr
