import pyarrow as pa
import pytest

from tbl_ray.filters import FilterError, parse_filter


@pytest.fixture
def table():
    return pa.table(
        {
            "a": pa.array([1, 2, 3, None], type=pa.int64()),
            "s": pa.array(["x", "y", "z", None]),
            "b": pa.array([b"\x00", b"\x01", b"\x02", None], type=pa.binary()),
        }
    )


def test_substring_priority_dispatch():
    # "!=" must win over "=", ">=" over ">" etc. (transform.rs:158-182)
    f = parse_filter("a!=3")
    assert (f.column, f.op, f.raw_value) == ("a", "!=", "3")
    f = parse_filter("a>=2")
    assert f.op == ">="
    f = parse_filter("a<=2")
    assert f.op == "<="
    f = parse_filter("a=2")
    assert f.op == "="
    f = parse_filter("a>2")
    assert f.op == ">"
    f = parse_filter("a<2")
    assert f.op == "<"


def test_null_filters():
    assert parse_filter("col.is_null").op == "is_null"
    assert parse_filter("col.is_not_null").op == "is_not_null"
    with pytest.raises(FilterError):
        parse_filter("no_operator_here")


def test_masks(table):
    assert parse_filter("a>1").mask(table).to_pylist() == [False, True, True, None]
    assert parse_filter("a=2").mask(table).to_pylist() == [False, True, False, None]
    assert parse_filter("s>=y").mask(table).to_pylist() == [False, True, True, None]
    assert parse_filter("a.is_null").mask(table).to_pylist() == [
        False,
        False,
        False,
        True,
    ]
    assert parse_filter("a.is_not_null").mask(table).to_pylist() == [
        True,
        True,
        True,
        False,
    ]


def test_binary_filter_requires_hex(table):
    assert parse_filter("b=0x01").mask(table).to_pylist() == [False, True, False, None]
    with pytest.raises(FilterError):
        parse_filter("b=01").mask(table)


def test_int_hex_literal(table):
    assert parse_filter("a=0x2").mask(table).to_pylist() == [False, True, False, None]


def test_unknown_column(table):
    with pytest.raises(FilterError):
        parse_filter("zz=1").mask(table)


def test_double_equals_rejected(table):
    # "a==b" splits into 3 parts on '=' -> invalid, as in the reference
    with pytest.raises(FilterError):
        parse_filter("a==2").mask(table)
