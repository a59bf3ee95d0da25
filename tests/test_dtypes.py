import datetime as dt

import pyarrow as pa
import pytest

from tbl_ray.dtypes import (
    DtypeError,
    constant_array,
    parse_dtype,
    parse_literal,
)


def test_parse_dtype_vocabulary():
    assert parse_dtype("i8") == pa.int8()
    assert parse_dtype("i64") == pa.int64()
    assert parse_dtype("u32") == pa.uint32()
    assert parse_dtype("f64") == pa.float64()
    assert parse_dtype("bool") == pa.bool_()
    assert parse_dtype("str") == pa.string()
    assert parse_dtype("binary") == pa.binary()
    assert parse_dtype("date") == pa.date32()
    assert parse_dtype("datetime") == pa.timestamp("us")


def test_parse_dtype_unknown():
    with pytest.raises(DtypeError):
        parse_dtype("decimal")


def test_int_literals_decimal_and_hex():
    assert parse_literal("42", pa.int64()) == 42
    assert parse_literal("0xff", pa.int64()) == 255
    assert parse_literal("-7", pa.int32()) == -7
    with pytest.raises(DtypeError):
        parse_literal("nope", pa.int64())


def test_binary_literals_require_hex():
    assert parse_literal("0xdeadbeef", pa.binary()) == bytes.fromhex("deadbeef")
    with pytest.raises(DtypeError):
        parse_literal("deadbeef", pa.binary())


def test_bool_and_null_literals():
    assert parse_literal("true", pa.bool_()) is True
    assert parse_literal("False", pa.bool_()) is False
    assert parse_literal("null", pa.int64()) is None


def test_date_datetime_literals():
    assert parse_literal("2024-01-31", pa.date32()) == dt.date(2024, 1, 31)
    assert parse_literal("2024-01-31 12:30:00", pa.timestamp("us")) == dt.datetime(
        2024, 1, 31, 12, 30, 0
    )
    # bare date accepted for datetime
    assert parse_literal("2024-01-31", pa.timestamp("us")) == dt.datetime(2024, 1, 31)


def test_constant_array_and_nulls():
    arr = constant_array("5", pa.int64(), 3)
    assert arr.to_pylist() == [5, 5, 5]
    nulls = constant_array(None, pa.string(), 2)
    assert nulls.null_count == 2
    assert nulls.type == pa.string()
