"""Schema layer: triad-style schema expressions <-> Spark StructType
<-> pyarrow.Schema, plus Python-constant type inference.

The reference keeps schemas as ``pyarrow.Schema`` parsed from compact
expressions like ``"a:str,b:long,c:[int],d:{x:str,y:[long]}"``
(/root/reference/slide/utils.py:15-22, slide_test/suite.py:18-19).
Spark carries a ``StructType`` on every DataFrame, so this module is the
only place the two worlds meet.

Type table parity: /root/repo/SURVEY.md §1.2.
"""

from __future__ import annotations

from datetime import date, datetime
from typing import Any

import pyarrow as pa
from pyspark.sql import types as T

__all__ = [
    "parse_schema",
    "parse_type",
    "schema_to_expr",
    "spark_to_pa_schema",
    "pa_to_spark_schema",
    "spark_to_pa_type",
    "pa_to_spark_type",
    "infer_spark_type",
    "to_spark_schema",
]

# name -> (spark type, pyarrow type). Mirrors the reference's supported
# set (/root/repo/SURVEY.md §1.2); decimal/interval intentionally absent.
_PRIMITIVES: dict[str, tuple[T.DataType, pa.DataType]] = {
    "bool": (T.BooleanType(), pa.bool_()),
    "boolean": (T.BooleanType(), pa.bool_()),
    "byte": (T.ByteType(), pa.int8()),
    "int8": (T.ByteType(), pa.int8()),
    "short": (T.ShortType(), pa.int16()),
    "int16": (T.ShortType(), pa.int16()),
    "int": (T.IntegerType(), pa.int32()),
    "int32": (T.IntegerType(), pa.int32()),
    "long": (T.LongType(), pa.int64()),
    "int64": (T.LongType(), pa.int64()),
    "float32": (T.FloatType(), pa.float32()),
    "float": (T.FloatType(), pa.float32()),
    "double": (T.DoubleType(), pa.float64()),
    "float64": (T.DoubleType(), pa.float64()),
    "str": (T.StringType(), pa.string()),
    "string": (T.StringType(), pa.string()),
    # TRIAD_DEFAULT_TIMESTAMP is pa.timestamp("us")
    # (/root/reference/slide/utils.py:69-70) — Spark timestamps are
    # natively microsecond, a perfect fit.
    "datetime": (T.TimestampType(), pa.timestamp("us")),
    "timestamp": (T.TimestampType(), pa.timestamp("us")),
    "date": (T.DateType(), pa.date32()),
    "bytes": (T.BinaryType(), pa.binary()),
    "binary": (T.BinaryType(), pa.binary()),
}


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at bracket depth 0 only."""
    parts: list[str] = []
    depth = 0
    buf: list[str] = []
    for ch in s:
        if ch in "[{<":
            depth += 1
        elif ch in "]}>":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf or parts:
        parts.append("".join(buf))
    return parts


def parse_type(expr: str) -> T.DataType:
    """Parse one type expression: primitive, ``[T]`` array, ``{a:T,...}``
    struct, or ``<K,V>`` map (map is a Spark-side extension; the
    reference never uses maps — /root/repo/SURVEY.md §1.2)."""
    expr = expr.strip()
    if not expr:
        raise ValueError("empty type expression")
    if expr.startswith("[") and expr.endswith("]"):
        return T.ArrayType(parse_type(expr[1:-1]))
    if expr.startswith("{") and expr.endswith("}"):
        return T.StructType(_parse_fields(expr[1:-1]))
    if expr.startswith("<") and expr.endswith(">"):
        parts = _split_top(expr[1:-1])
        if len(parts) != 2:
            raise ValueError(f"map type needs exactly <K,V>: {expr!r}")
        return T.MapType(parse_type(parts[0]), parse_type(parts[1]))
    if expr in _PRIMITIVES:
        return _PRIMITIVES[expr][0]
    raise ValueError(f"unknown type expression: {expr!r}")


def _parse_fields(expr: str) -> list[T.StructField]:
    fields = []
    for part in _split_top(expr):
        part = part.strip()
        if not part:
            continue
        name, _, tp = part.partition(":")
        if not _ or not name:
            raise ValueError(f"bad field expression: {part!r}")
        fields.append(T.StructField(name.strip(), parse_type(tp), True))
    return fields


def parse_schema(expr: str) -> T.StructType:
    """``"a:str,b:long"`` -> StructType. Parity with triad's
    ``expression_to_schema`` usage in the reference test harness
    (/root/reference/slide_test/suite.py:74)."""
    return T.StructType(_parse_fields(expr))


def to_spark_schema(schema: Any) -> T.StructType:
    """Accept StructType | schema expression str | pa.Schema."""
    if isinstance(schema, T.StructType):
        return schema
    if isinstance(schema, str):
        return parse_schema(schema)
    if isinstance(schema, pa.Schema):
        return pa_to_spark_schema(schema)
    raise ValueError(f"cannot interpret as schema: {schema!r}")


def _type_expr(dt: T.DataType) -> str:
    for name, (stp, _) in _PRIMITIVES.items():
        if stp == dt:
            return name
    if isinstance(dt, T.ArrayType):
        return f"[{_type_expr(dt.elementType)}]"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{_type_expr(f.dataType)}" for f in dt.fields)
        return "{" + inner + "}"
    if isinstance(dt, T.MapType):
        return f"<{_type_expr(dt.keyType)},{_type_expr(dt.valueType)}>"
    raise ValueError(f"no expression for {dt}")


def schema_to_expr(schema: T.StructType) -> str:
    return ",".join(f"{f.name}:{_type_expr(f.dataType)}" for f in schema.fields)


# ---------------------------------------------------------------- pyarrow
def spark_to_pa_type(dt: T.DataType) -> pa.DataType:
    for stp, patp in _PRIMITIVES.values():
        if stp == dt:
            return patp
    if isinstance(dt, T.ArrayType):
        return pa.list_(spark_to_pa_type(dt.elementType))
    if isinstance(dt, T.StructType):
        return pa.struct(
            [pa.field(f.name, spark_to_pa_type(f.dataType)) for f in dt.fields]
        )
    if isinstance(dt, T.MapType):
        return pa.map_(spark_to_pa_type(dt.keyType), spark_to_pa_type(dt.valueType))
    raise ValueError(f"unsupported Spark type: {dt}")


def pa_to_spark_type(tp: pa.DataType) -> T.DataType:
    if pa.types.is_timestamp(tp):
        return T.TimestampType()
    if pa.types.is_date(tp):
        return T.DateType()
    if pa.types.is_list(tp) or pa.types.is_large_list(tp):
        return T.ArrayType(pa_to_spark_type(tp.value_type))
    if pa.types.is_struct(tp):
        return T.StructType(
            [
                T.StructField(f.name, pa_to_spark_type(f.type), True)
                for f in tp
            ]
        )
    if pa.types.is_map(tp):
        return T.MapType(pa_to_spark_type(tp.key_type), pa_to_spark_type(tp.item_type))
    if pa.types.is_large_string(tp):
        return T.StringType()
    if pa.types.is_large_binary(tp):
        return T.BinaryType()
    for stp, patp in _PRIMITIVES.values():
        if patp == tp:
            return stp
    raise ValueError(f"unsupported pyarrow type: {tp}")


def spark_to_pa_schema(schema: T.StructType) -> pa.Schema:
    return pa.schema([pa.field(f.name, spark_to_pa_type(f.dataType)) for f in schema])


def pa_to_spark_schema(schema: pa.Schema) -> T.StructType:
    return T.StructType(
        [T.StructField(f.name, pa_to_spark_type(f.type), True) for f in schema]
    )


def infer_spark_type(value: Any) -> T.DataType:
    """Python constant -> Spark type. Mirrors ``get_col_pa_type``
    (/root/reference/slide/utils.py:122-133)."""
    if value is None:
        return T.NullType()
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, str):
        return T.StringType()
    if isinstance(value, datetime):
        return T.TimestampType()
    if isinstance(value, date):
        return T.DateType()
    if isinstance(value, (bytes, bytearray)):
        return T.BinaryType()
    raise ValueError(f"cannot infer type of {value!r}")
