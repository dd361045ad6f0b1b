"""Ingest / egress boundary: row lists <-> DataFrame <-> arrow/pandas.

Parity targets in /root/reference/slide/utils.py: ``to_schema``
(:706-737), ``as_arrow`` (:627-639), ``as_pandas`` (:641-646),
``as_array_iterable``/``as_array`` (:648-704), ``cols_to_df``
(:602-617), ``empty`` (:619-625).  The index-compatibility guard
(:790-816) has no Spark equivalent and is intentionally absent.

The reference's nested-type egress decodes JSON strings into
list/struct values row-at-a-time via triad ``apply_schema`` with
``str_as_json=True`` (:682-691, "much slower").  Here that is
``F.from_json`` — JVM-side, vectorized.
"""

from __future__ import annotations

import datetime as _dt
import math
from typing import Any, Iterable, Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .types import spark_to_pa_schema, to_spark_schema

__all__ = [
    "to_df",
    "to_schema",
    "as_pandas",
    "as_arrow",
    "as_array",
    "as_array_iterable",
    "empty",
    "cols_to_df",
    "decode_json_columns",
]


def _coerce_value(v: Any, dt: T.DataType) -> Any:
    """Python-side literal coercion so row-list fixtures behave like the
    reference's ``to_df(data, "a:str,b:int")`` harness
    (/root/reference/tests/slide_pandas/test_utils.py:22-34), including
    JSON-string encodings of nested values
    (/root/reference/slide_test/suite.py:1960-1979)."""
    if v is None:
        return None
    # numpy / pandas scalar normalization (row-list fixtures often come
    # from pandas frames)
    import numpy as np
    import pandas as pd

    if v is pd.NaT or v is pd.NA:
        return None
    if isinstance(v, np.bool_):
        v = bool(v)
    elif isinstance(v, np.integer):
        v = int(v)
    elif isinstance(v, np.floating):
        v = float(v)
    elif isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, float) and math.isnan(v):
        return None  # NaN ≡ NULL at the ingest boundary (SURVEY §4.3-1)
    if isinstance(dt, (T.ArrayType, T.StructType, T.MapType)) and isinstance(v, str):
        import json

        return _coerce_value(json.loads(v), dt)
    if isinstance(dt, T.ArrayType) and isinstance(v, (list, tuple)):
        return [_coerce_value(x, dt.elementType) for x in v]
    if isinstance(dt, T.StructType) and isinstance(v, dict):
        return {
            f.name: _coerce_value(v.get(f.name), f.dataType) for f in dt.fields
        }
    if isinstance(dt, (T.DoubleType, T.FloatType)) and isinstance(v, int):
        return float(v)
    if isinstance(dt, T.BooleanType) and isinstance(v, (int, float)):
        # reference to_df coerce=True accepts 1/0/1.0/0.0 for bool
        # (/root/reference/slide_test/suite.py:2012-2018)
        return bool(v)
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, float):
            return int(v)
        if isinstance(v, str):
            return int(float(v))
    if isinstance(dt, T.TimestampType) and isinstance(v, str):
        return _dt.datetime.fromisoformat(v)
    if isinstance(dt, T.TimestampType) and isinstance(v, int):
        # epoch nanoseconds (numpy datetime64 frames round-trip as ints)
        return pd.Timestamp(v).to_pydatetime()
    if isinstance(dt, T.DateType):
        if isinstance(v, str):
            return _dt.date.fromisoformat(v)
        if isinstance(v, _dt.datetime):
            return v.date()
    if isinstance(dt, T.StringType) and not isinstance(v, str):
        return str(v)
    return v


def to_df(spark: SparkSession, data: Iterable[list[Any]], schema: Any) -> DataFrame:
    """Build a DataFrame from row lists under a schema expression /
    StructType / pa.Schema."""
    st = to_spark_schema(schema)
    rows = [
        tuple(_coerce_value(v, f.dataType) for v, f in zip(row, st.fields))
        for row in data
    ]
    return spark.createDataFrame(rows, schema=st)


def to_schema(df: DataFrame) -> pa.Schema:
    """Frame -> pyarrow schema (the reference's carried-schema type,
    /root/reference/slide/utils.py:706-737)."""
    return spark_to_pa_schema(df.schema)


def as_pandas(df: DataFrame):
    return df.toPandas()


def as_arrow(df: DataFrame, schema: Any | None = None) -> pa.Table:
    """Frame -> pa.Table, optionally cast to a target schema
    (type_safe overflow checking comes from arrow's cast, like the
    reference's ``safe=`` flag — /root/reference/slide/utils.py:627-639).
    """
    tbl = df.toArrow()
    # Spark renders TimestampType as tz-aware arrow (session tz = UTC);
    # the engine's schema model is naive timestamp[us]
    # (/root/reference/slide/utils.py:69-70) — normalize.
    tbl = tbl.cast(spark_to_pa_schema(df.schema))
    if schema is not None:
        target = (
            schema
            if isinstance(schema, pa.Schema)
            else spark_to_pa_schema(to_spark_schema(schema))
        )
        tbl = tbl.cast(target)
    return tbl


def _row_value(v: Any) -> Any:
    from pyspark.sql import Row

    if isinstance(v, Row):
        # structs egress as dicts, like the reference's nested contract
        # (/root/reference/slide_test/suite.py:1972)
        return {k: _row_value(x) for k, x in v.asDict().items()}
    if isinstance(v, list):
        return [_row_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _row_value(x) for k, x in v.items()}
    if isinstance(v, float) and math.isnan(v):
        return None  # NaN ≡ NULL on egress too
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def as_array_iterable(
    df: DataFrame,
    schema: Any | None = None,
    columns: list[str] | None = None,
    type_safe: bool = False,
) -> Iterator[list[Any]]:
    """Frame -> iterable of row lists with exact Python types out
    (datetime not pd.Timestamp, None not NaT) — the reference's egress
    contract (/root/reference/slide_test/suite.py:1895-1958).

    Spark's ``collect`` already yields native datetimes/ints;
    ``type_safe`` additionally casts to the requested schema first.
    ``toLocalIterator`` streams partitions so the driver never holds
    the whole frame (scale posture for egress).
    """
    if columns is not None:
        df = df.select(*columns)
    if type_safe and schema is not None:
        from .functions.casts import cast_df

        df = cast_df(df, schema)
    for row in df.toLocalIterator():
        yield [_row_value(v) for v in row]


def as_array(
    df: DataFrame,
    schema: Any | None = None,
    columns: list[str] | None = None,
    type_safe: bool = False,
) -> list[list[Any]]:
    return list(as_array_iterable(df, schema, columns, type_safe))


def empty(df: DataFrame) -> bool:
    return df.isEmpty()


def eval_scalar(spark: SparkSession, col: Any) -> Any:
    """Evaluate a constant Column expression to a Python value via a
    1-row frame — the reference's scalar path returns Python constants
    from constant inputs (/root/reference/slide/utils.py:410-414);
    Spark Columns are unevaluable without a frame, so this mirrors the
    same trick behind the same API (/root/repo/SURVEY.md §7.4-3)."""
    from pyspark.sql import Column

    c = col if isinstance(col, Column) else F.lit(col)
    return _row_value(spark.range(1).select(c.alias("v")).collect()[0]["v"])


def cols_to_df(
    df: DataFrame, cols: list[Any], names: list[str] | None = None
) -> DataFrame:
    """Assemble a frame from Columns (and constants) of a parent frame —
    parity with ``cols_to_df`` (/root/reference/slide/utils.py:602-617).
    A Spark Column is bound to its plan, so the parent frame is an
    explicit argument; pure constants cannot form a frame (the
    reference raises SlideInvalidOperation for the same case)."""
    from pyspark.sql import Column

    from .exceptions import InvalidOperationError

    if not any(isinstance(c, Column) for c in cols):
        raise InvalidOperationError("at least one Column is required")
    if names is None:
        out = [c if isinstance(c, Column) else F.lit(c) for c in cols]
    else:
        out = [
            (c if isinstance(c, Column) else F.lit(c)).alias(n)
            for c, n in zip(cols, names)
        ]
    return df.select(*out)


def _stringify_type(dt: T.DataType) -> T.DataType:
    """Replace every primitive leaf with StringType (recursing through
    arrays/structs/maps) so ``from_json`` accepts mixed-typed JSON
    values; the caller then casts to the real schema elementwise."""
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_stringify_type(dt.elementType))
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _stringify_type(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, T.MapType):
        return T.MapType(_stringify_type(dt.keyType), _stringify_type(dt.valueType))
    return T.StringType()


def decode_json_columns(df: DataFrame, schema: Any) -> DataFrame:
    """Decode string columns holding JSON into nested types, the
    vectorized equivalent of the reference's row-at-a-time
    ``str_as_json`` path (/root/reference/slide/utils.py:682-691).

    Decoding goes through a string-leaf schema first and then casts,
    so mixed-typed JSON values coerce (``[30, "40"]`` -> [30, 40]) like
    the reference's type_safe decode instead of nulling out."""
    st = to_spark_schema(schema)
    cols = []
    for f in st.fields:
        cur = df.schema[f.name].dataType if f.name in df.columns else None
        if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType)) and isinstance(
            cur, T.StringType
        ):
            decoded = F.from_json(F.col(f.name), _stringify_type(f.dataType))
            cols.append(decoded.cast(f.dataType).alias(f.name))
        else:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return df.select(*cols)
