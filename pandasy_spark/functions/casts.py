"""CAST kernels — the semantics bridge between Spark casts and the
reference's cast matrix.

Parity targets: ``cast`` dispatcher
(/root/reference/slide/utils.py:245-316) and its family kernels
``_cast_to_bool`` (:993-1016), ``_cast_to_int`` (:1018-1057),
``_cast_to_float`` (:1059-1066), ``_cast_to_str`` (:1068-1102),
``_cast_to_datetime`` (:1104-1111), ``_cast_to_date`` (:1113-1122) and
``cast_df`` (:739-763).

The deliberate deltas from plain ``col.cast(...)`` (/root/repo/SURVEY.md
§4.3):

1. NaN ≡ NULL — every float-producing cast normalizes NaN to NULL.
2. string->bool additionally accepts ``"1.0"``/``"0.0"`` and is
   case-insensitive; unrecognized strings are NULL.
3. string->int goes through float (``"1.1"`` -> 1, ``"nan"`` -> NULL).
4. strict mode raises (CastError eagerly, ``assert_true`` laziliy) where
   the reference raises SlideCastError: ±inf -> int, datetime -> bool.

This module assumes the session runs with ``spark.sql.ansi.enabled=
false`` (set by pandasy_spark.session) so Spark-side casts NULL-fill
instead of throwing; strictness is opt-in per call.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exceptions import CastError
from ..types import parse_type, to_spark_schema
from .kernels import nan_to_null, to_col

__all__ = ["cast", "cast_df"]

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType)


def _as_type(tp: Any) -> T.DataType:
    if isinstance(tp, T.DataType):
        return tp
    return parse_type(str(tp))


def _cast_to_bool(c: Column, input_type: T.DataType | None, strict: bool) -> Column:
    if isinstance(input_type, (T.TimestampType, T.DateType)):
        # Reference raises SlideCastError on datetime->bool
        # (/root/reference/slide_test/suite.py:1360-1362).
        raise CastError("cannot cast datetime/date to bool")
    if isinstance(input_type, T.StringType) or input_type is None:
        s = F.lower(F.trim(c.cast("string")))
        by_string = (
            F.when(s.isNull(), F.lit(None).cast("boolean"))
            .when(s.isin("true", "1", "1.0"), F.lit(True))
            .when(s.isin("false", "0", "0.0"), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
        if isinstance(input_type, T.StringType):
            return by_string
    d = c.cast("double")
    numeric = F.when(F.isnan(d), F.lit(None)).otherwise(d.cast("boolean"))
    if input_type is not None:  # known non-string, non-datetime input
        return numeric
    # Unknown input type: strings that look boolean take the string
    # ladder; everything else the numeric one.
    return F.when(d.isNull(), by_string).otherwise(numeric)


def _cast_to_int(
    c: Column, target: T.DataType, input_type: T.DataType | None, strict: bool
) -> Column:
    if isinstance(input_type, (T.TimestampType, T.DateType)):
        # Reference raises SlideCastError on datetime->int
        # (/root/reference/slide_test/suite.py:1469-1477).
        raise CastError("cannot cast datetime/date to int")
    # String input hops through double ("1.1" -> 1, "nan" -> NULL) —
    # reference /root/reference/slide/utils.py:1047-1056.
    d = c.cast("double")
    d = F.when(F.isnan(d), F.lit(None)).otherwise(d)
    if strict:
        bad = (d == float("inf")) | (d == float("-inf"))
        d = F.when(bad, _raise(target, "cast overflow: inf to int")).otherwise(d)
    else:
        d = F.when((d == float("inf")) | (d == float("-inf")), F.lit(None)).otherwise(d)
    if isinstance(input_type, T.BooleanType):
        return c.cast(target)
    return d.cast(target)


def _raise(target: T.DataType, msg: str) -> Column:
    return F.assert_true(F.lit(False), F.lit(msg)).cast(target)


def _cast_to_float(c: Column, target: T.DataType) -> Column:
    # "nan" string parses to NaN, which is NULL in the engine's model —
    # reference /root/reference/slide/utils.py:1059-1066,
    # /root/reference/slide_test/suite.py:1150,1170.
    return nan_to_null(c.cast(target))


def cast(
    col: Any,
    target: Any,
    input_type: Any | None = None,
    strict: bool = False,
) -> Column:
    """SQL CAST with the reference's edge semantics (module docstring).

    ``target``/``input_type`` accept Spark DataType or schema-expression
    strings (``"long"``, ``"datetime"``...).  ``strict=True`` raises on
    the cases where the reference raises SlideCastError; the default
    NULL-fills (matching Spark non-ANSI), which is what the DuckDB
    oracle can observe.
    """
    c = to_col(col)
    tgt = _as_type(target)
    itp = _as_type(input_type) if input_type is not None else None

    if itp is not None and itp == tgt:
        return c  # no-op elision, as Catalyst SimplifyCasts would do
    if isinstance(tgt, T.BooleanType):
        return _cast_to_bool(c, itp, strict)
    if isinstance(tgt, _INT_TYPES):
        return _cast_to_int(c, tgt, itp, strict)
    if isinstance(tgt, _FLOAT_TYPES):
        return _cast_to_float(c, tgt)
    if isinstance(tgt, T.StringType):
        # Spark's string rendering already matches the reference for
        # bool/int/float/datetime: 'true'/'false', '2', '1.1', '10.0',
        # '2020-01-01 15:02:03' (/root/reference/slide_test/suite.py:
        # 1561-1706) — except float NaN/inf: the reference renders
        # NULL / 'inf' / '-inf' (suite:1183-1185,1632) where Spark
        # says 'NaN' / 'Infinity'.
        if isinstance(itp, _FLOAT_TYPES):
            d = c.cast("double")
            return (
                F.when(F.isnan(d), F.lit(None).cast("string"))
                .when(d == float("inf"), F.lit("inf"))
                .when(d == float("-inf"), F.lit("-inf"))
                .otherwise(c.cast("string"))
            )
        if isinstance(itp, T.BooleanType):
            # honor the hint: render via the bool ladder first
            # (cast(-10, str, bool) == 'true' — suite:1177-1178)
            return _cast_to_bool(c, None, strict).cast("string")
        return c.cast("string")
    if isinstance(tgt, (T.TimestampType, T.DateType, T.BinaryType)):
        return c.cast(tgt)
    # arrays/structs/maps: delegate to Spark's cast
    return c.cast(tgt)


def cast_df(
    df: DataFrame,
    schema: Any,
    input_schema: Any | None = None,
    strict: bool = False,
) -> DataFrame:
    """Schema-driven whole-frame cast (positional), parity with
    ``cast_df`` (/root/reference/slide/utils.py:739-763).  The
    ``input_schema`` hint plays the same role as in the reference:
    disambiguating inputs whose carried type lost information."""
    out = to_spark_schema(schema)
    if len(out.fields) != len(df.columns):
        raise CastError(
            f"schema has {len(out.fields)} fields, frame has {len(df.columns)}"
        )
    hints = to_spark_schema(input_schema).fields if input_schema is not None else None
    cols = []
    for i, field in enumerate(out.fields):
        src = df.columns[i]
        itp = hints[i].dataType if hints is not None else df.schema[src].dataType
        cols.append(
            cast(F.col(src), field.dataType, input_type=itp, strict=strict).alias(
                field.name
            )
        )
    return df.select(*cols)
