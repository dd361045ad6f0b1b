import pyarrow as pa
from pyspark.sql import types as T

from pandasy_spark.types import (
    infer_spark_type,
    pa_to_spark_schema,
    parse_schema,
    parse_type,
    schema_to_expr,
    spark_to_pa_schema,
)


def test_parse_primitives():
    s = parse_schema("a:str,b:long,c:int,d:double,e:bool,f:datetime,g:date,h:bytes")
    assert [f.dataType for f in s.fields] == [
        T.StringType(),
        T.LongType(),
        T.IntegerType(),
        T.DoubleType(),
        T.BooleanType(),
        T.TimestampType(),
        T.DateType(),
        T.BinaryType(),
    ]


def test_parse_nested():
    s = parse_schema("a:[int],b:{x:str,y:[long]},c:[{z:double}]")
    assert s["a"].dataType == T.ArrayType(T.IntegerType())
    assert s["b"].dataType == T.StructType(
        [
            T.StructField("x", T.StringType(), True),
            T.StructField("y", T.ArrayType(T.LongType()), True),
        ]
    )
    assert s["c"].dataType == T.ArrayType(
        T.StructType([T.StructField("z", T.DoubleType(), True)])
    )


def test_roundtrip_expr():
    expr = "a:str,b:long,c:[int],d:{x:str,y:[long]}"
    assert schema_to_expr(parse_schema(expr)) == expr


def test_pa_roundtrip():
    s = parse_schema("a:str,b:long,c:[int],d:datetime,e:date,f:bytes")
    pa_s = spark_to_pa_schema(s)
    assert pa_s.field("d").type == pa.timestamp("us")
    assert pa_to_spark_schema(pa_s) == s


def test_infer_constants():
    import datetime as dt

    assert infer_spark_type(True) == T.BooleanType()
    assert infer_spark_type(1) == T.LongType()
    assert infer_spark_type(1.5) == T.DoubleType()
    assert infer_spark_type("x") == T.StringType()
    assert infer_spark_type(dt.datetime(2020, 1, 1)) == T.TimestampType()
    assert infer_spark_type(dt.date(2020, 1, 1)) == T.DateType()
    assert infer_spark_type(b"x") == T.BinaryType()


def test_parse_map():
    assert parse_type("<str,long>") == T.MapType(T.StringType(), T.LongType())


def test_parse_map_in_schema_and_roundtrip():
    """Map fields inside schema expressions and nested maps parse; the
    schema_to_expr -> parse_schema round-trip holds (ADVICE r1: _split_top
    must track <> depth)."""
    s = parse_schema("a:<str,int>,b:long")
    assert s["a"].dataType == T.MapType(T.StringType(), T.IntegerType())
    assert s["b"].dataType == T.LongType()
    nested = parse_schema("m:<str,<str,[long]>>,x:{y:<int,str>}")
    assert nested["m"].dataType == T.MapType(
        T.StringType(), T.MapType(T.StringType(), T.ArrayType(T.LongType()))
    )
    for expr in ("a:<str,int>,b:long", "m:<str,<str,[long]>>,x:{y:<int,str>}"):
        rt = parse_schema(schema_to_expr(parse_schema(expr)))
        assert rt == parse_schema(expr)
    import pytest

    with pytest.raises(ValueError):
        parse_type("<str>")
    with pytest.raises(ValueError):
        parse_type("<str,int,long>")
