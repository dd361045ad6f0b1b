"""Text-format ingestion: CSV and JSON-lines readers/writers.

The reference has no sources at all (/root/repo/SURVEY.md §2.7); the
driver testdata is parquet.  These wrappers complete the ingestion
surface for the formats raw corpora actually arrive in, with the
scale-relevant defaults made explicit:

- **Schema is required** (or explicitly sampled): schema inference
  reads the data twice — on a 100 TB drop that is a full extra pass.
  ``infer_sample_ratio`` bounds the inference scan when you opt in.
- CSV: header/sep/null handling pinned; ``mode=PERMISSIVE`` with a
  ``_corrupt_record`` column so bad rows are quarantined, not dropped
  silently (``badRecordsPath``-style triage can filter on it).
- JSONL: one JSON object per line (the standard corpus interchange
  format); multiline JSON needs a different parse path and is
  deliberately not the default.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..types import to_spark_schema

__all__ = [
    "read_csv",
    "read_jsonl",
    "read_orc",
    "read_text_lines",
    "read_xml",
    "write_csv",
    "write_jsonl",
    "write_orc",
    "write_xml",
]

_CORRUPT = "_corrupt_record"


def _schema_arg(schema: Any | None):
    return to_spark_schema(schema) if schema is not None else None


def read_csv(
    spark: SparkSession,
    path: str,
    schema: Any | None = None,
    header: bool = True,
    sep: str = ",",
    null_value: str = "",
    infer_sample_ratio: float | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """CSV scan.  Pass ``schema`` (schema-expression string or
    StructType) in production; ``infer_sample_ratio`` opts into bounded
    inference instead."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("nullValue", null_value)
        .option("mode", "PERMISSIVE")
    )
    st = _schema_arg(schema)
    if st is not None:
        if keep_corrupt:
            from pyspark.sql import types as T

            st = T.StructType(list(st.fields) + [T.StructField(_CORRUPT, T.StringType())])
            reader = reader.option("columnNameOfCorruptRecord", _CORRUPT)
        reader = reader.schema(st)
    else:
        reader = reader.option("inferSchema", "true")
        if infer_sample_ratio is not None:
            reader = reader.option("samplingRatio", str(infer_sample_ratio))
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: Any | None = None,
    infer_sample_ratio: float | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """JSON-lines scan (one object per line)."""
    reader = spark.read.option("mode", "PERMISSIVE")
    st = _schema_arg(schema)
    if st is not None:
        if keep_corrupt:
            from pyspark.sql import types as T

            st = T.StructType(list(st.fields) + [T.StructField(_CORRUPT, T.StringType())])
            reader = reader.option("columnNameOfCorruptRecord", _CORRUPT)
        reader = reader.schema(st)
    elif infer_sample_ratio is not None:
        reader = reader.option("samplingRatio", str(infer_sample_ratio))
    return reader.json(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    df.write.option("header", str(header).lower()).mode(mode).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str, schema: Any | None = None) -> DataFrame:
    """Columnar ORC reader — same pushdown/pruning contract as the
    parquet scans (PushedFilters/ReadSchema in the plan); the format
    interop surface for Hive-era warehouses."""
    reader = spark.read
    s = _schema_arg(schema)
    if s is not None:
        reader = reader.schema(s)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: Any | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """XML scan (Spark 4 built-in ``xml`` data source — no external
    package).  ``row_tag`` names the repeated element that becomes one
    row; absent child elements read as NULL, which is how XML encodes
    missing values (there is no ``nullValue`` token like CSV's).  The
    schema contract matches :func:`read_csv`: pass one in production —
    XML inference is an extra full pass that also has to unify ragged
    element sets."""
    reader = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
    )
    st = _schema_arg(schema)
    if st is not None:
        if keep_corrupt:
            from pyspark.sql import types as T

            st = T.StructType(
                list(st.fields) + [T.StructField(_CORRUPT, T.StringType())]
            )
            reader = reader.option("columnNameOfCorruptRecord", _CORRUPT)
        reader = reader.schema(st)
    return reader.load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str, mode: str = "overwrite"
) -> None:
    """XML writer (built-in data source).  NULL columns are written as
    ABSENT elements — the round-trip null convention `read_xml`
    relies on."""
    df.write.format("xml").option("rowTag", row_tag).mode(mode).save(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """One row per line (column ``value: string``) — the raw-corpus
    ingestion format for text pipelines; pair with the text operators
    to score/clean before columnarizing."""
    return spark.read.text(path)
