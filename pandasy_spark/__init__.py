"""pandasy_spark — a PySpark-native engine with the query semantics of
fugue-project's "slide" (the pandasy reference), extended with
Spark-first aggregation, windowing, streaming, and large-scale
training-data operators (dedup / similarity / text / multimodal).

Layering:
- ``types``      schema expressions <-> StructType <-> pyarrow
- ``functions``  expression kernels (SQL 3VL, cast bridge, predicates)
- ``operators``  relational ops, grouped-apply, aggregates, windows
- ``convert``    ingest/egress (rows, pandas, arrow, JSON-nested)
- ``sources``    parquet catalog over the testdata layout
- ``extended``   dedup, similarity search, text analysis, multimodal
- ``streaming``  structured-streaming counterparts
"""

from . import convert, functions, operators, sources, types
from .exceptions import CastError, InvalidOperationError, PandasySparkException
from .session import configure_existing, get_spark

__version__ = "0.1.0"

__all__ = [
    "CastError",
    "InvalidOperationError",
    "PandasySparkException",
    "configure_existing",
    "convert",
    "functions",
    "get_spark",
    "operators",
    "sources",
    "types",
]
