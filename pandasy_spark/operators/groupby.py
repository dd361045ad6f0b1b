"""Grouped execution: SQL-semantics group-by-apply.

Parity target: ``sql_groupby_apply``
(/root/reference/slide/utils.py:765-788; pandas impl
/root/reference/slide_pandas/utils.py:76-94; dask impl
/root/reference/slide_dask/utils.py:84-103).

Spark's ``groupBy().applyInPandas`` maps 1:1 onto the reference design:
- NULL group keys form real groups natively (the reference needs
  ``dropna=False`` / indicator workarounds on pandas).
- The output schema is required up front, like dask's ``meta``.
- The shuffle at the group boundary is the dask process-boundary
  analogue (/root/repo/SURVEY.md §3.3).

Scale note: this is the engine's extensibility surface, not its
aggregation path — native ``groupBy().agg`` (see operators.aggregates)
does partial map-side aggregation and should be preferred whenever the
per-group function is expressible with built-ins.  ``applyInPandas``
materializes each group in one executor's memory, so at 100 TB the
caller must ensure per-group cardinality is bounded.
"""

from __future__ import annotations

import warnings
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..types import to_spark_schema

__all__ = ["sql_groupby_apply", "whole_frame_apply_distributed"]

_WHOLE_FRAME_KEY = "__pandasy_whole_frame_group__"


def sql_groupby_apply(
    df: DataFrame,
    cols: list[str],
    func: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: Any | None = None,
    whole_frame_limit: int | None = None,
    _warn_whole_frame: bool = True,
    **kwargs: Any,
) -> DataFrame:
    """GROUP BY ``cols`` + apply an arbitrary pandas ``func`` per group.

    SQL semantics: NULL keys (and composite all-NULL keys) are real
    groups; ``cols=[]`` treats the whole frame as one group
    (reference tests /root/reference/slide_test/suite.py:2020-2153).

    ``output_schema`` accepts a StructType, a schema expression string
    ("a:str,b:long"), or a pyarrow Schema; if omitted the input schema
    is assumed (func must be shape-preserving).

    ``cols=[]`` gathers the WHOLE frame into one executor task — a
    RuntimeWarning is emitted, and ``whole_frame_limit`` (opt-in, one
    count job) turns it into a hard error above that row count.  For
    aggregate-shaped functions prefer ``whole_frame_apply_distributed``.
    """
    schema = (
        to_spark_schema(output_schema) if output_schema is not None else df.schema
    )
    if kwargs:
        inner = func
        func = lambda pdf: inner(pdf, **kwargs)  # noqa: E731

    if len(cols) == 0:
        # Whole frame as one group.  A constant grouping column forces a
        # single group; unlike dask's map_partitions fallback
        # (/root/reference/slide_dask/utils.py:97-98) this preserves
        # whole-frame semantics exactly (at the cost of gathering the
        # frame on one executor — hence the warning/limit).
        if _warn_whole_frame:
            warnings.warn(
                "sql_groupby_apply(cols=[]) gathers the whole frame into "
                "one executor task; use whole_frame_apply_distributed for "
                "aggregate-shaped functions at scale",
                RuntimeWarning,
                stacklevel=2,
            )
        if whole_frame_limit is not None:
            n = df.limit(whole_frame_limit + 1).count()
            if n > whole_frame_limit:
                raise ValueError(
                    f"sql_groupby_apply(cols=[]): input exceeds "
                    f"whole_frame_limit={whole_frame_limit} rows"
                )

        def _drop_key(pdf: pd.DataFrame) -> pd.DataFrame:
            return func(pdf.drop(columns=[_WHOLE_FRAME_KEY]))

        return (
            df.withColumn(_WHOLE_FRAME_KEY, F.lit(1))
            .groupBy(_WHOLE_FRAME_KEY)
            .applyInPandas(_drop_key, schema=schema)
        )

    return df.groupBy(*cols).applyInPandas(func, schema=schema)


def whole_frame_apply_distributed(
    df: DataFrame,
    partial: Callable[[pd.DataFrame], pd.DataFrame],
    merge: Callable[[pd.DataFrame], pd.DataFrame],
    partial_schema: Any | None = None,
    output_schema: Any | None = None,
) -> DataFrame:
    """Scalable twin of ``sql_groupby_apply(cols=[])`` for
    aggregate-shaped functions (classic two-phase combine):

    - ``partial`` runs once per PARTITION via Arrow-batched
      ``mapInPandas`` — fully parallel, nothing gathered;
    - ``merge`` combines the concatenated partials — only the (small)
      partial results ever reach a single task.

    Correct whenever ``merge(concat(partial(p) for p in partitions))``
    equals ``func(whole_frame)`` — true for sums/counts/min/max/topk
    and any algebraic aggregate split into partial+merge form.
    """
    pschema = (
        to_spark_schema(partial_schema) if partial_schema is not None else df.schema
    )

    def _per_partition(batches):
        pdfs = [pdf for pdf in batches]
        if pdfs:
            yield partial(pd.concat(pdfs, ignore_index=True))

    parts = df.mapInPandas(_per_partition, schema=pschema)
    return sql_groupby_apply(
        parts, [], merge, output_schema=output_schema, _warn_whole_frame=False
    )
