"""Custom stateful streaming operators via ``applyInPandasWithState``.

The state-store-backed extensibility surface for operators that
tumbling/session windows can't express.  First resident: streaming
exact-dedup (emit only the first occurrence of each key) — the
standard guard at the front of a training-data ingestion stream.

Scale notes: state is partitioned by key group (same shuffle as a
streaming aggregate), lives in the state store (RocksDB in prod
configs), and is bounded here to a single counter per key.  A
watermark-based TTL can be added via GroupStateTimeout when keys are
time-scoped.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..types import to_spark_schema

__all__ = ["streaming_dedup"]


def streaming_dedup(
    df: DataFrame,
    key_cols: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """Keep only the first row seen per key across the whole stream.

    On a batch frame this degrades to groupBy+first (tested against
    it); on a stream, state remembers which keys have been emitted.
    ``order_col`` breaks ties deterministically within a micro-batch.
    """
    out_schema = df.schema
    state_schema = to_spark_schema("seen:long")
    sort_cols = list(key_cols) + ([order_col] if order_col else [])

    def dedup_fn(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (seen,) = state.get if state.exists else (0,)
        if seen:
            state.update((seen,))
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(sort_cols) if order_col else pdf
            head = pdf.head(1)
            if first is None:
                first = head
            elif order_col is not None and (
                head[order_col].iloc[0] < first[order_col].iloc[0]
            ):
                first = head
        if first is not None:
            state.update((1,))
            yield first

    return df.groupBy(*key_cols).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
