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

__all__ = ["streaming_dedup", "stateful_sessions", "stateful_rate_limit", "stateful_pattern_match"]


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


def stateful_sessions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Gap-based session windows as a custom stateful operator with
    event-time TIMEOUT EVICTION (``GroupStateTimeout.EventTimeTimeout``).

    Semantics match ``sessionize_batch`` (a new session starts when the
    gap to the previous event of the same key exceeds ``gap_minutes``):

    - within a micro-batch, events are gap-split locally and every
      CLOSED session is emitted immediately;
    - the still-open trailing session is held in the state store with
      ``setTimeoutTimestamp(end + gap)``;
    - when the watermark passes that timestamp the group times out, the
      session is emitted, and its state is evicted — so state size is
      bounded by the number of concurrently-open sessions, never by
      stream history.

    Late events inside the watermark merge correctly (intervals are
    merged by start time, so an event older than the held session's
    start extends it backward).  The key column must be integral
    (``long``) in this synthetic setting.
    """
    out_schema = to_spark_schema(
        f"{key_col}:long,session_start:datetime,session_end:datetime,n_events:long"
    )
    state_schema = to_spark_schema("start_us:long,end_us:long,n:long")
    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1_000
    key_name, ts_name = key_col, ts_col

    def _emit(key: Any, sessions: list[list[int]]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_name: pd.Series([key[0]] * len(sessions), dtype="int64"),
                "session_start": pd.to_datetime(
                    pd.Series([s[0] for s in sessions], dtype="int64"), unit="us"
                ),
                "session_end": pd.to_datetime(
                    pd.Series([s[1] for s in sessions], dtype="int64"), unit="us"
                ),
                "n_events": pd.Series([s[2] for s in sessions], dtype="int64"),
            }
        )

    def session_fn(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield _emit(key, [[start_us, end_us, n]])
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                ts_us.extend(
                    (pd.to_datetime(pdf[ts_name]).astype("int64") // 1000).tolist()
                )
        if not ts_us:
            if state.exists:  # keep the held session armed
                start_us, end_us, n = state.get
                state.setTimeoutTimestamp(end_us // 1000 + gap_ms)
            return
        intervals = [[t, t, 1] for t in sorted(ts_us)]
        if state.exists:
            held = list(state.get)
            lo = 0
            while lo < len(intervals) and intervals[lo][0] < held[0]:
                lo += 1
            intervals.insert(lo, held)
        merged: list[list[int]] = []
        cur = intervals[0]
        for iv in intervals[1:]:
            if iv[0] - cur[1] > gap_us:
                merged.append(cur)
                cur = iv
            else:
                cur = [cur[0], max(cur[1], iv[1]), cur[2] + iv[2]]
        state.update((cur[0], cur[1], cur[2]))
        state.setTimeoutTimestamp(cur[1] // 1000 + gap_ms)
        if merged:
            yield _emit(key, merged)

    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            session_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stateful_rate_limit(
    df: DataFrame,
    capacity: int,
    refill_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """STREAMING twin of the batch token bucket
    (``extended.events.token_bucket_per_key``): per-key admission
    control evaluated ONLINE, one decision row per event — the live
    form of the replayable batch fold, same semantics to the bit.

    The bucket state ``(tok_credits, last_us, started)`` carries
    across micro-batches in the state store; within a batch events
    sort by (ts, id) and fold with the identical division-free
    TIME-CREDIT recurrence (1 credit/us, cost = ``refill_us``
    credits, capacity = ``capacity·refill_us``, bucket full at the
    key\'s first-ever event).  Because the state carries (tok, last),
    micro-batch BOUNDARIES cannot change any decision — stream output
    == batch fold for any in-order replay split, which is what the
    driver gate pins against the batch oracle.

    State per key is two longs (bounded by key cardinality, never
    stream length); ``GroupStateTimeout.NoTimeout`` — add an
    event-time TTL like :func:`stateful_sessions` when keys are
    time-scoped.  In-order delivery per key is the operator\'s
    contract (the admission decision is order-defined); an
    out-of-order deployment puts a watermark sort upstream.  Key and
    event-id columns must be INTEGRAL (long output schema, the
    stateful_sessions convention in this synthetic setting) —
    enforced with a TypeError at plan build; dense-rank string ids
    first.

    Output (append): ``(key, event_id, accepted boolean)``.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if refill_us < 1:
        raise ValueError("refill_us must be >= 1")
    from pyspark.sql import types as _T

    for name in (key_col, id_col):
        dt = df.schema[name].dataType
        if not isinstance(
            dt, (_T.ByteType, _T.ShortType, _T.IntegerType, _T.LongType)
        ):
            # the int64 output schema would otherwise crash the
            # Python worker mid-batch on the first string key — fail
            # loudly at plan build instead (round-11 review finding)
            raise TypeError(
                f"stateful_rate_limit: column {name!r} has type "
                f"{dt.simpleString()}; expected integral ids "
                "(dense-rank string ids first)"
            )
    cap_credits = int(capacity) * int(refill_us)
    cost = int(refill_us)
    out_schema = to_spark_schema(
        f"{key_col}:long,{id_col}:long,accepted:bool"
    )
    # two-field state: state.exists already encodes first-event
    # detection, no third flag needed
    state_schema = to_spark_schema("tok:long,last_us:long")
    key_name, ts_name, id_name = key_col, ts_col, id_col

    def limit_fn(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        events: list[tuple[int, int]] = []
        for pdf in pdfs:
            if len(pdf):
                us = (
                    pd.to_datetime(pdf[ts_name]).astype("int64") // 1000
                ).tolist()
                ids = pdf[id_name].astype("int64").tolist()
                events.extend(zip(us, ids))
        if not events:
            return
        events.sort()
        if state.exists:
            tok, last = state.get
            pending = events
            out_ids, out_acc = [], []
        else:
            # first-ever event: bucket starts full and admits it
            first_us, first_id = events[0]
            tok, last = cap_credits - cost, first_us
            pending = events[1:]
            out_ids, out_acc = [first_id], [True]
        for us, eid in pending:
            tok = min(cap_credits, tok + (us - last))
            if tok >= cost:
                tok -= cost
                out_acc.append(True)
            else:
                out_acc.append(False)
            out_ids.append(eid)
            last = us
        state.update((tok, last))
        yield pd.DataFrame(
            {
                key_name: pd.Series([key[0]] * len(out_ids), dtype="int64"),
                id_name: pd.Series(out_ids, dtype="int64"),
                "accepted": pd.Series(out_acc, dtype="bool"),
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        limit_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_pattern_match(
    df: DataFrame,
    anchor_type: str = "click",
    accept_type: str = "purchase",
    wildcard_type: str = "view",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """STREAMING twin of the batch pattern automaton
    (``extended.events.pattern_match_per_key``): the SQL-2016
    MATCH_RECOGNIZE pattern ``anchor (wildcard)* accept`` with AFTER
    MATCH SKIP PAST LAST ROW, evaluated ONLINE — one decision row per
    event, ``matched`` TRUE on the event that COMPLETES a match (the
    live conversion trigger a realtime attribution pipeline fires
    on).

    The automaton state is ONE long per key carried in the state
    store; within a batch events sort by (ts, id) and step the
    identical two-state recurrence, so micro-batch boundaries cannot
    change any decision — stream output == batch fold for any
    in-order replay split, which is what the driver gate pins
    against the batch closed-form oracle.  In-order delivery per key
    is the operator's contract (same as
    :func:`stateful_rate_limit`); integral key/id columns enforced
    at plan build.

    Output (append): ``(key, event_id, matched boolean)``.
    """
    from pyspark.sql import types as _T

    for name in (key_col, id_col):
        dt = df.schema[name].dataType
        if not isinstance(
            dt, (_T.ByteType, _T.ShortType, _T.IntegerType, _T.LongType)
        ):
            raise TypeError(
                f"stateful_pattern_match: column {name!r} has type "
                f"{dt.simpleString()}; expected integral ids "
                "(dense-rank string ids first)"
            )
    out_schema = to_spark_schema(
        f"{key_col}:long,{id_col}:long,matched:bool"
    )
    state_schema = to_spark_schema("st:long")
    key_name, ts_name, id_name, type_name = (
        key_col, ts_col, id_col, type_col,
    )

    def match_fn(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        events: list[tuple[int, int, str]] = []
        for pdf in pdfs:
            if len(pdf):
                us = (
                    pd.to_datetime(pdf[ts_name]).astype("int64") // 1000
                ).tolist()
                ids = pdf[id_name].astype("int64").tolist()
                tys = pdf[type_name].astype("object").tolist()
                events.extend(zip(us, ids, tys))
        if not events:
            return
        events.sort(key=lambda e: (e[0], e[1]))
        (st,) = state.get if state.exists else (0,)
        out_ids, out_m = [], []
        for _us, eid, ty in events:
            matched = False
            if ty == anchor_type:
                st = 1
            elif ty == accept_type:
                if st == 1:
                    matched = True
                st = 0
            elif ty == wildcard_type:
                pass
            else:
                st = 0
            out_ids.append(eid)
            out_m.append(matched)
        state.update((st,))
        yield pd.DataFrame(
            {
                key_name: pd.Series([key[0]] * len(out_ids), dtype="int64"),
                id_name: pd.Series(out_ids, dtype="int64"),
                "matched": pd.Series(out_m, dtype="bool"),
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        match_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
