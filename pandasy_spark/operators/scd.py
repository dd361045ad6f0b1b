"""Slowly-changing-dimension maintenance (SCD Type 2).

No counterpart in the reference (its surface is stateless frame ops —
SURVEY.md §2.9); this is the warehouse-side operator a feature/metadata
dimension needs when history must be preserved: instead of updating a
row in place, the current version is CLOSED (effective-to stamped) and
a new open version appended.

Pure declarative joins/unions — Catalyst plans it like any other
query; at 100 TB the dimension and snapshot join once on the business
key and everything else is narrow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_apply", "merge_upsert", "snapshot_diff", "cdc_apply", "golden_records"]


def _assert_unique_keys(df: DataFrame, keys: list[str], side: str) -> DataFrame:
    """Guard a merge input against duplicate business keys WITHOUT a
    driver action: a per-key window count feeds ``assert_true``, so the
    first duplicate key fails the JOB (like ANSI MERGE's "multiple
    source rows matched" error) instead of silently fanning out the
    join.  Cost: one shuffle of ``df`` on ``keys`` — ``df`` is the
    delta/snapshot side, small by construction.  NULL keys group
    together, consistent with the null-safe join condition.
    """
    cnt = F.count(F.lit(1)).over(Window.partitionBy(*[F.col(k) for k in keys]))
    # the raise rides a kept data column with DIFFERING when-branches —
    # an equal-branch `when` (or a bare assert_true projected then
    # dropped) gets folded away by Catalyst and the guard never fires
    first = df.columns[0]
    dtype = df.schema[first].dataType
    return df.withColumn(
        first,
        F.when(
            cnt > 1,
            F.raise_error(
                F.lit(
                    f"duplicate {side} merge keys {keys}: ANSI MERGE "
                    "forbids multiple source matches per target row"
                )
            ).cast(dtype),
        ).otherwise(F.col(first)),
    )


def scd2_apply(
    dim: DataFrame,
    snapshot: DataFrame,
    keys: list[str],
    tracked: list[str],
    update_ts,
    eff_from: str = "eff_from",
    eff_to: str = "eff_to",
    current_col: str = "is_current",
    check_unique_snapshot: bool = True,
) -> DataFrame:
    """Merge a full ``snapshot`` into an SCD2 ``dim`` table.

    ``dim`` rows carry (keys..., tracked..., eff_from, eff_to NULL for
    open rows, is_current).  ``snapshot`` carries (keys..., tracked...)
    — the new truth as of ``update_ts`` (a literal-able timestamp/date
    value).  Semantics per business key:

    - unchanged (all tracked columns null-safe-equal): dim untouched;
    - changed: the open row closes (eff_to = update_ts,
      is_current = false) and a new open row starts at update_ts;
    - new key: a new open row starts at update_ts;
    - key absent from the snapshot: dim untouched (no implicit
      deletes — emit explicit tombstones upstream if needed).

    History rows (is_current = false) pass through untouched.

    PRECONDITION: business keys are unique within the snapshot AND
    within the open slice of the dim (any valid SCD2 table satisfies
    the latter); duplicates would fan out the full-outer join.  With
    ``check_unique_snapshot`` (default) the snapshot side is guarded
    in-plan — the job fails on the first duplicate key instead of
    silently multiplying rows.

    Scale shape: one equi-join of the OPEN slice against the snapshot
    on the business key (broadcast when the snapshot is small), plus
    unions of narrow projections and the optional snapshot-side
    uniqueness window — no driver state.
    """
    ts = F.lit(update_ts)
    dim_cols = dim.columns
    open_rows = dim.filter(F.col(current_col))
    closed_rows = dim.filter(~F.col(current_col))

    snap = snapshot.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__new_{c}") for c in tracked],
    )
    if check_unique_snapshot:
        snap = _assert_unique_keys(snap, keys, "snapshot")
    # presence on either side of the full-outer join is detected via
    # explicit markers, never by guessing from NULLable data columns
    # (a legitimately-NULL eff_from or tracked value must not
    # misclassify the row)
    joined = open_rows.withColumn("__in_dim", F.lit(True)).join(
        snap.withColumn("__in_snap", F.lit(True)), keys, "full_outer"
    )
    changed: Column = F.lit(False)
    for c in tracked:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__new_{c}"))
    has_snap = F.coalesce(F.col("__in_snap"), F.lit(False))
    has_dim = F.coalesce(F.col("__in_dim"), F.lit(False))

    # 1) open rows whose key is absent from the snapshot, or unchanged
    keep_open = joined.filter(
        has_dim & (~has_snap | (has_snap & ~changed))
    ).select(*[F.col(c) for c in dim_cols])

    # 2) open rows superseded by a changed snapshot: close them
    close = joined.filter(has_dim & has_snap & changed).select(
        *[
            ts.alias(eff_to) if c == eff_to
            else F.lit(False).alias(current_col) if c == current_col
            else F.col(c)
            for c in dim_cols
        ]
    )

    # 3) new open versions: changed keys + brand-new keys
    fresh = joined.filter(has_snap & (~has_dim | changed)).select(
        *[
            F.col(f"__new_{c}").alias(c) if c in tracked
            else ts.alias(eff_from) if c == eff_from
            else F.lit(None).cast(dim.schema[eff_to].dataType).alias(eff_to)
            if c == eff_to
            else F.lit(True).alias(current_col) if c == current_col
            else F.col(c)
            for c in dim_cols
        ]
    )

    return closed_rows.unionByName(keep_open).unionByName(close).unionByName(fresh)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    delete_unmatched: bool = False,
    check_unique_source: bool = True,
) -> DataFrame:
    """ANSI ``MERGE INTO`` semantics as one declarative plan: rows
    matched on ``keys`` take the source's values for ``update_cols``
    (WHEN MATCHED THEN UPDATE — all non-key columns by default),
    unmatched source rows are inserted (WHEN NOT MATCHED THEN
    INSERT), and with ``delete_unmatched`` target rows absent from
    the source are dropped (WHEN NOT MATCHED BY SOURCE THEN DELETE)
    — the table-maintenance primitive behind Delta/Iceberg MERGE,
    expressed engine-neutrally.

    Both frames must share a schema; keys are compared null-safely
    (a NULL key matches a NULL key, unlike a plain equi-join).

    PRECONDITION: merge keys are unique within the source — ANSI MERGE
    (and Delta/Iceberg) raise when multiple source rows match one
    target row; a duplicated delta must fail loudly, not silently grow
    the table.  With ``check_unique_source`` (default) the source side
    carries an in-plan uniqueness assertion that fails the job on the
    first duplicate key; disable only when the source is known-unique
    upstream and the extra source-side shuffle matters.

    Scale shape: ONE equi-join on the merge keys (broadcast when the
    source delta is small — the common case; shuffle-hash otherwise)
    + a narrow projection: the outer-join form encodes all three
    WHEN branches at once, no unions, no second pass.  Pair with
    ``write_bucketed`` on the keys so repeated nightly merges never
    re-shuffle the big side.
    """
    if set(target.columns) != set(source.columns):
        raise ValueError(
            "merge_upsert needs identical schemas "
            f"(target {target.columns} vs source {source.columns})"
        )
    for k in keys:
        if k not in target.columns:
            raise ValueError(f"merge key {k!r} not in schema")
    if update_cols is None:
        update_cols = [c for c in target.columns if c not in keys]
    for c in update_cols:
        if c not in target.columns or c in keys:
            raise ValueError(f"bad update column {c!r}")
    if check_unique_source:
        source = _assert_unique_keys(source, keys, "source")
    t = target.withColumn("__tgt", F.lit(True)).alias("t")
    s = source.withColumn("__src", F.lit(True)).alias("s")
    cond = None
    for k in keys:
        e = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = e if cond is None else cond & e
    joined = t.join(s, cond, "full_outer")
    in_src = F.col("s.__src").isNotNull()
    in_tgt = F.col("t.__tgt").isNotNull()
    if delete_unmatched:
        joined = joined.filter(in_src)
    out_cols = []
    for c in target.columns:
        if c in keys:
            out_cols.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
        elif c in update_cols:
            # matched or insert: source value; target-only: target value
            out_cols.append(
                F.when(in_src, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
        else:
            # non-updated column: target value when the row existed,
            # source value only for pure inserts
            out_cols.append(
                F.when(in_tgt, F.col(f"t.{c}")).otherwise(F.col(f"s.{c}")).alias(c)
            )
    return joined.select(*out_cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Audit diff between two table snapshots: per key, is the row
    ``added`` (key only in ``new``), ``removed`` (only in ``old``),
    ``changed`` (present in both, any compared column differs,
    null-safely) or ``unchanged`` — the data-engineering staple behind
    CDC validation, backfill review and replication checks.

    ``compare_cols`` defaults to the non-key columns common to both
    frames.  Keys must be non-null on both sides (the usual snapshot
    contract; a null key never matches itself in the join).

    Output: key columns + ``change_type`` + ``n_changed_cols``
    (0 for added/removed — the whole row moved, not columns).

    Scale shape: ONE full outer equi-join on the key (the minimum
    possible — every diff must reconcile both sides), with the
    column comparison a narrow null-safe projection on top; no
    window, no second pass.  At 100 TB both sides shuffle once on
    the same key — co-partitioned if the snapshots are bucketed.
    """
    if not keys:
        raise ValueError("snapshot_diff needs at least one key column")
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, on=keys, how="full_outer")
    n_changed = F.lit(0)
    for c in compare_cols:
        n_changed = n_changed + (
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        ).cast("int")
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(n_changed > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *keys,
        change.alias("change_type"),
        F.when(
            F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull(),
            n_changed,
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("n_changed_cols"),
    )
    if include_unchanged:
        return out
    return out.filter(F.col("change_type") != "unchanged")


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    payload: list[str] | None = None,
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply an ordered change-data-capture log to a snapshot — the
    replication primitive behind Debezium/binlog ingestion: ``changes``
    carries (keys..., payload..., ``seq_col``, ``op_col``) where op is
    an upsert (any value but ``delete_op``) or a delete; for each key
    only the change with the HIGHEST sequence number counts, and the
    new snapshot is

    - base row, when the key has no change;
    - the latest change's payload, when its op is an upsert (covers
      both UPDATE of an existing key and INSERT of a new one);
    - nothing, when the latest op is a delete (idempotent: deleting an
      absent key is a no-op).

    PRECONDITION: ``seq_col`` is unique per key (any CDC source with a
    log offset satisfies this); ties would make "latest" ambiguous.

    Scale shape: the last-wins reduction is a window over the
    CHANGELOG ONLY, partitioned by key (the delta is the small side;
    per-key change runs are bounded by construction), then ONE
    null-safe full-outer equi-join against the snapshot on the key —
    broadcast when the delta is small, shuffle-hash otherwise.  The
    snapshot itself is never windowed or re-sorted; with both sides
    bucketed on the key the nightly apply is shuffle-free.
    """
    if payload is None:
        payload = [c for c in base.columns if c not in keys]
    for c in (*keys, *payload):
        if c not in base.columns or c not in changes.columns:
            raise ValueError(f"column {c!r} missing from base or changes")
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(seq_col).desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(k) for k in keys],
            *[F.col(c).alias(f"__new_{c}") for c in payload],
            F.col(op_col).alias("__op"),
        )
    )
    b = base.select(*keys, *payload).withColumn("__in_base", F.lit(True)).alias("b")
    c_ = latest.withColumn("__in_chg", F.lit(True)).alias("c")
    cond = None
    for k in keys:
        e = F.col(f"b.{k}").eqNullSafe(F.col(f"c.{k}"))
        cond = e if cond is None else cond & e
    joined = b.join(c_, cond, "full_outer")
    has_chg = F.col("c.__in_chg").isNotNull()
    survives = ~has_chg | (F.col("c.__op") != F.lit(delete_op))
    out_cols = [
        F.coalesce(F.col(f"b.{k}"), F.col(f"c.{k}")).alias(k) for k in keys
    ]
    out_cols += [
        F.when(has_chg, F.col(f"__new_{c}")).otherwise(F.col(f"b.{c}")).alias(c)
        for c in payload
    ]
    return joined.filter(survives).select(*out_cols)


def golden_records(
    df: DataFrame,
    cluster_col: str,
    rules: dict[str, tuple[str, str | None]],
    recency_col: str | None = None,
) -> DataFrame:
    """Field-level SURVIVORSHIP merge — the "golden record" step of
    master-data management: after entity resolution clusters records
    (exact_dedup / blocked_jaccard_pairs + connected_components own
    the matching), each cluster collapses to ONE canonical row with a
    per-field rule:

    - ``("max", None)`` / ``("min", None)`` / ``("sum", None)``:
      plain aggregates (sum callers wanting exactness pre-scale to an
      integer grid).
    - ``("latest", None)`` / ``("earliest", None)``: value from the
      most/least recent record by ``recency_col`` (``max_by`` /
      ``min_by`` — ties resolved by Spark's first-encountered; pass a
      unique recency key for determinism).
    - ``("latest_non_null", None)``: most recent NON-NULL value — the
      standard phone/email rule; rows whose value is NULL are ignored
      because their ordering key is masked to NULL (``max_by`` skips
      NULL ordering keys).
    - ``("mode", None)``: most frequent value, ties to the SMALLEST
      value (deterministic, engine-portable).

    Output: one row per cluster: ``(cluster, <field per rule>,
    n_records)``.  Scale shape: ONE map-combined hash aggregate keyed
    by cluster — survivorship never shuffles more than (clusters x
    fields); the mode rule alone needs a per-(cluster, value) count
    first, done as a self-contained pre-aggregate joined back in
    (still bounded by distinct values per cluster)."""
    if recency_col is None and any(
        r[0] in ("latest", "earliest", "latest_non_null")
        for r in rules.values()
    ):
        raise ValueError("recency-based rules need recency_col")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_records")]
    mode_cols = [c for c, (rule, _) in rules.items() if rule == "mode"]
    for col, (rule, _arg) in rules.items():
        c = F.col(col)
        if rule == "max":
            aggs.append(F.max(c).alias(col))
        elif rule == "min":
            aggs.append(F.min(c).alias(col))
        elif rule == "sum":
            aggs.append(F.sum(c).alias(col))
        elif rule == "latest":
            aggs.append(F.max_by(c, F.col(recency_col)).alias(col))
        elif rule == "earliest":
            aggs.append(F.min_by(c, F.col(recency_col)).alias(col))
        elif rule == "latest_non_null":
            aggs.append(
                F.max_by(
                    c, F.when(c.isNotNull(), F.col(recency_col))
                ).alias(col)
            )
        elif rule == "mode":
            continue  # handled via the count pre-aggregate below
        else:
            raise ValueError(f"unknown survivorship rule {rule!r}")
    out = df.groupBy(F.col(cluster_col).alias("__cluster")).agg(*aggs)
    for col in mode_cols:
        counts = (
            df.filter(F.col(col).isNotNull())
            .groupBy(F.col(cluster_col).alias("__cluster"), F.col(col))
            .agg(F.count(F.lit(1)).alias("__n"))
            .groupBy("__cluster")
            .agg(
                # most frequent; ties -> smallest value: max over
                # (count, reversed-value) via min_by on (-count, value)
                F.min_by(
                    F.col(col), F.struct((-F.col("__n")).alias("a"), F.col(col).alias("b"))
                ).alias(col)
            )
        )
        out = out.join(counts, "__cluster", "left")
    return out.withColumnRenamed("__cluster", cluster_col)
