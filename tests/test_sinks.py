"""Sinks: partitioned write round-trip + partition pruning, and
bucketed tables joining with no shuffle exchange."""

import os
import tempfile

from pyspark.sql import functions as F

from pandasy_spark.sources import (
    load_table,
    read_back,
    write_bucketed_table,
    write_parquet,
)


def test_partitioned_write_roundtrip_and_pruning(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "li_part")
        write_parquet(li, path, partition_by=["l_returnflag"])
        # hive-style partition directories exist
        assert any(x.startswith("l_returnflag=") for x in os.listdir(path))
        back = read_back(spark, path)
        assert back.count() == li.count()
        # partition pruning: only one partition directory is scanned
        pruned = back.filter(F.col("l_returnflag") == "R")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        expected = li.filter(F.col("l_returnflag") == "R").count()
        assert pruned.count() == expected


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed_table(li, "li_bkt", ["l_orderkey"], 4, sort_by=["l_orderkey"])
    write_bucketed_table(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bkt",
        ["l_orderkey"],
        4,
        sort_by=["l_orderkey"],
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge join (small test tables would otherwise
        # broadcast, bypassing the bucketed layout entirely)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("li_bkt")
        b = spark.table("ord_bkt")
        joined = a.join(b, on="l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_range_sorted_write_has_disjoint_file_stats(spark, sf_dir, tmp_path):
    """write_range_sorted must produce files whose sort-key min/max
    ranges don't overlap — the property that makes parquet stats prune
    whole files for range predicates."""
    import glob

    import pyarrow.parquet as pq

    from pandasy_spark.sources import load_table, write_range_sorted

    out = str(tmp_path / "orders_by_date")
    orders = load_table(spark, sf_dir, "orders")
    write_range_sorted(orders, out, ["o_orderdate"], num_files=8)

    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            "o_orderdate"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)  # disjoint (boundary value may touch)

    # and Spark actually prunes: a narrow date filter reads fewer rows
    back = spark.read.parquet(out).filter(
        F.col("o_orderdate") < F.lit("1995-02-01").cast("timestamp")
    )
    assert back.count() == orders.filter(
        F.col("o_orderdate") < F.lit("1995-02-01").cast("timestamp")
    ).count()


def test_csv_jsonl_round_trip_with_corrupt_quarantine(spark, sf_dir, tmp_path):
    """CSV and JSONL readers: schema-pinned round trip preserves values
    and nulls; malformed rows land in _corrupt_record instead of
    disappearing."""
    from pandasy_spark.convert import to_df
    from pandasy_spark.sources import read_csv, read_jsonl, write_csv, write_jsonl

    df = to_df(
        spark,
        [[1, "alpha", 1.5], [2, None, -0.25], [3, "gamma", None]],
        "id:long,name:str,score:double",
    )
    csv_dir, json_dir = str(tmp_path / "c"), str(tmp_path / "j")
    write_csv(df, csv_dir)
    write_jsonl(df, json_dir)

    back_csv = read_csv(spark, csv_dir, schema="id:long,name:str,score:double")
    back_json = read_jsonl(spark, json_dir, schema="id:long,name:str,score:double")
    expect = sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, back_csv.collect())) == expect
    assert sorted(map(tuple, back_json.collect())) == expect

    # corrupt quarantine: a malformed JSON line is kept, flagged, parseable rows intact
    bad = tmp_path / "j" / "zz_bad.json"
    bad.write_text('{"id": 9, "name": "ok", "score": 2.0}\n{not json at all}\n')
    with_bad = read_jsonl(
        spark, json_dir, schema="id:long,name:str,score:double", keep_corrupt=True
    )
    rows = with_bad.collect()
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and corrupt[0]["id"] is None
    assert len([r for r in rows if r["id"] == 9]) == 1


def test_ensure_min_partitions_parallelizes_small_scan(spark, sf_dir):
    from pandasy_spark.sources import ensure_min_partitions, load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    out = ensure_min_partitions(docs, 8)
    assert out.rdd.getNumPartitions() >= 8
    # same rows, same values
    assert out.count() == docs.count()
    a = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert a == b
    # a filter on a computed column must NOT be pushed below the
    # barrier back into the single-task scan stage
    heavy = out.withColumn("L", F.length("text")).filter(F.col("L") > 10)
    plan = heavy._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan
    # already-well-split input is untouched (no-op path)
    wide = spark.range(0, 1000, 1, 16)
    assert ensure_min_partitions(wide, 8) is wide


def test_zorder_layout_prunes_non_leading_dimension(spark, sf_dir, tmp_path):
    """The point of Z-ordering: a predicate on the SECOND clustering
    column should skip most files in the z-ordered layout, while the
    linear (first-column-sorted) layout leaves every file's stats
    overlapping it.  Checked directly against parquet footer min/max."""
    import glob

    import pyarrow.parquet as pq

    from pandasy_spark.sources import load_table, write_range_sorted, write_zordered

    orders = load_table(spark, sf_dir, "orders")
    z_out = str(tmp_path / "z")
    lin_out = str(tmp_path / "lin")
    write_zordered(orders, z_out, ["o_custkey", "o_totalprice"], num_files=8)
    write_range_sorted(orders, lin_out, ["o_custkey"], num_files=8)

    lo, hi = 100_000.0, 110_000.0  # narrow o_totalprice band

    def overlapping_files(path: str) -> tuple[int, int]:
        total, overlap = 0, 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = [
                md.schema.column(i).name for i in range(md.num_columns)
            ].index("o_totalprice")
            fmin = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            total += 1
            if fmax >= lo and fmin <= hi:
                overlap += 1
        return total, overlap

    z_total, z_hit = overlapping_files(z_out)
    lin_total, lin_hit = overlapping_files(lin_out)
    assert z_total >= 4 and lin_total >= 4
    # linear layout: o_totalprice is unclustered, every file overlaps
    assert lin_hit == lin_total
    # z-order: the narrow band must skip at least half the files
    assert z_hit <= z_total // 2, (z_hit, z_total)


def test_zorder_value_matches_reference_interleave(spark):
    """with_zorder's unrolled shift/or chain equals a bit-twiddling
    reference implementation on a normalized grid."""
    from pandasy_spark.sources import with_zorder

    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = {
        (r["x"], r["y"]): r["__z"]
        for r in with_zorder(df, ["x", "y"], bits=3).collect()
    }

    def ref(x, y):
        # min=0 max=7 -> rank = floor(v * 7 / 7) = v
        z = 0
        for b in range(3):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert out == {(x, y): ref(x, y) for x, y in rows}


def test_compact_parquet_reduces_file_count_and_preserves_rows(
    spark, sf_dir, tmp_path
):
    import glob

    from pandasy_spark.sources import compact_parquet, load_table

    out = str(tmp_path / "shattered")
    orders = load_table(spark, sf_dir, "orders")
    n_rows = orders.count()
    # simulate a streaming sink's small-file mess
    orders.repartition(64).write.parquet(out)
    assert len(glob.glob(out + "/*.parquet")) >= 32

    total = sum(
        __import__("os").path.getsize(f) for f in glob.glob(out + "/*.parquet")
    )
    n_files = compact_parquet(spark, out, target_file_bytes=max(1, total // 4))
    files = glob.glob(out + "/*.parquet")
    assert len(files) == n_files <= 8
    assert spark.read.parquet(out).count() == n_rows


def test_compact_parquet_sorted_keeps_disjoint_ranges(spark, sf_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from pandasy_spark.sources import compact_parquet, load_table

    out = str(tmp_path / "resort")
    load_table(spark, sf_dir, "orders").repartition(16).write.parquet(out)
    total = sum(
        __import__("os").path.getsize(f) for f in glob.glob(out + "/*.parquet")
    )
    compact_parquet(
        spark, out, target_file_bytes=max(1, total // 4), sort_cols=["o_orderkey"]
    )
    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            "o_orderkey"
        )
        stats = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # compacted-sorted files stay range-disjoint


def test_read_parquet_merged_schema_unions_columns(spark, tmp_path):
    from pandasy_spark.sources import read_parquet_merged_schema

    p1 = str(tmp_path / "v1")
    p2 = str(tmp_path / "v2")
    spark.createDataFrame([(1, "a")], ["id", "x"]).write.parquet(p1)
    spark.createDataFrame([(2, "b", 9.5)], ["id", "x", "score"]).write.parquet(p2)
    df = read_parquet_merged_schema(spark, p1, p2)
    assert set(df.columns) == {"id", "x", "score"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    from pandasy_spark.sources import load_table, read_orc, write_orc

    out = str(tmp_path / "orders_orc")
    orders = load_table(spark, sf_dir, "orders")
    write_orc(orders, out)
    back = read_orc(spark, out)
    assert back.count() == orders.count()
    filtered = back.filter(back.o_orderkey == 1)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderkey" in plan


def test_read_text_lines(spark, tmp_path):
    from pandasy_spark.sources import read_text_lines

    p = tmp_path / "raw.txt"
    p.write_text("first line\nsecond line\n")
    df = read_text_lines(spark, str(p))
    assert [r["value"] for r in df.orderBy("value").collect()] == [
        "first line",
        "second line",
    ]


def test_hilbert_value_matches_xy2d_reference(spark):
    """with_hilbert's unrolled state machine equals the textbook
    Wikipedia xy2d recursion on a full normalized grid."""
    from pandasy_spark.sources import with_hilbert

    bits = 5
    n = 1 << bits
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = {
        (r["x"], r["y"]): r["__h"]
        for r in with_hilbert(df, ["x", "y"], bits=bits).collect()
    }

    def xy2d(x, y):
        d = 0
        s = 1 << (bits - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        return d

    assert out == {(x, y): xy2d(x, y) for x, y in rows}


def test_hilbert_consecutive_keys_are_grid_neighbors(spark):
    """The locality property Z-order lacks: consecutive Hilbert keys
    are ALWAYS one grid step apart (Morton seams jump half the
    space) — the reason Hilbert file ranges get tighter bounding
    boxes at the same write cost."""
    from pandasy_spark.sources import with_hilbert

    bits = 4
    n = 1 << bits
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        r["__h"]: (r["x"], r["y"])
        for r in with_hilbert(df, ["x", "y"], bits=bits).collect()
    }
    assert len(got) == n * n  # a bijection onto [0, 4^bits)
    assert set(got) == set(range(n * n))
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = got[d], got[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, (d, got[d], got[d + 1])


def test_hilbert_write_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """write_hilbert file stats prune a narrow box predicate on the
    NON-leading dimension at least as well as a linear sort."""
    import pyarrow.parquet as pq

    from pandasy_spark.sources import load_table, write_hilbert, write_range_sorted

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    h_out = str(tmp_path / "hilbert")
    lin_out = str(tmp_path / "linear")
    write_hilbert(orders, h_out, ["o_custkey", "o_totalprice"], num_files=8)
    write_range_sorted(orders, lin_out, ["o_custkey"], num_files=8)

    # band chosen INSIDE the lower half of the y range: a band that
    # straddles the global midline touches all four top-level Hilbert
    # quadrants by construction, so no space-filling curve could prune
    # it at this file count — the fair test is a non-straddling box
    lo, hi = orders.agg(
        F.expr("percentile(o_totalprice, 0.22)"),
        F.expr("percentile(o_totalprice, 0.28)"),
    ).first()

    def files_hit(path):
        import glob

        total = hit = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            fmin = min(
                md.row_group(i).column(2).statistics.min
                for i in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(i).column(2).statistics.max
                for i in range(md.num_row_groups)
            )
            total += 1
            hit += not (fmax < lo or fmin > hi)
        return hit, total

    lin_hit, lin_total = files_hit(lin_out)
    h_hit, h_total = files_hit(h_out)
    assert lin_hit == lin_total  # linear sort on custkey prunes nothing
    assert h_hit <= h_total // 2, (h_hit, h_total)


def test_hilbert_rejects_non_2d(spark):
    import pytest as _pytest

    from pandasy_spark.sources import with_hilbert

    df = spark.createDataFrame([(1, 2, 3)], ["a", "b", "c"])
    with _pytest.raises(ValueError):
        with_hilbert(df, ["a", "b", "c"])


def test_schema_diff_reports_added_removed_and_type_changes(
    spark, tmp_path
):
    from pandasy_spark.sources import schema_diff

    a = spark.createDataFrame(
        [(1, "x", 1.5)], ["id", "name", "score"]
    )
    b = spark.createDataFrame(
        [(1, "x", 2, True)], ["id", "name", "score", "flag"]
    )
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    a.write.parquet(pa)
    b.write.parquet(pb)
    diff = {d["column"]: d for d in schema_diff(spark, pa, pb)}
    assert diff["flag"]["change"] == "added" and diff["flag"]["to"] == "boolean"
    assert diff["score"]["change"] == "type_changed"
    assert diff["score"]["from"] == "double" and diff["score"]["to"] == "bigint"
    assert "id" not in diff and "name" not in diff
    # identical schemas -> empty report
    assert schema_diff(spark, pa, pa) == []


def test_schema_diff_nested_struct_paths(spark, tmp_path):
    from pyspark.sql import functions as F

    from pandasy_spark.sources import schema_diff

    a = spark.range(1).select(
        F.struct(F.lit(1).alias("x"), F.lit("s").alias("y")).alias("meta")
    )
    b = spark.range(1).select(
        F.struct(F.lit(1).alias("x"), F.lit(2.0).alias("y"),
                 F.lit(True).alias("z")).alias("meta")
    )
    pa, pb = str(tmp_path / "na"), str(tmp_path / "nb")
    a.write.parquet(pa)
    b.write.parquet(pb)
    diff = {d["column"]: d for d in schema_diff(spark, pa, pb)}
    assert diff["meta.z"]["change"] == "added"
    assert diff["meta.y"]["change"] == "type_changed"
    assert "meta.x" not in diff
