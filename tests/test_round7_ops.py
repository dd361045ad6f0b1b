"""Round-7 operator tests: LSH->exact compositions (lsh_verified_pairs,
lsh_anchor_dedup) and the _spread intake guard."""

from __future__ import annotations

from pyspark.sql import functions as F

import pandasy_spark.extended.dedup as D


def _docs(spark, sf_dir, n=150):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < n)
    )


class TestLshVerifiedPairs:
    def test_subset_of_exact_pairs(self, spark, sf_dir):
        """Every verified pair IS an exact-Jaccard pair (precision is
        exact by construction); LSH only bounds recall."""
        docs = _docs(spark, sf_dir)
        got = {
            (r.id1, r.id2, r.jaccard)
            for r in D.lsh_verified_pairs(docs, threshold=0.6).collect()
        }
        # exact kernel uses STRING shingles; hashed sets differ only by
        # ~1e-5 collisions, so jaccard values must agree at 4 decimals
        exact = {
            (r.id1, r.id2, r.jaccard)
            for r in D.ngram_jaccard_pairs(
                docs, n=3, threshold=0.6, max_rows=1000
            ).collect()
        }
        assert got <= exact
        assert len(got) > 0

    def test_high_threshold_recall(self, spark, sf_dir):
        """At thresholds well above the LSH operating point the bands
        catch every true pair: 16 bands of width 2 miss a j=0.9 pair
        with prob (1-0.81)^16 ~ 5e-12."""
        docs = _docs(spark, sf_dir)
        got = {
            (r.id1, r.id2)
            for r in D.lsh_verified_pairs(docs, threshold=0.9).collect()
        }
        exact = {
            (r.id1, r.id2)
            for r in D.ngram_jaccard_pairs(
                docs, n=3, threshold=0.9, max_rows=1000
            ).collect()
        }
        assert got == exact


class TestLshAnchorDedup:
    def test_drops_are_true_dups(self, spark, sf_dir):
        """Each emitted (doc_id, dup_of) row is a verified >= 0.6 exact
        pair with dup_of < doc_id."""
        docs = _docs(spark, sf_dir)
        dropped = D.lsh_anchor_dedup(docs, threshold=0.6).collect()
        assert len(dropped) > 0
        exact = {
            (r.id1, r.id2)
            for r in D.ngram_jaccard_pairs(
                docs, n=3, threshold=0.6, max_rows=1000
            ).collect()
        }
        for r in dropped:
            assert r.dup_of < r.doc_id
            assert (r.dup_of, r.doc_id) in exact
            assert r.jaccard >= 0.6

    def test_linear_output(self, spark, sf_dir):
        """At most one row per document, survivors never listed."""
        docs = _docs(spark, sf_dir)
        out = D.lsh_anchor_dedup(docs, threshold=0.6)
        n_docs = docs.count()
        assert out.count() == out.select("doc_id").distinct().count()
        assert out.count() < n_docs


class TestSpread:
    def test_spreads_single_partition(self, spark, sf_dir):
        docs = _docs(spark, sf_dir).coalesce(1)
        assert D._spread(docs).rdd.getNumPartitions() > 1

    def test_noop_when_parallel(self, spark, sf_dir):
        par = spark.sparkContext.defaultParallelism
        docs = _docs(spark, sf_dir).repartition(par)
        # already at target parallelism: returned plan is the input
        assert D._spread(docs) is docs


class TestAdviceR6Fixes:
    def test_binary_metrics_integer_01_columns(self, spark):
        """0/1 integer labels must count identically to booleans —
        bitwise ~1 == -2 previously poisoned the confusion counts."""
        from pandasy_spark.extended.ml import binary_metrics

        rows = [(1, 1), (1, 0), (0, 1), (0, 0), (1, 1), (None, 1)]
        ints = spark.createDataFrame(rows, "label int, pred int")
        bools = spark.createDataFrame(
            [(bool(a) if a is not None else None,
              bool(b) if b is not None else None) for a, b in rows],
            "label boolean, pred boolean",
        )
        ri = binary_metrics(ints, "label", "pred").collect()[0]
        rb = binary_metrics(bools, "label", "pred").collect()[0]
        assert (ri.tp, ri.fp, ri.fn, ri.tn) == (rb.tp, rb.fp, rb.fn, rb.tn)
        assert (ri.tp, ri.fp, ri.fn, ri.tn) == (2, 1, 1, 1)

    def test_qoi_header_channels_matches_array(self):
        import numpy as np

        from pandasy_spark.extended.qoi import encode_qoi

        rgba = np.zeros((2, 2, 4), dtype=np.uint8)
        rgba[..., 3] = 200
        enc = encode_qoi(rgba)
        assert enc[12] == 4  # header channels byte reflects RGBA
        rgb = np.zeros((2, 2, 3), dtype=np.uint8)
        assert encode_qoi(rgb)[12] == 3
        import pytest as _pytest

        with _pytest.raises(ValueError, match="channels"):
            encode_qoi(rgb, channels=4)

    def test_psi_jsd_null_on_empty_slice(self, spark):
        """A missing baseline (or current) slice yields NULL, never a
        'stable'-reading ~0 drift."""
        from pyspark.sql import functions as F

        from pandasy_spark.extended.profile import jsd_drift, psi_drift

        df = spark.createDataFrame(
            [(float(i), "cur") for i in range(20)], "v double, slice string"
        )
        r = psi_drift(df, "v", F.col("slice") == "base").collect()[0]
        assert r.n_base == 0 and r.psi is None
        r = jsd_drift(df, "v", F.col("slice") == "base").collect()[0]
        assert r.n_base == 0 and r.jsd is None
        # non-empty slices still produce a value
        df2 = spark.createDataFrame(
            [(float(i % 7), "base" if i % 2 else "cur") for i in range(40)],
            "v double, slice string",
        )
        assert psi_drift(df2, "v", F.col("slice") == "base").collect()[0].psi is not None


class TestEquidepthHistogram:
    def test_approx_edges_bracket_exact(self, spark, sf_dir):
        """The sort-free default's bucket edges must land inside the
        exact NTILE buckets' value ranges (GK sketch rank error at
        accuracy=10000 on sf0.001 is below one row)."""
        from pandasy_spark.extended.profile import equidepth_histogram

        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        approx = {
            r.bucket: r
            for r in equidepth_histogram(o, "o_totalprice", 8).collect()
        }
        exact = {
            r.bucket: r
            for r in equidepth_histogram(
                o, "o_totalprice", 8, exact=True, tie_col="o_orderkey"
            ).collect()
        }
        assert set(approx) == set(exact) == set(range(1, 9))
        total = o.count()
        assert sum(r.n for r in approx.values()) == total
        assert sum(r.n for r in exact.values()) == total
        for k in range(1, 9):
            # approx bucket k's value range must lie within the exact
            # neighbourhood [exact k-1 lo, exact k+1 hi]
            lo_bound = exact[max(k - 1, 1)].lo
            hi_bound = exact[min(k + 1, 8)].hi
            assert lo_bound <= approx[k].lo <= approx[k].hi <= hi_bound
            # equi-depth: counts within 25% of ideal depth
            assert abs(approx[k].n - total / 8) <= total / 8 * 0.25

    def test_default_plan_has_no_global_sort_window(self, spark, sf_dir):
        from pandasy_spark.extended.profile import equidepth_histogram

        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        plan = (
            equidepth_histogram(o, "o_totalprice", 8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # "ntile(" not "ntile": percentile_approx contains "ntile_"
        assert "ntile(" not in plan
        assert "Window" not in plan


class TestRfmNtileGuard:
    def test_ntile_banding_guarded_above_threshold(self, spark):
        import pytest as _pytest

        from pandasy_spark.extended.events import rfm_segments

        df = spark.createDataFrame(
            [(f"u{i}", "2024-01-0%d" % (i % 9 + 1), 10.0) for i in range(30)],
            "user_id string, ts string, value double",
        ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
        with _pytest.raises(ValueError, match="threshold"):
            rfm_segments(df, banding="ntile", max_ntile_rows=10)
        # explicit opt-out accepts the sorts
        out = rfm_segments(df, banding="ntile", max_ntile_rows=None)
        assert out.count() == 30
        # default threshold banding is untouched by the guard
        assert rfm_segments(df).count() == 30


class TestLshEdgeCases:
    def test_all_identical_corpus(self, spark):
        """Degenerate hot-cluster corpus: every doc identical -> every
        non-anchor doc drops with jaccard 1.0 against the global min."""
        df = spark.createDataFrame(
            [(i, "the same exact document text") for i in range(40)],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in D.lsh_anchor_dedup(df).collect()}
        assert set(out) == set(range(1, 40))
        assert all(r.dup_of == 0 and r.jaccard == 1.0 for r in out.values())

    def test_short_and_empty_texts_survive(self, spark):
        """Texts shorter than the shingle width produce no signature and
        are never dropped (nothing to compare) — and never crash."""
        df = spark.createDataFrame(
            [(0, ""), (1, "ab"), (2, "x"), (3, "a real document body"),
             (4, "a real document body")],
            "doc_id long, text string",
        )
        out = D.lsh_anchor_dedup(df).collect()
        assert {r.doc_id for r in out} == {4}
        assert out[0].dup_of == 3

    def test_single_doc_and_empty_frame(self, spark):
        one = spark.createDataFrame(
            [(7, "only document")], "doc_id long, text string"
        )
        assert D.lsh_anchor_dedup(one).count() == 0
        empty = spark.createDataFrame([], "doc_id long, text string")
        assert D.lsh_anchor_dedup(empty).count() == 0
        assert D.lsh_verified_pairs(empty).count() == 0
