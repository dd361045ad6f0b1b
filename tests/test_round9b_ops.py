"""Round-9 session-3 batch: Spark-4-native SQL surfaces (VARIANT,
pipe syntax, collation, SQL UDFs, XML source) + multiclass confusion.
The gate oracles cover the SQL restatements; these pin the operator
math, the null conventions, and the plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandasy_spark.extended.ml import confusion_multiclass
from pandasy_spark.workload import QUERIES


class TestConfusionMulticlass:
    def test_crafted_matrix(self, spark):
        # labels:  a a a b b c      preds: a a b b b d
        rows = [
            ("a", "a"), ("a", "a"), ("a", "b"),
            ("b", "b"), ("b", "b"), ("c", "d"),
        ]
        df = spark.createDataFrame(rows, "label string, pred string")
        got = {
            r["class"]: r
            for r in confusion_multiclass(df, "label", "pred").collect()
        }
        # class set = union of labels and preds; 'd' is hallucinated,
        # 'c' never predicted
        assert set(got) == {"a", "b", "c", "d"}
        a = got["a"]
        assert (a.n_true, a.n_pred, a.tp) == (3, 2, 2)
        assert a.precision_micro == 1_000_000
        assert a.recall_micro == 2_000_000 // 3
        assert a.f1_micro == 2 * 2 * 1_000_000 // 5
        b = got["b"]
        assert (b.n_true, b.n_pred, b.tp) == (2, 3, 2)
        c = got["c"]
        assert (c.n_true, c.n_pred, c.tp) == (1, 0, 0)
        assert c.precision_micro is None  # never predicted: undefined
        assert c.recall_micro == 0
        d = got["d"]
        assert (d.n_true, d.n_pred, d.tp) == (0, 1, 0)
        assert d.precision_micro == 0
        assert d.recall_micro is None  # no true instances: undefined
        assert d.f1_micro == 0

    def test_null_in_either_excluded(self, spark):
        rows = [("a", "a"), (None, "a"), ("a", None), (None, None)]
        df = spark.createDataFrame(rows, "label string, pred string")
        got = confusion_multiclass(df, "label", "pred").collect()
        assert len(got) == 1
        assert (got[0].n_true, got[0].n_pred, got[0].tp) == (1, 1, 1)

    def test_perfect_prediction(self, spark):
        rows = [("x", "x")] * 4 + [("y", "y")] * 2
        df = spark.createDataFrame(rows, "label string, pred string")
        for r in confusion_multiclass(df, "label", "pred").collect():
            assert r.precision_micro == r.recall_micro == 1_000_000
            assert r.f1_micro == 1_000_000


class TestXmlRoundTrip:
    def test_null_is_absent_element(self, spark, tmp_path):
        from pandasy_spark.sources import read_xml, write_xml

        df = spark.createDataFrame(
            [(1, "a", 2.5), (2, None, 0.5), (3, "c", None)],
            "id long, s string, v double",
        )
        path = str(tmp_path / "xml_rt")
        write_xml(df, path, row_tag="r")
        back = read_xml(
            spark, path, row_tag="r", schema="id:long,s:str,v:double"
        )
        rows = {r.id: r for r in back.collect()}
        assert rows[2].s is None and rows[2].v == 0.5
        assert rows[3].s == "c" and rows[3].v is None
        assert rows[1].s == "a" and rows[1].v == 2.5
        # the null really is an absent element, not an empty one
        import glob

        text = "".join(
            open(p).read() for p in glob.glob(path + "/*.xml")
        )
        assert "<s>a</s>" in text
        assert text.count("<s>") == 2  # id=2 writes NO <s> element


class TestSpark4SurfacePlans:
    def test_sql_udf_inlines_no_python(self, spark, sf_dir):
        df = QUERIES["sql_udf"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_variant_parses_once(self, spark, sf_dir):
        df = QUERIES["expr_variant"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the named-projection stage: one parseJson (static_invoke of
        # VariantExpressionEvalUtils) feeding both variant_get
        # extractions (never re-parse per path)
        assert plan.count("parseJson") == 1
        assert "BatchEvalPython" not in plan

    def test_pipe_sql_same_plan_class(self, spark, sf_dir):
        # pipe syntax is parse-level: the plan must be an ordinary
        # agg-over-scan with pushdown, no extra exchanges
        df = QUERIES["sql_pipe"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan
        assert "BatchEvalPython" not in plan

    def test_collation_groups_case_insensitively(self, spark):
        df = spark.createDataFrame(
            [("ABC",), ("abc",), ("AbC",), ("xy",)], "t string"
        )
        g = (
            df.select(F.collate(F.col("t"), "UTF8_LCASE").alias("t"))
            .groupBy("t")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.collate(F.lower(F.col("t")), "UTF8_BINARY").alias("k"),
                "n",
            )
        )
        got = {r.k: r.n for r in g.collect()}
        assert got == {"abc": 3, "xy": 1}


class TestDbscan:
    def _run(self, spark, rows, eps, min_pts):
        from pandasy_spark.extended.spatial import dbscan

        df = spark.createDataFrame(rows, "id long, x long, y long")
        return {
            r.id: (r.role, r.cluster)
            for r in dbscan(df, eps=eps, min_pts=min_pts).collect()
        }

    def test_two_blobs_border_noise(self, spark):
        rows = [
            (1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 1, 1),      # blob A
            (5, 100, 100), (6, 101, 100), (7, 100, 101),
            (8, 101, 101),                                    # blob B
            (9, 50, 50),                                      # noise
            (10, 3, 0),                                       # border of A
        ]
        got = self._run(spark, rows, eps=2, min_pts=4)
        for i in (1, 2, 3, 4):
            assert got[i] == ("core", 1)
        for i in (5, 6, 7, 8):
            assert got[i] == ("core", 5)
        assert got[9] == ("noise", None)
        assert got[10] == ("border", 1)

    def test_border_joins_min_label_deterministically(self, spark):
        # point 9 is within eps of ONE core in each cluster but has
        # only 2 neighbors + itself < min_pts, so it is border, not a
        # bridge: classic DBSCAN assigns it by scan order; ours picks
        # the min cluster label (1)
        rows = [
            (1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 1, 1),   # cluster 1
            (5, 5, 0), (6, 6, 0), (7, 5, 1), (8, 6, 1),   # cluster 5
            (9, 3, 0),                                     # between
        ]
        got = self._run(spark, rows, eps=2, min_pts=4)
        assert got[9] == ("border", 1)
        assert got[1][1] == got[4][1] == 1
        assert got[5][1] == got[8][1] == 5

    def test_isolated_core_is_singleton_cluster(self, spark):
        # min_pts=1: every point is core; a lone point forms its own
        # cluster (the coalesce(component, id) path)
        rows = [(1, 0, 0), (2, 50, 50)]
        got = self._run(spark, rows, eps=2, min_pts=1)
        assert got[1] == ("core", 1)
        assert got[2] == ("core", 2)

    def test_min_pts_validated(self, spark):
        from pandasy_spark.extended.spatial import dbscan

        df = spark.createDataFrame([(1, 0, 0)], "id long, x long, y long")
        with pytest.raises(ValueError):
            dbscan(df, eps=2, min_pts=0)


class TestRandomProjection:
    def test_matches_python(self, spark):
        from pandasy_spark.extended.similarity import random_projection

        M, A = 2147483647, 48271
        rows = [(1, [0.1, -0.2, 0.05]), (2, [0.0, 0.3, -0.15])]
        df = spark.createDataFrame(rows, "id long, v array<double>")
        got = {
            r.id: list(r.proj)
            for r in random_projection(
                df, vec_col="v", out_dim=4, seed=0
            ).collect()
        }

        def sign(i, j):
            x0 = (i * 1103515245 + (j * 12345 + 12345)) % M
            x2 = (x0 * A % M) * A % M
            return 1 if x2 % 2 == 1 else -1

        import math

        for rid, vec in rows:
            g = [math.floor(v * 1000 + 0.5) for v in vec]
            expect = [
                sum(g[i] * sign(i, j) for i in range(len(g)))
                for j in range(4)
            ]
            assert got[rid] == expect

    def test_jl_norm_preserved_in_expectation(self, spark, sf_dir):
        # E[|Px|^2] = out_dim * |x|^2 for +-1 signs; over 500 vectors
        # the empirical ratio must land near 1 (loose band: JL is a
        # concentration bound, not per-vector)
        from pandasy_spark.extended.similarity import random_projection
        from pandasy_spark.sources import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        k = 8
        pr = random_projection(emb, vec_col="embedding", out_dim=k)
        row = pr.select(
            F.aggregate(
                "proj", F.lit(0).cast("long"), lambda a, x: a + x * x
            ).alias("pn"),
            F.aggregate(
                F.transform(
                    F.col("embedding"),
                    lambda v: F.floor(
                        v.cast("double") * 1000 + F.lit(0.5)
                    ).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda a, x: a + x * x,
            ).alias("gn"),
        ).agg(F.sum("pn").alias("spn"), F.sum("gn").alias("sgn")).collect()[0]
        ratio = row.spn / (k * row.sgn)
        assert 0.7 < ratio < 1.3

    def test_validations(self, spark):
        from pandasy_spark.extended.similarity import random_projection

        df = spark.createDataFrame([(1, [0.1])], "id long, v array<double>")
        with pytest.raises(ValueError):
            random_projection(df, vec_col="v", out_dim=0)
        with pytest.raises(ValueError):
            random_projection(df, vec_col="v", scale=0)


class TestBatch2Plans:
    def test_dbscan_no_cartesian(self, spark, sf_dir):
        df = QUERIES["spatial_dbscan"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan

    def test_rp_is_narrow_map(self, spark, sf_dir):
        df = QUERIES["embedding_rp"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # projection fuses into the scan
        assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------
# Hypothesis fuzz: the session-3 operators vs independent Python
# re-implementations (same convention as test_round9_ops.py)
# ---------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_H = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_dbscan(pts, eps, min_pts):
    """Reference DBSCAN with the repo's deterministic label algebra."""
    import itertools

    ids = [i for i, _, _ in pts]
    pos = {i: (x, y) for i, x, y in pts}
    nbr = {i: set() for i in ids}
    for a, b in itertools.combinations(ids, 2):
        dx = pos[a][0] - pos[b][0]
        dy = pos[a][1] - pos[b][1]
        if dx * dx + dy * dy <= eps * eps:
            nbr[a].add(b)
            nbr[b].add(a)
    core = {i for i in ids if len(nbr[i]) + 1 >= min_pts}
    # components over core-core edges, label = min core id
    label = {}
    for c in sorted(core):
        if c in label:
            continue
        stack, comp = [c], []
        seen = {c}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in nbr[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    out = {}
    for i in ids:
        if i in core:
            out[i] = ("core", label[i])
        else:
            cand = [label[v] for v in nbr[i] if v in core]
            if cand:
                out[i] = ("border", min(cand))
            else:
                out[i] = ("noise", None)
    return out


@given(
    pts=st.lists(
        st.tuples(
            st.integers(0, 30),  # x
            st.integers(0, 30),  # y
        ),
        min_size=1,
        max_size=25,
    ),
    eps=st.integers(1, 8),
    min_pts=st.integers(1, 5),
)
@settings(**_H)
@pytest.mark.slow
def test_dbscan_fuzz_vs_python(spark, pts, eps, min_pts):
    from pandasy_spark.extended.spatial import dbscan

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r.id: (r.role, r.cluster)
        for r in dbscan(df, eps=eps, min_pts=min_pts).collect()
    }
    assert got == _py_dbscan(rows, eps, min_pts)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_H)
@pytest.mark.slow
def test_confusion_fuzz_vs_python(spark, rows):
    from pandasy_spark.extended.ml import confusion_multiclass

    labeled = [(f"c{l}", f"c{p}") for l, p in rows]
    df = spark.createDataFrame(labeled, "label string, pred string")
    got = {
        r["class"]: (
            r.n_true, r.n_pred, r.tp,
            r.precision_micro, r.recall_micro, r.f1_micro,
        )
        for r in confusion_multiclass(df, "label", "pred").collect()
    }
    classes = {l for l, _ in labeled} | {p for _, p in labeled}
    expect = {}
    for c in classes:
        nt = sum(1 for l, _ in labeled if l == c)
        np_ = sum(1 for _, p in labeled if p == c)
        tp = sum(1 for l, p in labeled if l == p == c)
        expect[c] = (
            nt, np_, tp,
            tp * 10**6 // np_ if np_ else None,
            tp * 10**6 // nt if nt else None,
            2 * tp * 10**6 // (nt + np_) if nt + np_ else None,
        )
    assert got == expect


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-0.5,
                max_value=0.5,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    ),
    out_dim=st.integers(1, 5),
    seed=st.integers(0, 3),
)
@settings(**_H)
@pytest.mark.slow
def test_rp_fuzz_vs_python(spark, vecs, out_dim, seed):
    from pandasy_spark.extended.similarity import random_projection

    d = len(vecs[0])
    vecs = [v[:d] + [0.0] * (d - len(v)) for v in vecs]  # rectangular
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = {
        r.id: list(r.proj)
        for r in random_projection(
            df, vec_col="v", out_dim=out_dim, seed=seed
        ).collect()
    }
    M, A = 2147483647, 48271
    import math

    def sign(i, p):
        x0 = (i * 1103515245 + (p * 12345 + 12345)) % M
        x2 = (x0 * A % M) * A % M
        return 1 if x2 % 2 == 1 else -1

    for rid, v in rows:
        g = [math.floor(x * 1000 + 0.5) for x in v]
        expect = [
            sum(
                g[i] * sign(i, seed * 1_000_003 + j)
                for i in range(len(g))
            )
            for j in range(out_dim)
        ]
        assert got[rid] == expect


class TestStreamingSemiJoin:
    def test_semi_emits_once_per_matched_left(self, spark, sf_dir):
        # gate replay at test scale: each matched signup appears
        # EXACTLY once even when several purchases fall in its window
        out = QUERIES["streaming_semi_join"](spark, sf_dir).toPandas()
        assert out["l_id"].is_unique
        # parity with the batch EXISTS screen
        from pandasy_spark.sources import load_table
        from pyspark.sql import functions as F

        ev = load_table(spark, sf_dir, "events")
        s = ev.filter(F.col("event_type") == "signup").alias("s")
        p = ev.filter(F.col("event_type") == "purchase").alias("p")
        batch = (
            s.join(
                p,
                (F.col("s.user_id") == F.col("p.user_id"))
                & (
                    F.col("p.ts").between(
                        F.expr("s.ts - INTERVAL 30 MINUTES"),
                        F.expr("s.ts + INTERVAL 30 MINUTES"),
                    )
                ),
                "left_semi",
            )
            .select(
                F.col("user_id"), F.col("event_id").alias("l_id")
            )
            .toPandas()
        )
        got = set(zip(out["user_id"], out["l_id"]))
        want = set(zip(batch["user_id"], batch["l_id"]))
        assert got == want

    def test_tolerance_join_rejects_unknown_how(self, spark):
        # round 10 extended the accepted set with right_outer and
        # full_outer (tests/test_round10_ops.py); semi/anti variants
        # beyond left_semi remain rejected
        from pandasy_spark.streaming import stream_stream_tolerance_join

        df = spark.createDataFrame([(1,)], "user_id long")
        with pytest.raises(ValueError):
            stream_stream_tolerance_join(
                df, df, ["user_id"], "a", "b", 10, how="right_semi"
            )


class TestReviewFixes:
    """Round-9 session-3 code-review findings, each with a pinned fix."""

    def test_dbscan_rejects_string_ids(self, spark):
        from pandasy_spark.extended.spatial import dbscan

        df = spark.createDataFrame(
            [("a", 0, 0)], "id string, x long, y long"
        )
        with pytest.raises(TypeError, match="integral ids"):
            dbscan(df, eps=2, min_pts=1)

    def test_dbscan_null_coord_is_noise_even_at_min_pts_1(self, spark):
        from pandasy_spark.extended.spatial import dbscan

        df = spark.createDataFrame(
            [(1, 0, 0), (2, None, None)], "id long, x long, y long"
        )
        got = {
            r.id: (r.role, r.cluster)
            for r in dbscan(df, eps=2, min_pts=1).collect()
        }
        assert got[1] == ("core", 1)
        assert got[2] == ("noise", None)

    def test_rp_empty_vector_projects_to_zeros(self, spark):
        from pandasy_spark.extended.similarity import random_projection

        df = spark.createDataFrame(
            [(1, [0.1, 0.2]), (2, []), (3, None)],
            "id long, v array<double>",
        )
        got = {
            r.id: (list(r.proj) if r.proj is not None else None)
            for r in random_projection(df, vec_col="v", out_dim=3).collect()
        }
        assert got[2] == [0, 0, 0]          # empty: exact zero sums
        assert got[3] == [None, None, None]  # NULL: no projection
        assert all(v is not None for v in got[1])

    def test_langid_null_text_matches_oracle(self, spark):
        # the oracle CASE used to fall through to 'es' for NULL text
        # while Spark's lang_id yields NULL — parity pinned on a
        # crafted NULL-text corpus through BOTH engines
        import duckdb
        import pandas as pd

        from pandasy_spark.extended.ml import confusion_multiclass
        from pandasy_spark.extended.text import lang_id
        from pandasy_spark.workload import ORACLES

        pdf = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["the cat and the dog of a", None, "der und das ist"],
                "lang": ["en", "en", "de"],
                "source": ["s", "s", "s"],
                "n_chars": [24, 0, 15],
            }
        )
        sdf = spark.createDataFrame(pdf)
        got = (
            confusion_multiclass(
                sdf.select(
                    F.col("lang").alias("label"),
                    lang_id(F.col("text")).alias("pred"),
                ),
                "label",
                "pred",
            )
            .toPandas()
            .sort_values("class", ignore_index=True)
        )
        con = duckdb.connect()
        con.register("documents", pdf)
        want = (
            con.execute(ORACLES["ml_confusion"])
            .df()
            .sort_values("class", ignore_index=True)
        )
        for c in ("class", "n_true", "n_pred", "tp"):
            assert list(got[c]) == list(want[c]), c

    def test_variant_get_typed_path(self, spark):
        # the present path uses the TYPED (throwing) variant_get
        df = spark.createDataFrame([('{"k": 7}',)], "props string")
        row = df.select(
            F.variant_get(F.parse_json("props"), "$.k", "long").alias("k"),
            F.try_variant_get(
                F.parse_json("props"), "$.missing", "long"
            ).alias("m"),
        ).collect()[0]
        assert row.k == 7 and row.m is None
