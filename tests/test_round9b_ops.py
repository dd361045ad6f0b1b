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
