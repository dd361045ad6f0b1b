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
