"""Salting rewrites are exact; the UDTF surface works via SQL lateral."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakeshack_spark.operators import skew
from lakeshack_spark.functions.udtf import register_udtfs
from lakeshack_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one key — the pathological groupBy shape."""
    hot = spark.range(9000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    cold = spark.range(1000).select(
        F.concat(F.lit("cold"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_count_exact(spark, skewed):
    got = {r["k"]: r["n"] for r in skew.salted_count(skewed, ["k"]).collect()}
    want = {
        r["k"]: r["n"]
        for r in skewed.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_salted_sum_exact(spark, skewed):
    got = {r["k"]: r["total"] for r in skew.salted_sum(skewed, ["k"], "v", 0).collect()}
    want = {
        r["k"]: float(r["t"])
        for r in skewed.groupBy("k").agg(F.sum("v").alias("t")).collect()
    }
    assert got == want


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"cold{i}", i) for i in range(50)], "k string, tag int"
    )
    got = skew.salted_join(skewed, dim, "k")
    want = skewed.join(dim, "k")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_ngrams_udtf_lateral(spark):
    register_udtfs(spark)
    docs = load_table(spark, SF, "documents").limit(5)
    docs.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, g.pos, g.ngram
        FROM udtf_docs d, LATERAL ngrams(d.text, 3) g
        """
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for r in docs.collect():
        n_words = len(r["text"].split(" "))
        assert len(by_doc[r["doc_id"]]) == max(n_words - 2, 0)
        first = min(by_doc[r["doc_id"]], key=lambda x: x["pos"])
        assert first["ngram"] == " ".join(r["text"].split(" ")[:3])
