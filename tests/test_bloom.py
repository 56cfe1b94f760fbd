"""Bloom-prefiltered semi join: no false negatives ever, exact equality
with the plain semi join, and a prefilter that actually shrinks the
probe stream."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lakeshack_spark.operators import bloom


@pytest.fixture(scope="module")
def probe(spark):
    return spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )


@pytest.fixture(scope="module")
def build(spark):
    # 50 keys present in probe + 10 absent ones
    return spark.range(0, 60).select(
        F.when(F.col("id") < 50, F.col("id") * 100)
        .otherwise(F.col("id") + 1_000_000)
        .alias("bk")
    )


def test_bloom_semi_join_equals_plain_semi(spark, probe, build):
    got = bloom.bloom_semi_join(probe, build, "k", "bk")
    want = probe.join(
        build.select(F.col("bk")), probe["k"] == F.col("bk"), "left_semi"
    )
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in want.collect()
    )
    assert sorted(r.k for r in got.collect()) == [i * 100 for i in range(50)]


def test_bloom_prefilter_no_false_negatives_and_shrinks(spark, probe, build):
    words = bloom.bloom_words(
        build.select(F.col("bk").alias("k")), "k", num_bits=1024
    )
    pre = bloom.filter_might_contain(probe, "k", words)
    kept = {r.k for r in pre.collect()}
    # every true member passes
    assert {i * 100 for i in range(50)} <= kept
    # the 1024-bit filter on 60 keys passes few of the 9950 non-members
    assert len(kept) < 1_000


def test_bloom_inexact_superset(spark, probe, build):
    sup = {
        r.k
        for r in bloom.bloom_semi_join(
            probe, build, "k", "bk", exact=False
        ).collect()
    }
    assert {i * 100 for i in range(50)} <= sup


def test_bloom_empty_build_and_validation(spark, probe):
    empty = probe.sparkSession.createDataFrame([], "bk long")
    assert bloom.bloom_semi_join(probe, empty, "k", "bk").collect() == []
    with pytest.raises(ValueError):
        bloom.bloom_words(probe, "k", num_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom.bloom_words(probe, "k", num_bits=64, num_hashes=0)


def test_bloom_deterministic(spark, probe, build):
    keys = build.select(F.col("bk").alias("k"))
    w1 = bloom.bloom_words(keys, "k", num_bits=512)
    w2 = bloom.bloom_words(keys.repartition(7), "k", num_bits=512)
    assert w1 == w2  # partitioning-independent, md5-derived


def test_bloom_md5_variant_equal_result(spark, probe, build):
    """The md5 (engine-portable) hash variant produces the same exact
    semi-join result as the xxhash64 default, and rejects unknown names."""
    a = bloom.bloom_semi_join(probe, build, "k", "bk", hash_fn="md5")
    b = bloom.bloom_semi_join(probe, build, "k", "bk", hash_fn="xxhash64")
    assert sorted(r.k for r in a.collect()) == sorted(r.k for r in b.collect())
    with pytest.raises(ValueError):
        bloom.bloom_words(probe, "k", num_bits=64, hash_fn="sha1")
