"""Deterministic split/sample operators: disjointness, stability,
proportions, composability, and engine-portability of the hash."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lakeshack_spark.operators import sampling
from lakeshack_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


def test_hash_split_exhaustive_and_disjoint(spark, docs):
    out = sampling.hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    # proportions within a loose tolerance at n=100
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)


def test_hash_split_deterministic_and_portable(spark, docs):
    out = sampling.hash_split(docs, "doc_id", {"train": 0.8, "hold": 0.2})
    rows = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    again = {
        r["doc_id"]: r["split"]
        for r in sampling.hash_split(docs, "doc_id", {"train": 0.8, "hold": 0.2})
        .select("doc_id", "split")
        .collect()
    }
    assert rows == again
    # independent reimplementation of the bucket in pure Python
    for doc_id, split in list(rows.items())[:20]:
        digest = hashlib.md5(f"split:{doc_id}".encode()).hexdigest()
        bucket = int(digest[:15], 16) % 1_000_000
        assert split == ("train" if bucket < 800_000 else "hold"), doc_id


def test_labels_are_independent(spark, docs):
    a = sampling.hash_split(docs, "doc_id", {"x": 0.5, "y": 0.5}, label="a")
    b = sampling.hash_split(docs, "doc_id", {"x": 0.5, "y": 0.5}, label="b")
    da = {r["doc_id"]: r["split"] for r in a.select("doc_id", "split").collect()}
    db = {r["doc_id"]: r["split"] for r in b.select("doc_id", "split").collect()}
    assert da != db  # overwhelmingly likely under independence


def test_deterministic_sample_composes(spark, docs):
    half = sampling.deterministic_sample(docs, "doc_id", 0.5)
    quarter_direct = sampling.deterministic_sample(docs, "doc_id", 0.25)
    quarter_nested = sampling.deterministic_sample(half, "doc_id", 0.25)
    ids_direct = {r["doc_id"] for r in quarter_direct.select("doc_id").collect()}
    ids_nested = {r["doc_id"] for r in quarter_nested.select("doc_id").collect()}
    assert ids_nested == ids_direct  # 0.25 ⊂ 0.5 under one threshold hash


def test_stratified_fractions(spark, docs):
    out = sampling.stratified_sample(
        docs, "lang", {"en": 1.0, "de": 0.0}, key_col="doc_id", default_fraction=0.5
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang.get("en", 0) == full["en"]  # fraction 1.0 keeps all
    assert "de" not in by_lang  # fraction 0.0 keeps none
    for lang, n in by_lang.items():
        if lang not in ("en", "de"):
            assert 0 < n <= full[lang]


def test_split_is_map_only(spark, docs):
    from lakeshack_spark import plans

    out = sampling.hash_split(docs, "doc_id", {"train": 0.9, "test": 0.1})
    plan = plans.explain_str(out)
    assert "Exchange" not in plan


def test_bad_args(spark, docs):
    with pytest.raises(ValueError):
        sampling.hash_split(docs, "doc_id", {})
    with pytest.raises(ValueError):
        sampling.deterministic_sample(docs, "doc_id", 1.5)


def test_stratified_take_n_counts_and_nesting(spark, docs):
    out = sampling.stratified_take_n(docs, "lang", 5, "doc_id")
    rows = out.select("doc_id", "lang", "sample_rank").collect()
    per = {}
    for r in rows:
        per.setdefault(r.lang, []).append((r.sample_rank, r.doc_id))
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, got in per.items():
        # exactly min(n, |stratum|), ranks are 1..k with no gaps
        assert len(got) == min(5, sizes[lang])
        assert sorted(rank for rank, _ in got) == list(range(1, len(got) + 1))
    # nesting: top-5 is a prefix of top-10 (same hash ordering)
    bigger = {
        (r.lang, r.doc_id)
        for r in sampling.stratified_take_n(docs, "lang", 10, "doc_id").collect()
    }
    assert {(l, d) for l, v in per.items() for _, d in v} <= bigger
    # stability across repartitionings
    again = {
        (r.lang, r.doc_id, r.sample_rank)
        for r in sampling.stratified_take_n(
            docs.repartition(7), "lang", 5, "doc_id"
        ).collect()
    }
    assert again == {(r.lang, r.doc_id, r.sample_rank) for r in rows}


def test_stratified_take_n_rejects_bad_n(spark, docs):
    with pytest.raises(ValueError):
        sampling.stratified_take_n(docs, "lang", 0, "doc_id")


def test_epoch_shuffle_is_reproducible_permutation(spark, docs):
    ids = [r.doc_id for r in sampling.epoch_shuffle(docs, "doc_id", 1).select("doc_id").collect()]
    # a permutation of the corpus
    assert sorted(ids) == sorted(r.doc_id for r in docs.select("doc_id").collect())
    # reproducible across partitionings
    again = [
        r.doc_id
        for r in sampling.epoch_shuffle(docs.repartition(7), "doc_id", 1)
        .select("doc_id")
        .collect()
    ]
    assert again == ids
    # different epochs give different orders (decorrelated permutations)
    other = [r.doc_id for r in sampling.epoch_shuffle(docs, "doc_id", 2).select("doc_id").collect()]
    assert other != ids and sorted(other) == sorted(ids)
    # with_key exposes the sort key in sorted order
    keys = [
        r.shuffle_key
        for r in sampling.epoch_shuffle(docs, "doc_id", 1, with_key=True).collect()
    ]
    assert keys == sorted(keys)


# ------------------------------------------------- weighted systematic


def test_weighted_sample_multiplicities_sum_to_n(spark):
    from pyspark.sql import Row

    from lakeshack_spark.operators.sampling import weighted_systematic_sample

    df = spark.createDataFrame(
        [Row(k=i, w=(i % 13) + 1) for i in range(400)]
    )
    for n in (1, 7, 100, 1000):
        out = weighted_systematic_sample(df, "k", "w", n)
        rows = out.collect()
        assert sum(r["multiplicity"] for r in rows) == n
        # Without replacement whenever no weight exceeds W/n.
        total = 400 * 7  # mean weight 7
        if max((i % 13) + 1 for i in range(400)) <= total / n:
            assert all(r["multiplicity"] == 1 for r in rows)


def test_weighted_sample_partitioning_invariant(spark):
    from pyspark.sql import Row

    from lakeshack_spark.operators.sampling import weighted_systematic_sample

    df = spark.createDataFrame([Row(k=i, w=(i * 7) % 29 + 1) for i in range(300)])
    a = {
        (r["k"], r["multiplicity"])
        for r in weighted_systematic_sample(df, "k", "w", 50, n_partitions=2).collect()
    }
    b = {
        (r["k"], r["multiplicity"])
        for r in weighted_systematic_sample(
            df.repartition(13), "k", "w", 50, n_partitions=11
        ).collect()
    }
    assert a == b


def test_weighted_sample_heavy_item_multiplicity(spark):
    """An item holding half the total weight must be drawn ~n/2 times
    (systematic guarantee: floor(n*w/W) <= mult <= ceil(n*w/W))."""
    from pyspark.sql import Row

    from lakeshack_spark.operators.sampling import weighted_systematic_sample

    rows = [Row(k=i, w=1) for i in range(100)] + [Row(k=999, w=100)]
    df = spark.createDataFrame(rows)
    out = {r["k"]: r["multiplicity"] for r in
           weighted_systematic_sample(df, "k", "w", 20).collect()}
    assert out[999] in (10, 11)  # 20 * 100/200 = 10
    assert sum(out.values()) == 20


def test_weighted_sample_overflow_guard(spark):
    from pyspark.sql import Row

    from lakeshack_spark.operators.sampling import weighted_systematic_sample

    df = spark.createDataFrame([Row(k=1, w=2**61)])
    try:
        weighted_systematic_sample(df, "k", "w", 4)
        raise AssertionError("expected overflow ValueError")
    except ValueError as e:
        assert "overflows" in str(e)
