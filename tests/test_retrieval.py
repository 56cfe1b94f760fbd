"""Inverted-index retrieval: postings, boolean search, BM25 ranking.

The BM25 expression tree is pinned against a driver-side pure-Python
reference (independent of any engine's SQL), in both the production
``log`` variant and the cross-engine-exact ``rational`` variant the
DuckDB hash gate uses (queries.bm25_search_docs).
"""

from __future__ import annotations

import pytest

from lakeshack_spark.operators import retrieval

DOCS = [
    (0, "spark merge window spark"),
    (1, "merge window table scan"),
    (2, "spark spark spark filter"),
    (3, "table scan filter sort"),
    (4, "window"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_build_postings(spark, docs_df):
    got = {
        (r.doc_id, r.term): r.tf for r in retrieval.build_postings(docs_df).collect()
    }
    assert got[(0, "spark")] == 2
    assert got[(2, "spark")] == 3
    assert got[(4, "window")] == 1
    assert (1, "spark") not in got


def test_boolean_search_and_or(spark, docs_df):
    both = retrieval.boolean_search(docs_df, ["spark", "window"], mode="and")
    assert sorted(r.doc_id for r in both.collect()) == [0]
    either = retrieval.boolean_search(docs_df, ["spark", "window"], mode="or")
    got = {r.doc_id: r.n_terms_matched for r in either.collect()}
    assert got == {0: 2, 1: 1, 2: 1, 4: 1}
    # duplicate query terms collapse (AND arity counts distinct terms)
    dup = retrieval.boolean_search(docs_df, ["spark", "spark"], mode="and")
    assert sorted(r.doc_id for r in dup.collect()) == [0, 2]
    with pytest.raises(ValueError):
        retrieval.boolean_search(docs_df, [], mode="and")
    with pytest.raises(ValueError):
        retrieval.boolean_search(docs_df, ["spark"], mode="xor")


@pytest.mark.parametrize("variant", ["log", "rational"])
def test_bm25_matches_python_reference(spark, docs_df, variant):
    terms = ["spark", "window", "scan"]
    out = retrieval.bm25_scores(docs_df, terms, idf=variant)
    got = {r.doc_id: (r.n_terms_matched, r.score) for r in out.collect()}
    ref = retrieval.bm25_reference(DOCS, terms, idf=variant)
    assert set(got) == set(ref)
    for doc_id, (_, score) in got.items():
        assert score == pytest.approx(ref[doc_id], rel=1e-12)
    # doc 3 matches only 'scan'; doc 0 matches spark+window
    assert got[0][0] == 2
    assert got[3][0] == 1


def test_bm25_topk_order_and_rank(spark, docs_df):
    out = retrieval.bm25_topk(docs_df, ["spark"], k=2).collect()
    assert [r.rank for r in out] == [1, 2]
    # doc 2 (tf=3, dl=4) outranks doc 0 (tf=2, dl=4)
    assert [r.doc_id for r in out] == [2, 0]
    assert out[0].score > out[1].score
    with pytest.raises(ValueError):
        retrieval.bm25_scores(docs_df, [], idf="log")
    with pytest.raises(ValueError):
        retrieval.bm25_scores(docs_df, ["spark"], idf="nope")


def test_bm25_rational_exact_vs_reference(spark, docs_df):
    """The gated variant must be BIT-exact vs the independent Python
    tree (same IEEE ops in the same association order)."""
    terms = ["spark", "window", "scan"]
    out = retrieval.bm25_scores(docs_df, terms, idf="rational")
    got = {r.doc_id: r.score for r in out.collect()}
    ref = retrieval.bm25_reference(DOCS, terms, idf="rational")
    assert got == ref  # exact float equality, not approx


# ------------------------------------------------------ unigram LM score


def test_unigram_lm_log_matches_python(spark, docs_df):
    """Self-corpus cross-entropy: rarer tokens → higher score."""
    import math

    from lakeshack_spark.operators import text

    out = {
        r.doc_id: (r.n_tokens, r.score)
        for r in text.unigram_lm_score(docs_df, variant="log").collect()
    }
    toks = {i: t.split(" ") for i, t in DOCS}
    counts: dict[str, int] = {}
    for w in toks.values():
        for t in w:
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    for i, w in toks.items():
        want = sum(-math.log(counts[t] / total) for t in w) / len(w)
        assert out[i][0] == len(w)
        assert out[i][1] == pytest.approx(want, rel=1e-12)
    # doc 4 = lone common-ish token; doc 3 has the rarest tokens (sort)
    assert out[3][1] > out[0][1]


def test_unigram_lm_rational_exact(spark, docs_df):
    from fractions import Fraction

    from lakeshack_spark.operators import text

    out = {
        r.doc_id: r.score
        for r in text.unigram_lm_score(docs_df, variant="rational").collect()
    }
    toks = {i: t.split(" ") for i, t in DOCS}
    counts: dict[str, int] = {}
    for w in toks.values():
        for t in w:
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    for i, w in toks.items():
        s = sum(counts[t] for t in w)
        assert out[i] == s / (total * len(w))  # exact: one int division
        assert Fraction(out[i]).limit_denominator(10**9) == Fraction(
            s, total * len(w)
        )


def test_unigram_lm_external_model_smoothing(spark, docs_df):
    """Scoring against an external reference model applies add-one
    smoothing so unseen tokens score finitely on both variants."""
    import math

    from lakeshack_spark.operators import text

    lm = spark.createDataFrame(
        [("spark", 7), ("table", 2)], "term string, n_t long"
    )
    # T=9, V=2 → seen p=(n_t+1)/11, unseen p=1/11
    out = {
        r.doc_id: r.score
        for r in text.unigram_lm_score(docs_df, lm_counts=lm, variant="log").collect()
    }
    w0 = DOCS[0][1].split(" ")  # spark merge window spark
    want = (
        -2 * math.log(8 / 11) - 2 * math.log(1 / 11)
    ) / 4
    assert out[0] == pytest.approx(want, rel=1e-12)
    with pytest.raises(ValueError):
        text.unigram_lm_score(docs_df, variant="nope")


# ------------------------------------------------------ bigram LM score


def _bigram_counts():
    toks = {i: t.split(" ") for i, t in DOCS}
    bgs = {i: list(zip(w, w[1:])) for i, w in toks.items()}
    counts: dict[tuple, int] = {}
    for pairs in bgs.values():
        for b in pairs:
            counts[b] = counts.get(b, 0) + 1
    return bgs, counts


def test_bigram_lm_log_matches_python_and_drops_short_docs(spark, docs_df):
    import math

    from lakeshack_spark.operators import text

    out = {
        r.doc_id: (r.n_bigrams, r.score)
        for r in text.bigram_lm_score(docs_df, variant="log").collect()
    }
    bgs, counts = _bigram_counts()
    total = sum(counts.values())
    assert 4 not in out  # 1-token doc has no bigrams
    for i, pairs in bgs.items():
        if not pairs:
            continue
        want = sum(-math.log(counts[b] / total) for b in pairs) / len(pairs)
        assert out[i][0] == len(pairs)
        assert out[i][1] == pytest.approx(want, rel=1e-12)
    # "spark spark spark": common token, repeated bigram — the CONTEXT
    # signal: its bigram score differs from what unigram commonness says
    assert out[2][0] == 3


def test_bigram_lm_rational_exact(spark, docs_df):
    from lakeshack_spark.operators import text

    out = {
        r.doc_id: r.score
        for r in text.bigram_lm_score(docs_df, variant="rational").collect()
    }
    bgs, counts = _bigram_counts()
    total = sum(counts.values())
    for i, pairs in bgs.items():
        if not pairs:
            continue
        s = sum(counts[b] for b in pairs)
        assert out[i] == s / (total * len(pairs))  # one int division, exact


def test_bigram_lm_external_model_smoothing(spark, docs_df):
    import math

    from lakeshack_spark.operators import text

    lm = spark.createDataFrame(
        [("spark", "merge", 3), ("merge", "window", 1)],
        "w1 string, w2 string, n_b long",
    )
    # T=4, V=2 → seen p=(n_b+1)/6, unseen p=1/6
    out = {
        r.doc_id: r.score
        for r in text.bigram_lm_score(
            docs_df, lm_counts=lm, variant="log"
        ).collect()
    }
    # doc 0 bigrams: (spark,merge) (merge,window) (window,spark)
    want = (-math.log(4 / 6) - math.log(2 / 6) - math.log(1 / 6)) / 3
    assert out[0] == pytest.approx(want, rel=1e-12)
    with pytest.raises(ValueError):
        text.bigram_lm_score(docs_df, variant="nope")


def test_bigram_lm_empty_and_single_token_safe(spark):
    """0- and 1-token docs must not error (the guarded-slice rule: no
    negative slice length, no out-of-range index) — they just drop."""
    from lakeshack_spark.operators import text

    df = spark.createDataFrame(
        [(0, ""), (1, "solo"), (2, "a b")], "doc_id long, text string"
    )
    out = {r.doc_id: r.n_bigrams for r in text.bigram_lm_score(df).collect()}
    assert out == {2: 1}


# ----------------------------------------------- persisted postings index


def test_term_bucket_py_matches_column_hash(spark):
    """The driver-side md5 bucket twin must be bit-identical to the
    build-time Column hash for every term that could land in the index."""
    from pyspark.sql import functions as F

    from lakeshack_spark.operators.dedup import _h64

    terms = ["spark", "merge", "window", "scan", "", "éclair", "a b"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r.term: r.b
        for r in df.select(
            "term", (_h64(F.col("term")) % F.lit(16)).alias("b")
        ).collect()
    }
    for t in terms:
        assert got[t] == retrieval._term_bucket_py(t, 16), t


def test_postings_index_search_equals_fresh_postings(spark, docs_df, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "pidx")
    retrieval.postings_index_write(docs_df, path, n_buckets=8)
    got = {
        r.doc_id: (r.n_terms_matched, r.sum_tf)
        for r in retrieval.postings_index_search(
            spark, path, ["spark", "window"], mode="and", n_buckets=8
        ).collect()
    }
    assert got == {0: (2, 3)}
    any_match = {
        r.doc_id: (r.n_terms_matched, r.sum_tf)
        for r in retrieval.postings_index_search(
            spark, path, ["spark", "window"], mode="or", n_buckets=8
        ).collect()
    }
    assert any_match == {0: (2, 3), 1: (1, 1), 2: (1, 3), 4: (1, 1)}
    # duplicate query terms dedup (AND arity must be the dedup'd length)
    dup = retrieval.postings_index_search(
        spark, path, ["spark", "spark"], mode="and", n_buckets=8
    )
    assert sorted(r.doc_id for r in dup.collect()) == [0, 2]


def test_postings_index_scan_prunes_buckets(spark, docs_df, tmp_path):
    """The probe's parquet scan must carry a PartitionFilters entry on
    bucket — the plan-time pruning that makes the persisted index pay
    off at 100 TB."""
    import re

    from lakeshack_spark.plans.audit import explain_str

    path = str(tmp_path / "pidx")
    retrieval.postings_index_write(docs_df, path, n_buckets=8)
    out = retrieval.postings_index_search(
        spark, path, ["spark"], mode="and", n_buckets=8
    )
    plan = explain_str(out)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan[:2000]


def test_postings_index_search_validates(spark, tmp_path):
    with pytest.raises(ValueError, match="mode"):
        retrieval.postings_index_search(spark, "/nope", ["x"], mode="xor")
    with pytest.raises(ValueError, match="non-empty"):
        retrieval.postings_index_search(spark, "/nope", [])
