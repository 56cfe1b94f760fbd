"""Full-text retrieval over a document table: inverted-index postings,
boolean term search, and BM25 ranked retrieval.

A training-data pipeline needs targeted corpus lookup constantly —
"find every document mentioning these terms" (contamination audits,
topic carving, eval-set curation) and "rank documents for this query"
(quality-weighted sampling, retrieval-augmented filtering). Both are
expressible as ordinary relational plans over an exploded postings
relation, which is exactly what makes them scale: no per-row Python, no
driver-side index, every stage a map-side filter or a key-partitioned
aggregation Catalyst can push around.

Scale shape (100 TB corpus):

- Query terms are LITERALS, so ``term IN (...)`` is a map-side filter
  applied during the explode — only postings for the queried terms ever
  reach a shuffle. Cost is O(corpus tokens) scan + O(matching postings)
  shuffle, never O(corpus) shuffle.
- Per-term document frequencies and the 1-row corpus aggregate
  (N, avgdl) are broadcast — no shuffle on the big side for them.
- The per-document score is a fixed-width conditional aggregation (one
  column per query term), so scoring parallelism is #documents, and the
  final top-k goes through the same two-stage ranking discipline as the
  similarity module.
- For a *persistent* index, write ``build_postings`` output bucketed by
  ``term`` (see operators.relational bucketing helpers): repeated
  queries then prune buckets instead of re-exploding the corpus.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from lakeshack_spark.operators.text import words_col


def build_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted-index postings ``(term, doc_id, tf)`` — one row per
    distinct (document, term) with the term frequency.

    Map-side explode + a (doc, term)-keyed count. The groupBy key is
    high-cardinality (doc × term) so the shuffle spreads; hot stopword
    terms do not skew it because the key includes the document."""
    pairs = df.select(F.col(id_col), F.explode(words_col(text_col)).alias("term"))
    return pairs.groupBy(id_col, "term").agg(F.count("*").alias("tf"))


def boolean_search(
    df: DataFrame,
    terms: Sequence[str],
    mode: str = "and",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents matching the query terms: ``(id_col, n_terms_matched)``
    for every document containing ALL (``mode="and"``) or ANY
    (``mode="or"``) of ``terms``.

    The literal IN-list filter runs map-side during the explode, so only
    postings of queried terms shuffle — the AND is then a per-document
    distinct-term count, never a q-way self-join."""
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    if not terms:
        raise ValueError("terms must be non-empty")
    terms = list(dict.fromkeys(terms))  # dedup, keep order
    pairs = df.select(F.col(id_col), F.explode(words_col(text_col)).alias("term"))
    matched = (
        pairs.filter(F.col("term").isin(terms))
        .groupBy(id_col)
        .agg(F.count_distinct("term").cast("int").alias("n_terms_matched"))
    )
    if mode == "and":
        matched = matched.filter(F.col("n_terms_matched") == len(terms))
    return matched


def _idf_col(n_docs, dfreq, variant: str):
    """BM25 idf of a term given corpus size ``n_docs`` and document
    frequency ``dfreq`` (both Columns).

    - ``"rational"``: ``(N - df + 0.5) / (df + 0.5)`` — every step is an
      exact int→double conversion, an exact +0.5 on a half-integer, and
      ONE correctly-rounded division, so Spark and DuckDB produce
      bit-identical doubles. This is the variant the cross-engine hash
      gate pins.
    - ``"log"``: ``ln(1 + (N - df + 0.5)/(df + 0.5))`` — the standard
      always-positive BM25+ form for production ranking; libm ``log``
      may differ by ulps across engines, so it is unit-tested against
      Python ``math.log`` instead of hash-gated.
    """
    r = (n_docs - dfreq + F.lit(0.5)) / (dfreq.cast("double") + F.lit(0.5))
    if variant == "rational":
        return r
    if variant == "log":
        return F.log(F.lit(1.0) + r)
    raise ValueError(f"idf must be 'log' or 'rational', got {variant!r}")


def bm25_scores(
    df: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.5,
    b: float = 0.75,
    idf: str = "log",
) -> DataFrame:
    """BM25 relevance of every matching document for a bag-of-terms
    query (Robertson–Spärck Jones; the Okapi form used by Lucene).

    Output: ``(id_col, n_terms_matched, score)`` — one row per document
    containing at least one query term.

    Per (document, term): ``idf(t) · tf·(k1+1) / (tf + k1·((1-b) +
    b·(dl/avgdl)))`` with ``dl`` the document token length and ``avgdl``
    the corpus mean length. The per-term contributions are summed in the
    FIXED order of ``terms`` via one conditional-aggregation column per
    term (left-associated addition), so the result is deterministic and
    — with ``idf="rational"`` and exactly-representable ``k1``/``b`` —
    reproducible bit-for-bit in any IEEE engine evaluating the same
    expression tree: int→double conversions are exact, and each +, ×, /
    is a single correctly-rounded op. No RNG, no libm on the gated path.

    Scale: postings for non-query terms are dropped map-side; ``dl``
    joins on doc_id only for matching documents; (N, avgdl) is one
    broadcast row; dfreq is ≤ len(terms) broadcast rows. The heavy
    relation (matching postings) is aggregated once on the document key.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    terms = list(dict.fromkeys(terms))

    words = words_col(text_col)
    base = df.select(F.col(id_col), words.alias("__w"))
    lengths = base.select(F.col(id_col), F.size("__w").alias("dl"))
    # One broadcastable row: corpus size and mean doc length. The mean is
    # one exact-int division — deterministic across engines.
    corpus = lengths.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl")
    )

    pairs = base.select(F.col(id_col), F.explode("__w").alias("term"))
    tf = (
        pairs.filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(corpus))
    )
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    idf_c = _idf_col(F.col("n_docs").cast("double"), F.col("dfreq"), idf)
    den = F.col("tf").cast("double") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    )
    contrib = idf_c * (F.col("tf").cast("double") * F.lit(k1 + 1.0) / den)
    scored = scored.withColumn("__c", contrib)

    # Fixed-order sum: one conditional-aggregation column per query term,
    # added left-to-right — the ONLY floating sum whose order Spark and
    # DuckDB can both be held to.
    agg_cols = [
        F.max(F.when(F.col("term") == F.lit(t), F.col("__c"))).alias(f"__c{i}")
        for i, t in enumerate(terms)
    ] + [F.count("*").cast("int").alias("n_terms_matched")]
    per_doc = scored.groupBy(id_col).agg(*agg_cols)
    total = F.coalesce(F.col("__c0"), F.lit(0.0))
    for i in range(1, len(terms)):
        total = total + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    return per_doc.select(
        F.col(id_col), F.col("n_terms_matched"), total.alias("score")
    )


def bm25_topk(
    df: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.5,
    b: float = 0.75,
    idf: str = "log",
) -> DataFrame:
    """Top-``k`` documents by BM25 with a deterministic total order
    (score desc, id asc). Single-query ranking funnels through one
    window key; multi-query batches should reuse the two-stage top-k of
    operators.similarity. The candidate set here is already reduced to
    matching documents, so the window ranks |matches|, not |corpus|."""
    scored = bm25_scores(df, terms, text_col, id_col, k1, b, idf)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def bm25_reference(
    docs: list[tuple[int, str]],
    terms: Sequence[str],
    k1: float = 1.5,
    b: float = 0.75,
    idf: str = "log",
) -> dict[int, float]:
    """Driver-side pure-Python BM25 for unit tests (independent of any
    Spark/DuckDB expression tree)."""
    terms = list(dict.fromkeys(terms))
    toks = {i: t.split(" ") for i, t in docs}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    dfreq = {
        t: sum(1 for w in toks.values() if t in w) for t in terms
    }
    out: dict[int, float] = {}
    for i, w in toks.items():
        score = 0.0
        matched = False
        for t in terms:
            tf = w.count(t)
            if not tf:
                continue
            matched = True
            r = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            idf_v = r if idf == "rational" else math.log(1.0 + r)
            score += idf_v * (tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * (len(w) / avgdl))))
        if matched:
            out[i] = score
    return out


def _term_bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side twin of ``dedup._h64(term) % n_buckets``: the first
    15 md5 hex digits as an integer. Must stay bit-identical to the
    Column expression used at index-build time — probe-time bucket
    selection happens on the DRIVER (the bucket IN-list must exist at
    plan time to prune partitions), build-time assignment on executors."""
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16) % n_buckets


def postings_index_write(
    df: DataFrame,
    path: str,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the inverted index as a TERM-BUCKET-partitioned
    Parquet table: ``bucket=h64(term) % n_buckets`` Hive directories,
    rows = (term, doc_id, tf).

    The "build once, query many" half of corpus search (the persisted
    twin of :func:`build_postings`, same role as
    ``similarity.ivf_index_write`` for ANN): the corpus is exploded and
    aggregated ONCE at build time; every subsequent term query reads
    only its terms' bucket directories via partition pruning — at
    100 TB with 4k buckets, a 3-term query touches ≤ 3/4000 of the
    index bytes, decided at plan time. Hash-bucketing (not raw term
    partitioning) bounds the directory count and spreads hot terms'
    neighbors: one bucket holds many terms, but a bucket is still a
    tiny fraction of the index, and the in-bucket ``term IN`` filter is
    an ordinary pushed Parquet predicate on top.
    """
    from lakeshack_spark.operators.dedup import _h64

    postings = build_postings(df, text_col=text_col, id_col=id_col)
    (
        postings.withColumn("bucket", _h64(F.col("term")) % F.lit(n_buckets))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def postings_index_search(
    spark,
    path: str,
    terms: Sequence[str],
    mode: str = "and",
    n_buckets: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Boolean term search against a persisted
    :func:`postings_index_write` index, reading only the query terms'
    bucket partitions: ``(id_col, n_terms_matched, sum_tf)``.

    ``n_buckets`` must match the build. Bucket ids are computed
    driver-side (:func:`_term_bucket_py` — the md5 twin is pinned
    bit-identical to the Column hash by a unit test) so the bucket
    IN-list exists at plan time: the scan plans a PartitionFilters
    entry and never lists, opens, or reads any other directory. The
    residual ``term IN`` predicate pushes into the Parquet scan of the
    selected buckets. Matching semantics are exactly
    :func:`boolean_search` (AND = distinct-matched-term count equals
    the dedup'd query length), plus the total term-frequency mass
    ``sum_tf`` for ranking/auditing.
    """
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    if not terms:
        raise ValueError("terms must be non-empty")
    terms = list(dict.fromkeys(terms))
    buckets = sorted({_term_bucket_py(t, n_buckets) for t in terms})
    idx = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    matched = idx.groupBy(id_col).agg(
        F.count_distinct("term").cast("int").alias("n_terms_matched"),
        F.sum("tf").alias("sum_tf"),
    )
    if mode == "and":
        matched = matched.filter(F.col("n_terms_matched") == len(terms))
    return matched
