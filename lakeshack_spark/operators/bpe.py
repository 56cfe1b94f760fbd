"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The inner loop every LLM tokenizer build runs: count adjacent symbol
pairs, merge the most frequent pair everywhere, repeat. The scale shape
is histogram-first: the corpus reduces ONCE to a word histogram
``(word, count)`` — the massive shuffle, after which the text never
moves again — and every subsequent pair count and merge runs over the
VOCAB weighted by counts. A 100 TB corpus has a vocab orders of
magnitude smaller than its token stream; real trainers (subword-nmt,
GPT-2's) exploit exactly this reduction, and so does this one: each
merge iteration is one bounded groupBy over the vocab frame plus a
map-only fold, never a pass over the documents.

Merging is the standard left-to-right non-overlapping scan. The fold
below implements it exactly because a merged symbol (``left || right``)
is strictly longer than ``left`` — after a merge fires, the new last
element can never equal ``left``'s single occurrence pattern again at
the same position, so "aaa" + (a,a) folds to ["aa","a"] and "aaaa" to
["aa","aa"], matching the canonical scan.

Tokenization follows the repo convention (operators.text.words_col:
single-space split — the corpus is space-normalized).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import Column, DataFrame, functions as F


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(w, wc)``: corpus word counts — the one corpus-wide shuffle.
    Empty tokens are dropped; map-side partial aggregation applies."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )


def initial_symbols(vocab: DataFrame) -> DataFrame:
    """Adds ``syms``: the word split into single-character symbols."""
    return vocab.withColumn(
        "syms", F.filter(F.split(F.col("w"), ""), lambda x: x != F.lit(""))
    )


def _pairs_col(syms: Column) -> Column:
    """Adjacent (left, right) symbol pairs. The INDEX sequence is
    guarded: ``F.sequence(1, n-1)`` counts DOWN when n < 2 and the
    out-of-range element_at would error (repo-wide gotcha), so
    single-symbol words map to an empty pair array explicitly."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("pair_left"),
                F.element_at(syms, i + 1).alias("pair_right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pair_left:string,pair_right:string>>"))


def pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """``(pair_left, pair_right, n)``: corpus-weighted adjacent-pair
    frequencies over the vocab — one explode + one hash aggregate over
    vocab-sized (not corpus-sized) input."""
    return (
        vocab_syms.select(
            F.explode(_pairs_col(F.col("syms"))).alias("p"), F.col("wc")
        )
        .select("p.pair_left", "p.pair_right", "wc")
        .groupBy("pair_left", "pair_right")
        .agg(F.sum("wc").alias("n"))
    )


def apply_merge(vocab_syms: DataFrame, left: str, right: str) -> DataFrame:
    """Replace every adjacent (left, right) occurrence in ``syms`` with
    the merged symbol, left-to-right non-overlapping — one map-only fold
    per word, no shuffle."""
    merged = left + right
    new_syms = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return vocab_syms.withColumn("syms", new_syms)


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 16,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE merges over the corpus. Returns the merge
    list ``[(left, right, count), ...]`` in application order and the
    final vocab frame ``(w, wc, syms)``.

    Ties break by (count DESC, left ASC, right ASC) — fully
    deterministic, no RNG. Iteration stops early when the best pair
    falls below ``min_count``.

    Per iteration: one vocab-sized aggregate + a 1-row collect (the
    winning pair — bounded by construction) + a map-only merge. Each
    intermediate is persisted and eagerly counted before the next
    iteration consumes it (the repo's measured branch-recomputation
    trap), and lineage is truncated with ``localCheckpoint`` every
    ``checkpoint_every`` merges so plan depth stays bounded at large
    merge counts.
    """
    vocab = initial_symbols(word_histogram(docs, text_col)).persist()
    vocab.count()
    merges: list[tuple[str, str, int]] = []
    for it in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("pair_left"), F.asc("pair_right"))
            .limit(1)
            .collect()
        )
        if not top or int(top[0]["n"]) < min_count:
            break
        l, r = top[0]["pair_left"], top[0]["pair_right"]
        merges.append((l, r, int(top[0]["n"])))
        nxt = apply_merge(vocab, l, r)
        if (it + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
            nxt.count()
        vocab.unpersist()
        vocab = nxt
    return merges, vocab


def bpe_encode(
    docs: DataFrame,
    vocab_syms: DataFrame,
    merges: list | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """APPLY a trained tokenizer to a corpus — the serving half of
    :func:`bpe_train`: per document, ``(doc_id, n_words, n_tokens,
    tokens_fp)`` where ``n_tokens`` counts subword symbols and
    ``tokens_fp`` is the md5 of the full ordered symbol sequence
    (symbols joined by U+001F within a word, words by U+001E — both
    outside the corpus alphabet, so distinct sequences cannot collide
    by concatenation).

    Vocabulary lookup is a broadcast join word→syms against the trained
    ``(w, syms)`` table — training already folded every merge into it,
    so the HOT path (in-vocab words, the overwhelming mass by Zipf) does
    no merge work at apply time. Out-of-vocabulary words — new docs the
    trainer never saw — take the COLD path: the trained merge list is
    applied in rank order by an Arrow-batched pandas UDF, exactly the
    canonical BPE apply (a JVM-side expression fold would inline one
    aggregate per merge into the plan — the repo's measured
    plan-bloat/HOF trap — and OOV words are the rare case, so the UDF
    runs on a filtered branch only, never the full corpus; the
    split-branch form also keeps Spark from hoisting the UDF over ALL
    rows, which a ``when(...)`` guard would not). With ``merges=None``
    OOV words stay as character symbols (a frozen-vocab encoder).

    Scale shape: one posexplode O(total words), one broadcast join, the
    OOV branch, and one per-doc aggregation with order restored by
    ``array_sort`` over (pos, wf) structs — never a window, never a
    driver loop. Unit-pinned token-for-token against a canonical
    pure-Python encoder, OOV words included."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
        ).alias("pos", "w"),
    )
    joined = toks.join(
        F.broadcast(vocab_syms.select("w", "syms")), "w", "left"
    )
    hits = joined.filter(F.col("syms").isNotNull()).select(
        "doc_id", "pos", "syms"
    )
    misses = joined.filter(F.col("syms").isNull())
    if merges is not None:
        pairs = [(m[0], m[1]) for m in merges]

        @F.pandas_udf("array<string>")
        def _encode_oov(words: pd.Series) -> pd.Series:
            def one(w: str) -> list[str]:
                syms = list(w)
                for left, right in pairs:
                    out, i = [], 0
                    while i < len(syms):
                        if (
                            i + 1 < len(syms)
                            and syms[i] == left
                            and syms[i + 1] == right
                        ):
                            out.append(left + right)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                return syms

            return words.map(one)

        oov_syms = _encode_oov(F.col("w"))
    else:
        oov_syms = F.filter(F.split(F.col("w"), ""), lambda x: x != F.lit(""))
    misses = misses.select("doc_id", "pos", oov_syms.alias("syms"))
    per_word = hits.unionByName(misses).select(
        "doc_id",
        "pos",
        F.size("syms").alias("n_syms"),
        F.concat_ws("\x1f", F.col("syms")).alias("wf"),
    )
    seq = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "wf"))),
        lambda x: x["wf"],
    )
    return per_word.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("n_syms").alias("n_tokens"),
        F.md5(F.concat_ws("\x1e", seq)).alias("tokens_fp"),
    )
