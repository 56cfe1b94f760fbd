"""Edit-distance-bounded fuzzy string join.

The string analogue of the repo's LSH joins: find all (left, right)
pairs with ``levenshtein(a, b) <= max_dist`` WITHOUT a cross join, via a
LOSSLESS candidate prefilter + exact verify (the PPJoin/q-gram-filter
family, Gravano et al. VLDB 2001):

- **q-gram pigeonhole**: one edit operation destroys at most ``q`` of a
  string's character q-grams, so if ``ed(a, b) <= k`` and
  ``len(a) - q + 1 > k*q`` then a and b SHARE at least one q-gram —
  an equi-join on exploded distinct q-grams finds every such pair.
- **length band**: each edit changes length by at most 1, so
  ``|len(a) - len(b)| <= k`` always; the band rides the gram join as an
  extra condition and catches the strings too short for the pigeonhole
  (len < k*q + q) through a small explode-the-short-side length join.
- **verify**: ``F.levenshtein`` (identical classic DP in Spark and
  DuckDB) filters candidates exactly, so false candidates are harmless
  and the result provably equals the naive cross-join answer.

Scale shape: the gram join shuffles O(total distinct grams) small rows
on uniform gram keys; hot grams (e.g. a ubiquitous bigram) square only
within their bucket — at corpus scale prefer larger ``q`` to thin them.
The short-string path explodes 2k+1 length keys per SHORT row only.
No full-text column crosses the candidate shuffle; strings rejoin by id
for the verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _grams_expr(col: str, q: int) -> str:
    # sequence(1, n) counts DOWN when n < 1 (CLAUDE.md) — grams are only
    # built for strings long enough that len - q + 1 >= 1
    return (
        f"array_distinct(transform(sequence(1, length({col}) - {q - 1}),"
        f" i -> substring({col}, i, {q})))"
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    left_id: str,
    right_id: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All pairs with ``levenshtein(left_text, right_text) <= max_dist``.

    Returns (left_id, right_id, dist) with the original id column names.
    Exactly equal to the naive cross-join result (lossless prefilter +
    exact verify); deterministic."""
    k = max_dist
    lmin = k * q + q  # pigeonhole threshold: len - q + 1 > k*q
    l = left.select(
        F.col(left_id).alias("__lid"), F.col(left_text).alias("__ls")
    ).withColumn("__ll", F.length("__ls"))
    r = right.select(
        F.col(right_id).alias("__rid"), F.col(right_text).alias("__rs")
    ).withColumn("__rl", F.length("__rs"))

    lg = l.filter(F.col("__ll") >= lmin).select(
        "__lid", "__ll", F.explode(F.expr(_grams_expr("__ls", q))).alias("__g")
    )
    rg = r.filter(F.col("__rl") >= lmin).select(
        "__rid", "__rl", F.explode(F.expr(_grams_expr("__rs", q))).alias("__g")
    )
    cand_long = (
        lg.join(
            rg,
            (lg.__g == rg.__g)
            & (F.abs(lg.__ll - rg.__rl) <= k),
        )
        .select("__lid", "__rid")
        .distinct()
    )

    # short strings (either side): the pigeonhole does not apply, but the
    # length band does — explode the SHORT side to its k-neighborhood of
    # lengths and equi-join on exact length (short sets are bounded by
    # the lmin constant, so these joins are small)
    l_short = l.filter(F.col("__ll") < lmin).select(
        "__lid", F.explode(F.sequence(F.col("__ll") - k, F.col("__ll") + k)).alias("__bl")
    )
    cand_ls = l_short.join(r, l_short.__bl == r.__rl).select("__lid", "__rid")
    r_short = r.filter(F.col("__rl") < lmin).select(
        "__rid", F.explode(F.sequence(F.col("__rl") - k, F.col("__rl") + k)).alias("__bl")
    )
    cand_rs = r_short.join(l, r_short.__bl == l.__ll).select("__lid", "__rid")

    cand = cand_long.unionByName(cand_ls).unionByName(cand_rs).distinct()
    out = (
        cand.join(l.select("__lid", "__ls"), "__lid")
        .join(r.select("__rid", "__rs"), "__rid")
        .withColumn("__d", F.levenshtein("__ls", "__rs"))
        .filter(F.col("__d") <= k)
    )
    return out.select(
        F.col("__lid").alias(left_id),
        F.col("__rid").alias(right_id),
        F.col("__d").cast("int").alias("dist"),
    )
