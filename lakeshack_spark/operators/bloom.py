"""Bloom-filter prefiltered semi-joins: cut the probe-side shuffle of a
big semi/inner join with a compact bit-set of the build side's keys.

The 100 TB problem this solves: ``fact SEMI JOIN dim`` where the dim is
too big to broadcast as a hash relation (tens of millions of keys) but
its *Bloom filter* (a few MB of bits) is not. Shipping the bits to every
task turns the join's probe-side shuffle from O(|fact|) rows into
O(|matching| + ε·|fact|) rows — the same trick Spark's AQE runtime
bloom-filter join injects, here as an explicit, deterministic operator
(salted double hashing, no RNG; xxhash64 by default, md5 optionally for
engine-portable filter reproduction — the Bloom result is provably
hash-independent either way, because the exact verify join removes
false positives).

Exactness contract: a Bloom filter has false positives but NEVER false
negatives, so ``bloom_semi_join`` keeps the real join after the
prefilter — the filter only shrinks the shuffled row set; the final
result is provably identical to the plain semi join (which is exactly
what its DuckDB oracle asserts). Skipping the verify join
(``exact=False``) yields the ε-superset, useful when a downstream exact
join re-checks anyway.

Plan shape (each choice measured at sf0.1, 600k probe rows): the bit
array enters the plan exactly ONCE as a parsed SQL literal — inlining a
copy per bit test made per-query plan cost scale with k × filter size,
and per-element ``F.lit`` costs a py4j round trip each (the repo's
plan-construction trap). The k bit tests fold over that one literal in
a ``forall`` lambda; higher-order functions run interpreted, but the
body is two O(1) literal lookups + a bitwiseAND, and the hash pair is
computed per row in the helper-column Project below the Filter. The
hash dominates the row cost: interpreted md5+conv measured ~15 µs/row
(≈10 s for the 600k-row probe) vs ~2 µs/row with xxhash64 (1.4 s) —
hence the xxhash64 default. Literal size bounds the build side: ~2 MB
of SQL per million bits; past tens of MB, switch to Spark's AQE runtime
filter (``spark.sql.optimizer.runtime.bloomFilter.enabled``) or
pre-bucket both sides.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from lakeshack_spark.operators.dedup import _h64


def _hash_pair(key: Column, num_bits: int, hash_fn: str = "xxhash64"):
    """Kirsch–Mitzenmacher double hashing base: two salted hashes
    pre-reduced mod m (so ``h1 + i·h2`` stays in int64); h2 forced odd so
    the stride cycles all of a power-of-two m.

    ``hash_fn``: ``"xxhash64"`` (default — Spark-native, measured ~6×
    cheaper per row than md5+conv; the Bloom result is provably
    hash-independent because the exact verify join removes false
    positives, so the repo's md5-portability discipline is not needed
    here) or ``"md5"`` (engine-portable positions, for reproducing the
    identical filter outside Spark)."""
    if hash_fn == "xxhash64":
        h1 = F.pmod(F.xxhash64(F.lit("bfa"), key), F.lit(num_bits)).cast("long")
        h2 = (
            F.pmod(F.xxhash64(F.lit("bfb"), key), F.lit(num_bits))
            .cast("long")
            .bitwiseOR(F.lit(1).cast("long"))
        )
        return h1, h2
    if hash_fn != "md5":
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    s = key.cast("string")
    h1 = _h64(F.concat(F.lit("bfa:"), s)) % num_bits
    # .bitwiseOR, not the ``|`` operator — on Columns ``|`` is logical OR.
    h2 = ((_h64(F.concat(F.lit("bfb:"), s)) % num_bits)).bitwiseOR(
        F.lit(1).cast("long")
    )
    return h1, h2


def bloom_words(
    df: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int = 6,
    hash_fn: str = "xxhash64",
) -> list[int]:
    """Builds the packed bit array (list of ``num_bits/64`` int64 words)
    of ``df``'s key set, distributed: per-row positions explode to
    (word, mask) pairs, a word-keyed ``bit_or`` merges them (map-side
    partial combine — the shuffle carries at most num_bits/64 rows per
    partition), and only the ≤ num_bits/64 set words come to the driver."""
    if num_bits % 64 or num_bits <= 0:
        raise ValueError("num_bits must be a positive multiple of 64")
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    h1, h2 = _hash_pair(F.col(key_col), num_bits, hash_fn)
    positions = [(h1 + F.lit(i) * h2) % num_bits for i in range(num_hashes)]
    sparse = (
        df.select(F.explode(F.array(*positions)).alias("p"))
        .select(
            F.expr("CAST(p DIV 64 AS INT) AS w"),
            F.expr("shiftleft(1L, CAST(p % 64 AS INT)) AS m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in sparse:
        words[r["w"]] = r["bits"]
    return words


#: Single-bit masks indexed by bit position (bit 63 is the sign bit).
_BIT_MASKS = [1 << b for b in range(63)] + [-(1 << 63)]


def filter_might_contain(
    df: DataFrame,
    key_col: str,
    words: list[int],
    num_hashes: int = 6,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keeps rows whose key MIGHT be in the filter: every inserted key
    passes (no false negatives); an absent key passes with probability
    ≈ (set-bit fraction)^k.

    Plan-cost discipline: the bit array appears in the plan exactly ONCE
    (one parsed ``F.expr`` literal) with the k bit tests folded over it
    by a ``forall`` lambda — inlining a copy of the array per test made
    per-query plan cost scale with k × filter size. The lambda runs
    interpreted, but its body is two O(1) ``element_at`` lookups on
    literals plus a bitwiseAND; the hash pair in the Project below the
    Filter dominates the row cost (see the module docstring's measured
    md5-vs-xxhash64 numbers — the reason ``hash_fn`` defaults to
    xxhash64)."""
    num_bits = len(words) * 64
    if num_bits == 0:
        # Empty filter: nothing was inserted, nothing can match.
        return df.filter(F.lit(False))
    arr = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")
    masks = F.expr("array(" + ",".join(f"{m}L" for m in _BIT_MASKS) + ")")
    h1, h2 = _hash_pair(F.col(key_col), num_bits, hash_fn)
    tmp = df.withColumn("__bfh1", h1).withColumn("__bfh2", h2)
    positions = F.array(
        *[
            (F.col("__bfh1") + F.lit(i) * F.col("__bfh2")) % num_bits
            for i in range(num_hashes)
        ]
    )

    def bit_set(p):
        word = F.element_at(arr, F.shiftright(p, 6).cast("int") + F.lit(1))
        mask = F.element_at(masks, (p % 64).cast("int") + F.lit(1))
        return word.bitwiseAND(mask) != 0

    return tmp.filter(F.forall(positions, bit_set)).drop("__bfh1", "__bfh2")


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    num_bits: int | None = None,
    num_hashes: int = 6,
    exact: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Semi join ``probe`` ⋉ ``build`` with a Bloom prefilter on the
    probe side: returns probe rows whose key appears in ``build``.

    ``num_bits`` defaults to the next power of two ≥ 16 bits per build
    key (k=6 → ε ≈ 0.4 %), sized from one count of the build side's
    distinct-able key projection. With ``exact=True`` (default) the
    prefiltered probe is still semi-joined against the build keys, so
    false positives are removed and the result equals the plain semi
    join EXACTLY; the Bloom filter's only effect is that the shuffle
    under that join carries ~ε·|probe| non-matching rows instead of all
    of them. ``exact=False`` skips the join and returns the ε-superset
    (for pipelines whose next stage joins exactly anyway)."""
    build_key = build_key or probe_key
    keys = build.select(F.col(build_key).alias("__k")).filter(
        F.col("__k").isNotNull()
    )
    if num_bits is None:
        n = keys.count()
        num_bits = max(64, 1 << math.ceil(math.log2(max(1, n) * 16)))
    words = bloom_words(keys, "__k", num_bits, num_hashes, hash_fn)
    pre = filter_might_contain(probe, probe_key, words, num_hashes, hash_fn)
    if not exact:
        return pre
    return pre.join(
        keys.distinct(), pre[probe_key] == F.col("__k"), "left_semi"
    )
