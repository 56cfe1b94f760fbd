"""Bloom-filter prefiltered semi-joins: cut the probe-side shuffle of a
big semi/inner join with a compact bit-set of the build side's keys.

The 100 TB problem this solves: ``fact SEMI JOIN dim`` where the dim is
too big to broadcast as a hash relation (tens of millions of keys) but
its *Bloom filter* (a few MB of bits) is not. Shipping the bits to every
task turns the join's probe-side shuffle from O(|fact|) rows into
O(|matching| + ε·|fact|) rows — the same trick Spark's AQE runtime
bloom-filter join injects, here as an explicit, deterministic,
engine-portable operator (md5-derived double hashing, no RNG, so the
same filter is reproducible anywhere — the repo's hash discipline).

Exactness contract: a Bloom filter has false positives but NEVER false
negatives, so ``bloom_semi_join`` keeps the real join after the
prefilter — the filter only shrinks the shuffled row set; the final
result is provably identical to the plain semi join (which is exactly
what its DuckDB oracle asserts). Skipping the verify join
(``exact=False``) yields the ε-superset, useful when a downstream exact
join re-checks anyway.

Plan shape: the membership test is pure codegen arithmetic — the two
md5-derived hashes are computed ONCE per row in a Project (helper
columns, so Catalyst cannot re-inline the md5 into each of the k bit
tests), and the Filter above it tests k shifted bits against ONE
literal array<long> (per-element ``F.lit`` would cost a py4j round trip
each — the measured plan-construction trap). Literal size bounds the
build side: ~2 MB of SQL per million bits; past tens of MB, switch to
Spark's AQE runtime filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) or pre-bucket
both sides.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from lakeshack_spark.operators.dedup import _h64


def _hash_pair(key: Column, num_bits: int) -> tuple[Column, Column]:
    """Kirsch–Mitzenmacher double hashing base: two md5-derived 60-bit
    hashes pre-reduced mod m (so ``h1 + i·h2`` stays in int64); h2 forced
    odd so the stride cycles all of a power-of-two m."""
    s = key.cast("string")
    h1 = _h64(F.concat(F.lit("bfa:"), s)) % num_bits
    # .bitwiseOR, not the ``|`` operator — on Columns ``|`` is logical OR.
    h2 = ((_h64(F.concat(F.lit("bfb:"), s)) % num_bits)).bitwiseOR(
        F.lit(1).cast("long")
    )
    return h1, h2


def bloom_words(
    df: DataFrame, key_col: str, num_bits: int, num_hashes: int = 6
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
    h1, h2 = _hash_pair(F.col(key_col), num_bits)
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


def filter_might_contain(
    df: DataFrame,
    key_col: str,
    words: list[int],
    num_hashes: int = 6,
) -> DataFrame:
    """Keeps rows whose key MIGHT be in the filter: every inserted key
    passes (no false negatives); an absent key passes with probability
    ≈ (set-bit fraction)^k. The two hashes land in a Project (one md5
    pair per row), the k bit tests in the Filter above it — all
    whole-stage codegen, no shuffle."""
    num_bits = len(words) * 64
    if num_bits == 0:
        # Empty filter: nothing was inserted, nothing can match.
        return df.filter(F.lit(False))
    arr_sql = "array(" + ",".join(f"{w}L" for w in words) + ")"
    h1, h2 = _hash_pair(F.col(key_col), num_bits)
    tmp = df.withColumn("__bfh1", h1).withColumn("__bfh2", h2)
    tests = []
    for i in range(num_hashes):
        pos = f"((__bfh1 + {i} * __bfh2) % {num_bits})"
        tests.append(
            f"((element_at({arr_sql}, CAST({pos} DIV 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST({pos} % 64 AS INT))) != 0L)"
        )
    return tmp.filter(F.expr(" AND ".join(tests))).drop("__bfh1", "__bfh2")


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    num_bits: int | None = None,
    num_hashes: int = 6,
    exact: bool = True,
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
    words = bloom_words(keys, "__k", num_bits, num_hashes)
    pre = filter_might_contain(probe, probe_key, words, num_hashes)
    if not exact:
        return pre
    return pre.join(
        keys.distinct(), pre[probe_key] == F.col("__k"), "left_semi"
    )
