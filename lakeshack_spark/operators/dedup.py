"""Deduplication operators for large document corpora.

Five strategies, cheapest-first — the standard LLM-training-data ladder:

1. exact (hash groupBy)           — O(n) shuffle on a 128-bit digest
2. normalized exact               — same, after canonicalization
3. MinHash + LSH banding          — near-dup candidate pairs at O(n·k)
4. SimHash                        — 64-bit fingerprint, hamming buckets
5. n-gram Jaccard                 — exact similarity on candidate pairs

Scale notes (100 TB): every strategy is shuffle-on-key with no driver-side
loops. MinHash/LSH shuffles on (band, bucket) — the band hash spreads
uniformly, so no skew; the candidate-pair join is an equi-join on bucket
keys, never a cross join. The exact Jaccard verify runs only on LSH
survivors (tiny fraction of n²).

All hashing is md5-derived so results are engine-portable and seed-free.
"""

from __future__ import annotations

import pandas as pd  # module level: pandas_udf type-hint resolution needs
# pd in module globals under `from __future__ import annotations`
from pyspark.sql import Column, DataFrame, functions as F

from lakeshack_spark.operators.text import words_col


# --------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: keeper id (min), duplicate count, digest."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )


def exact_dedup_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Row-level exact dedup: keep the smallest-``id_col`` row of every
    distinct text, with ALL columns intact (``exact_dedup`` returns group
    summaries; this returns the surviving corpus). One shuffle on the
    text digest with map-side partial ``min_by`` — the same
    partial-combine shape as ``asof_join(strategy="join")``, so the
    post-shuffle volume is
    one candidate row per distinct text per map partition, not the full
    corpus."""
    keeper = F.min_by(F.struct(*df.columns), F.col(id_col)).alias("__keep")
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("__md5"))
        .agg(keeper)
        .select("__keep.*")
    )


def normalize_text(text: Column) -> Column:
    """Canonicalize: lowercase + trim (the corpus is already
    space-normalized; extend with regexp_replace for real-world text)."""
    return F.trim(F.lower(text))


def normalized_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return (
        df.groupBy(F.md5(normalize_text(F.col(text_col))).alias("norm_md5"))
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


# ------------------------------------------------------------- shingles

def shingles_col(text_col: str, k: int = 3) -> Column:
    """Distinct word k-gram shingles of ``text_col`` (empty if < k words).
    Gram construction is the slice/zip_with form (text.gram_array) — O(n·k)
    per row; the element_at-per-index form re-evaluates the token split
    per element under interpreted HOF eval (O(n²), see CLAUDE.md)."""
    from lakeshack_spark.operators.text import gram_array

    return F.array_distinct(gram_array(words_col(text_col), k))


def _h64(col: Column) -> Column:
    """Portable 63-bit hash: first 15 hex digits of md5 → bigint via conv.
    (xxhash64 would be faster but is Spark-specific; md5 keeps every
    strategy reproducible in any engine.)"""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# -------------------------------------------------------------- minhash

#: Mersenne prime 2^31-1 for the universal-hash permutation family: keeps
#: a·x + b below 2^62, so the whole MinHash pipeline runs in native int64
#: inside whole-stage codegen (no decimal, no per-permutation md5).
_MERSENNE31 = (1 << 31) - 1


def _permutation_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a_i·x + b_i) mod (2^31-1),
    derived from md5 so every engine/run agrees without an RNG."""
    import hashlib

    params = []
    for i in range(num_hashes):
        d = hashlib.md5(f"lakeshack-minhash-{i}".encode()).hexdigest()
        a = (int(d[:15], 16) % (_MERSENNE31 - 1)) + 1
        b = int(d[15:30], 16) % _MERSENNE31
        params.append((a, b))
    return params


def _class_key_col(sh_col) -> Column:
    """Shingle-CLASS identity: md5 over the comma-joined SORTED full
    per-shingle md5 hex digests of ``sh_col``. Hex digests are
    fixed-alphabet, so the comma join cannot collide however weird the
    tokens are; an md5 collision merging two classes is the only
    residual failure mode. The Arrow banding twin renders the identical
    byte string from the digests it already computes per gram."""
    return F.md5(
        F.concat_ws(
            ",", F.array_sort(F.transform(sh_col, F.md5))
        ).cast("binary")
    )


def minhash_signature(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 32, k: int = 3, keep_shingles: bool = False,
) -> DataFrame:
    """Adds ``sig``: array of ``num_hashes`` min-hash values over word
    k-gram shingles.

    One md5-derived 31-bit base hash per shingle, then ``num_hashes``
    universal-hash permutations h_i(x) = (a_i·x + b_i) mod (2^31-1) — pure
    int64 ops per shingle instead of per-permutation md5s (the hash call
    count, not the min, dominates the naive formulation). 31-bit base
    hashes trade a negligible similarity-estimate bias for staying
    native-long end-to-end in whole-stage codegen.

    All permutations fold in ONE ``aggregate`` pass over the shingles: the
    accumulator is the running 64-element min array, updated per shingle
    with ``zip_with(acc, params, least)``. The permutation (a, b) pairs
    enter the plan as a single literal struct array, so the expression
    tree is constant-size in ``num_hashes`` (one transform+array_min copy
    per permutation made Catalyst analysis cost scale with the
    permutation count and dominate wall time at data sizes under ~1M
    docs).
    """
    out = df.withColumn("__sh", shingles_col(text_col, k))
    base = F.transform(F.col("__sh"), lambda s: _h64(s) % F.lit(_MERSENNE31))
    out = out.withColumn("__bh", base)

    # One parsed SQL string, not 2×num_hashes F.lit py4j round trips.
    params_lit = F.expr(
        "array("
        + ",".join(
            f"named_struct('a', {a}L, 'b', {b}L)"
            for a, b in _permutation_params(num_hashes)
        )
        + ")"
    )
    init = F.array_repeat(F.lit(_MERSENNE31).cast("long"), num_hashes)
    sig = F.aggregate(
        F.col("__bh"),
        init,
        lambda acc, h: F.zip_with(
            acc,
            params_lit,
            lambda m, p: F.least(m, (h * p["a"] + p["b"]) % F.lit(_MERSENNE31)),
        ),
    )
    out = (
        out.withColumn("sig", sig)
        .withColumn("n_shingles", F.size("__sh"))
        .drop("__bh")
    )
    return out if keep_shingles else out.drop("__sh")


def _band_value_exprs(num_hashes: int, bands: int) -> list[Column]:
    """One comma-joined string expression per band over the ``sig``
    column — the SINGLE source of band-slice construction, shared by both
    banding layouts so their bucket semantics can never drift."""
    rows_per_band = num_hashes // bands
    return [
        F.concat_ws(
            ",",
            *[
                F.element_at(F.col("sig"), b * rows_per_band + r + 1)
                for r in range(rows_per_band)
            ],
        )
        for b in range(bands)
    ]


def _nonempty_sigs(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int, k: int,
    keep_shingles: bool = False,
) -> DataFrame:
    extra = ["__sh"] if keep_shingles else []
    sigs = (
        minhash_signature(
            df, text_col, id_col, num_hashes, k, keep_shingles=keep_shingles
        )
        .select(F.col(id_col), F.col("sig"), F.col("n_shingles"), *extra)
        .filter(F.col("n_shingles") > 0)
    )
    return sigs


#: Default implementation for the banded LSH builders. "arrow" routes
#: through :func:`_banded_rows_arrow` — a mapInPandas twin computing the
#: SAME md5-derived values (bit-identical: same UTF-8 md5 per shingle,
#: same int64 permutation arithmetic, same decimal rendering into the
#: band-slice md5), measured several× faster than the interpreted
#: HOF aggregate (the signature fold never enters codegen — the same
#: class of exception as text.repetition_stats, see CLAUDE.md). "expr"
#: keeps the pure-expression form: the cross-engine-readable reference,
#: the fallback for non-long id columns, and the parity-test twin.
BANDED_IMPL = "arrow"

#: minhash_drop_set pass-2 auto cutover: estimated rep-collapsed
#: candidate pairs (Σ per failed bucket of distinct shingle-classes ×
#: |failed in bucket| — exact via ``__classkey`` on the Arrow banding
#: path, a signature-keyed lower bound on the expression path) at or
#: above this use the bucket-local prefix-filtered form; below it the
#: plain pair join wins on fixed stage overhead. See the dispatch
#: comment in minhash_drop_set.
PASS2_LOCAL_MIN_EST_PAIRS = 500_000

#: minhash_drop_set input shape (r13): True fuses the banded rows and
#: the shingle frame into ONE per-doc Arrow pass+cache (see the perdoc
#: branch in :func:`minhash_drop_set`); False keeps the r12 two-pass
#: shape. A module flag so interleaved A/B measurement and parity tests
#: can flip it in-process; the fused default is the measured winner.
DROP_SET_FUSED = True

#: minhash_verified_pairs fused-route cutover (r14, VERDICT_r13 item 3):
#: an input whose optimizer-ESTIMATED size reaches this takes the fused
#: per-doc route (one Arrow tokenize+hash pass, eagerly
#: localCheckpoint'ed, feeding banding AND verify) instead of the lazy
#: two-pass shape. The bound is the zero-job Catalyst sizeInBytes
#: estimate — deliberately crude but safe in the direction that
#: matters: an UNDER-threshold input keeps the historical lazy contract
#: (no job at construction, fully composable), and the only mis-route
#: cost is one cheap checkpoint of a small actual row set when a
#: filtered subset of a big table inflates the estimate (non-CBO Filter
#: keeps its child's sizeInBytes). 256 MB ≈ where a second full
#: tokenize pass of the corpus costs more than materializing the
#: per-doc frame once.
VERIFIED_FUSED_MIN_INPUT_BYTES = 256 * 1024 * 1024


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's zero-job size estimate for ``df`` (bytes). Falls back
    to 0 (= route lazy) if the JVM estimate is unavailable."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # pragma: no cover - py4j edge
        return 0


def _banded_rows_arrow(
    df: DataFrame, text_col: str, id_col: str,
    num_hashes: int, bands: int, k: int, with_buckets: bool,
    with_sig_key: bool = False,
    perdoc_shingles: bool = False,
    perdoc_buckets: bool = False,
) -> DataFrame:
    """Arrow twin of :func:`_banded` / :func:`_banded_with_buckets`:
    tokenize (single-space split, exactly ``F.split(text, " ")``
    semantics incl. empty tokens), distinct word k-grams, one md5-derived
    31-bit base hash per shingle, the (a·x+b) mod 2³¹−1 permutation min
    per signature slot in vectorized int64 (products stay < 2⁶², no
    overflow), then the per-band bucket over the comma-joined decimal
    rendering of the slice — md5 hex (``with_buckets=False``) or the
    md5→first-15-hex-digits long (``True``, = ``_h64``). NULL texts and
    docs with fewer than k tokens drop, matching the n_shingles > 0
    filter. Requires a long-typed id column (the dispatchers fall back
    to the expression form otherwise). Bit-identical to the expression
    path — pinned by tests/test_operators.py parity tests.

    ``with_sig_key`` (non-bucket layout only) adds two per-doc identity
    columns used by :func:`minhash_drop_set`:

    - ``__sigkey``: the md5→first-15-hex-digits long (= ``_h64``) of
      the comma-joined decimal rendering of the FULL signature — a
      signature identity for the pass-2 routing estimate (identical
      shingle sets ⇒ identical signatures ⇒ identical key);
    - ``__classkey``: the exact shingle-class identity
      (:func:`_class_key_col`), rendered from the per-gram md5 digests
      this builder already computes — so the class-rep collapse costs
      no extra hashing here, where the expression form pays an
      interpreted md5 per shingle (measured 0.8-1.5 s on the bench
      corpus when pass 2 evaluated it from the shingle frame).

    ``perdoc_shingles`` (r13; requires ``with_sig_key``) switches the
    OUTPUT LAYOUT to one row per doc: ``(id, __sh, __sigkey,
    __classkey, __buckets)`` where ``__sh`` is the doc's distinct-gram
    SET (sorted — every consumer is order-insensitive: sizes,
    ``array_intersect`` sizes, sorted class digests, Python sets) and
    ``__buckets[b]`` is band b's bucket hex. :func:`minhash_drop_set`
    persists THIS frame once and derives both its banded rows
    (``posexplode``) and its shingle frame (projection) from the one
    cache — the corpus is scanned and tokenized ONCE instead of twice,
    one eager count instead of two, and the per-doc layout stores the
    sig/class keys once instead of once per band."""
    from pyspark.sql import types as T

    if with_sig_key and with_buckets:
        raise ValueError("with_sig_key is only supported without buckets")
    if perdoc_shingles and not with_sig_key:
        raise ValueError("perdoc_shingles requires with_sig_key")
    if perdoc_buckets and (with_buckets or with_sig_key or perdoc_shingles):
        raise ValueError("perdoc_buckets is a standalone layout")
    params = _permutation_params(num_hashes)
    rpb = num_hashes // bands
    M = _MERSENNE31
    if perdoc_buckets:
        # ONE compact row per doc: just the _h64 long band buckets —
        # the cheapest materializable proxy of the banding pass (r14,
        # the fused minhash_verified_pairs route checkpoints this; the
        # heavyweight shingle sets deliberately do NOT ride it — a
        # checkpointed row is deserialized WHOLE by every consumer, so
        # fat rows re-pay their bytes per read while the verify-side
        # tokenize is a cheap codegen split the lazy shape already
        # runs).
        fields = [
            T.StructField(id_col, T.LongType()),
            T.StructField("__buckets", T.ArrayType(T.LongType()), False),
        ]
    elif perdoc_shingles:
        fields = [
            T.StructField(id_col, T.LongType()),
            T.StructField("__sh", T.ArrayType(T.StringType()), False),
            T.StructField("__sigkey", T.LongType(), False),
            T.StructField("__classkey", T.StringType(), False),
            T.StructField("__buckets", T.ArrayType(T.LongType()), False),
        ]
    elif with_buckets:
        fields = [
            T.StructField(id_col, T.LongType()),
            T.StructField("__bkts", T.ArrayType(T.LongType()), False),
            T.StructField("band", T.IntegerType(), False),
            T.StructField("bucket", T.LongType(), False),
        ]
    else:
        # The drop-set-private sig-key layout (r14) narrows ``bucket``
        # to the 60-bit ``_h64`` long — every one of minhash_drop_set's
        # (band, bucket) exchanges then moves an 8-byte long instead of
        # a 32-char hex string (guide §2.3 narrower types; a truncation
        # collision can only MERGE buckets, i.e. only ever ADDS
        # candidate pairs, and every candidate is exactly verified, so
        # the drop set is unchanged — the same argument that lets
        # minhash_lsh_pairs use _h64 buckets against its all-pairs
        # oracle). The public layout (minhash_index) keeps the full
        # md5-hex bucket: it is a materialized, engine-portable index
        # schema, not an internal shuffle key.
        fields = [
            T.StructField(id_col, T.LongType()),
            *(
                [
                    T.StructField("__sigkey", T.LongType(), False),
                    T.StructField("__classkey", T.StringType(), False),
                ]
                if with_sig_key
                else []
            ),
            T.StructField("band", T.IntegerType(), False),
            T.StructField(
                "bucket", T.LongType() if with_sig_key else T.StringType()
            ),
        ]
    schema = T.StructType(fields)

    def build(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        A = np.array([a for a, _ in params], dtype=np.int64)
        Bv = np.array([b for _, b in params], dtype=np.int64)
        # Memoization, r13 (pure speedups — every value computed exactly
        # as before, just not twice). ``gmemo`` maps a gram to its
        # (digest-hex, int63 base hash): with k=1 the grams are distinct
        # WORDS and documents share most of their vocabulary, so the
        # per-gram md5 (the builder's hot cost, ~1 µs/call) collapses to
        # one call per distinct gram. Task-lived, capped (clear-on-
        # overflow, Zipf keeps the head hot) so a huge all-distinct
        # vocabulary can't grow executor memory unboundedly. ``tmemo``
        # maps a full text to its per-doc outputs: duplicate clusters —
        # the exact shape this operator exists for — repeat identical
        # texts thousands of times, and every output (buckets, sigkey,
        # classkey) is text-determined, id-independent. BATCH-lived: its
        # keys are references into strings the current Arrow batch holds
        # anyway, so it adds zero retained memory.
        gmemo: dict = {}

        def gram_hash(g):
            got = gmemo.get(g)
            if got is None:
                if len(gmemo) >= 262144:
                    gmemo.clear()
                dig = hashlib.md5(g.encode("utf-8")).hexdigest()
                got = (dig, int(dig[:15], 16) % M)
                gmemo[g] = got
            return got

        for pdf in batches:
            tmemo: dict = {}
            ids: list = []
            bandl: list = []
            buckets: list = []
            bkts_col: list = []
            sigkeys: list = []
            classkeys: list = []
            shs: list = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str):
                    continue  # NULL text: expression path drops it too
                hit = tmemo.get(text)
                if hit is not None:
                    did = int(did)
                    if perdoc_buckets:
                        ids.append(did)
                        bkts_col.append(hit)
                    elif perdoc_shingles:
                        sh_list, bvals, sk, ck = hit
                        ids.append(did)
                        shs.append(sh_list)
                        sigkeys.append(sk)
                        classkeys.append(ck)
                        bkts_col.append(bvals)
                    elif with_buckets:
                        bk = hit
                        for b in range(bands):
                            ids.append(did)
                            bandl.append(b)
                            buckets.append(bk[b])
                            bkts_col.append(bk)
                    else:
                        bvals, sk, ck = hit
                        for b in range(bands):
                            ids.append(did)
                            bandl.append(b)
                            buckets.append(bvals[b])
                            if with_sig_key:
                                sigkeys.append(sk)
                                classkeys.append(ck)
                    continue
                toks = text.split(" ")
                if len(toks) < k:
                    continue  # zero shingles
                if k == 1:
                    grams = set(toks)
                else:
                    grams = {
                        " ".join(toks[i : i + k])
                        for i in range(len(toks) - k + 1)
                    }
                if with_sig_key:
                    # keep the full digests: the class key reuses them
                    digs = []
                    xs = np.empty(len(grams), dtype=np.int64)
                    for i, g in enumerate(grams):
                        dig, x = gram_hash(g)
                        digs.append(dig)
                        xs[i] = x
                else:
                    xs = np.fromiter(
                        (gram_hash(g)[1] for g in grams),
                        dtype=np.int64,
                        count=len(grams),
                    )
                sig = ((xs[:, None] * A[None, :] + Bv[None, :]) % M).min(
                    axis=0
                )
                svals = [
                    ",".join(
                        str(int(v)) for v in sig[b * rpb : (b + 1) * rpb]
                    )
                    for b in range(bands)
                ]
                did = int(did)
                if with_buckets or perdoc_buckets:
                    bk = [
                        int(
                            hashlib.md5(s.encode("utf-8")).hexdigest()[:15],
                            16,
                        )
                        for s in svals
                    ]
                    tmemo[text] = bk
                    if perdoc_buckets:
                        ids.append(did)
                        bkts_col.append(bk)
                    else:
                        for b in range(bands):
                            ids.append(did)
                            bandl.append(b)
                            buckets.append(bk[b])
                            bkts_col.append(bk)
                else:
                    sk = ck = None
                    if with_sig_key:
                        # same rendering as the band slices (comma-joined
                        # decimal), over the FULL signature, through _h64
                        sk = int(
                            hashlib.md5(
                                ",".join(
                                    str(int(v)) for v in sig
                                ).encode("utf-8")
                            ).hexdigest()[:15],
                            16,
                        )
                        # = _class_key_col: md5 of the comma-joined
                        # lexicographically-sorted full gram digests
                        ck = hashlib.md5(
                            ",".join(sorted(digs)).encode("utf-8")
                        ).hexdigest()
                    if with_sig_key:
                        # drop-set-private layout: the 60-bit _h64 long
                        # (= int of the first 15 hex digits), not the
                        # full hex — see the schema comment above
                        bvals = [
                            int(
                                hashlib.md5(s.encode("utf-8")).hexdigest()[
                                    :15
                                ],
                                16,
                            )
                            for s in svals
                        ]
                    else:
                        bvals = [
                            hashlib.md5(s.encode("utf-8")).hexdigest()
                            for s in svals
                        ]
                    if perdoc_shingles:
                        sh_list = sorted(grams)
                        tmemo[text] = (sh_list, bvals, sk, ck)
                        ids.append(did)
                        shs.append(sh_list)
                        sigkeys.append(sk)
                        classkeys.append(ck)
                        bkts_col.append(bvals)
                    else:
                        tmemo[text] = (bvals, sk, ck)
                        for b in range(bands):
                            ids.append(did)
                            bandl.append(b)
                            buckets.append(bvals[b])
                            if with_sig_key:
                                sigkeys.append(sk)
                                classkeys.append(ck)
            data = {id_col: pd.Series(ids, dtype="int64")}
            if perdoc_buckets:
                data["__buckets"] = pd.Series(bkts_col, dtype="object")
            elif perdoc_shingles:
                data["__sh"] = pd.Series(shs, dtype="object")
                data["__sigkey"] = pd.Series(sigkeys, dtype="int64")
                data["__classkey"] = pd.Series(classkeys, dtype="object")
                data["__buckets"] = pd.Series(bkts_col, dtype="object")
            elif with_buckets:
                data["__bkts"] = pd.Series(bkts_col, dtype="object")
                data["band"] = pd.Series(bandl, dtype="int32")
                data["bucket"] = pd.Series(buckets, dtype="int64")
            else:
                if with_sig_key:
                    data["__sigkey"] = pd.Series(sigkeys, dtype="int64")
                    data["__classkey"] = pd.Series(classkeys, dtype="object")
                data["band"] = pd.Series(bandl, dtype="int32")
                data["bucket"] = pd.Series(
                    buckets, dtype="int64" if with_sig_key else "object"
                )
            yield pd.DataFrame(data, columns=[f.name for f in fields])

    from lakeshack_spark.session import spread_small_input

    return spread_small_input(
        df.select(F.col(id_col), F.col(text_col))
    ).mapInPandas(build, schema)


def _use_arrow_banding(df: DataFrame, id_col: str, impl: str | None) -> bool:
    from pyspark.sql import types as T

    impl = BANDED_IMPL if impl is None else impl
    return impl == "arrow" and isinstance(
        df.schema[id_col].dataType, T.LongType
    )


def _banded(
    df: DataFrame, text_col: str, id_col: str,
    num_hashes: int, bands: int, k: int,
    impl: str | None = None,
    with_sig_key: bool = False,
) -> DataFrame:
    """(id, band, bucket) rows: each doc explodes to ``bands`` rows keyed
    by the md5 of that band's signature slice. Dispatches to the Arrow
    twin by default (:data:`BANDED_IMPL`); ``impl="expr"`` forces the
    expression form (always used for non-long id columns).
    ``with_sig_key`` adds a per-doc ``__sigkey`` long (``_h64`` of the
    comma-joined full signature — see :func:`_banded_rows_arrow`); the
    Arrow twin ALSO emits ``__classkey`` (exact shingle-class identity,
    free there), the expression twin deliberately does not (ADVICE r9 —
    see the inline comment below)."""
    if _use_arrow_banding(df, id_col, impl):
        return _banded_rows_arrow(
            df, text_col, id_col, num_hashes, bands, k,
            with_buckets=False, with_sig_key=with_sig_key,
        )
    sigs = _nonempty_sigs(df, text_col, id_col, num_hashes, k)
    band_vals = _band_value_exprs(num_hashes, bands)
    head = [F.col(id_col)]
    out_cols = [id_col]
    if with_sig_key:
        # identical rendering to the Arrow twin: longs print as plain
        # decimal under concat_ws, matching str(int(v))
        full_sig = F.concat_ws(
            ",",
            *[F.element_at(F.col("sig"), i + 1) for i in range(num_hashes)],
        )
        head.append(_h64(full_sig).alias("__sigkey"))
        out_cols.append("__sigkey")
        # NO ``__classkey`` here, deliberately (ADVICE r9): on this
        # interpreted path ``_class_key_col`` is an md5 PER SHINGLE per
        # doc — paying it for the WHOLE corpus at banding time costs
        # more than the class collapse saves (a clean corpus pays it
        # yet skips pass 2 entirely). :func:`_pass2_audience` computes
        # it over just the pass-2 candidate audience instead (its
        # no-classkey branch); the Arrow twin emits it at banding
        # because the per-gram digests are already in hand there.
    # sig-key layout (drop-set private): long _h64 buckets, matching the
    # Arrow twin's r14 narrowing (see _banded_rows_arrow's schema
    # comment); the public bare layout keeps the md5-hex bucket.
    bucket_of = _h64 if with_sig_key else F.md5
    return sigs.select(
        *head,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        bucket_of(band_vals[b]).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(*out_cols, "bb.band", "bb.bucket")


def _banded_with_buckets(
    df: DataFrame, text_col: str, id_col: str,
    num_hashes: int, bands: int, k: int,
    impl: str | None = None,
) -> DataFrame:
    """Like :func:`_banded`, but buckets are long-typed (the portable
    md5→conv hash over the SAME shared band-slice expressions) and each
    exploded row also carries the full per-band bucket array ``__bkts``,
    so :func:`minhash_lsh_pairs` can compare a joined pair's band-0
    buckets locally for its band-0 pre-dedup (carrying the whole array
    through the JOIN was measured as the dominant cost and is avoided
    there — the caller projects out just element 1 before aliasing).
    Same Arrow-twin dispatch as :func:`_banded`."""
    if _use_arrow_banding(df, id_col, impl):
        return _banded_rows_arrow(
            df, text_col, id_col, num_hashes, bands, k, with_buckets=True
        )
    sigs = _nonempty_sigs(df, text_col, id_col, num_hashes, k)
    bucket_hashes = F.array(*[_h64(v) for v in _band_value_exprs(num_hashes, bands)])
    with_bkts = sigs.select(F.col(id_col), bucket_hashes.alias("__bkts"))
    return with_bkts.select(
        F.col(id_col),
        F.col("__bkts"),
        F.explode(
            F.array(*[F.lit(b) for b in range(bands)])
        ).alias("band"),
    ).withColumn("bucket", F.element_at(F.col("__bkts"), F.col("band") + 1))


def minhash_lsh_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 32, bands: int = 8, k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding: split the signature
    into ``bands`` rows of ``num_hashes/bands``, bucket on a hash of the
    band's values, self-join per bucket with ``id < id``. Returns
    distinct (id_a, id_b).

    The self-join is an equi-join on (band, bucket-hash): each shuffle key
    holds only colliding docs, so cost tracks true-duplicate density, not
    n². A hot bucket (giant duplicate cluster) is handled by AQE skew
    splitting.

    BAND-0 PRE-DEDUP before the distinct: a pair of near-identical docs
    collides in EVERY band, so the join emits it ``bands`` times and a
    dup-dense corpus pushes pairs × bands rows through the dedup shuffle
    (measured 152M rows into distinct for 9.5M output pairs on the sf0.1
    documents at k=1). Each banded row carries ONE extra long — its
    band-0 bucket — and a band-b>0 emission is dropped map-side when the
    pair already collided at band 0 (`__bkt0` equal). Near-identical
    pairs (the mass in a dup-dense corpus) collide at band 0, so they
    reach the distinct exactly once; only partial-signature matches that
    miss band 0 still emit multiply and are deduped by the (now small)
    distinct. One scalar long comparison per joined row, codegen'd.
    Measured on that corpus: distinct input 152M → ~9.5M rows, wall
    17s vs 20s single-node (join-output generation dominates locally;
    on a cluster the dedup EXCHANGE is the network-bound stage, and it
    shrinks ~bands×).

    (Two exact-once alternatives measured 6-8× SLOWER than the distinct
    itself on the same corpus and were rejected: carrying the full
    per-band bucket array with an `exists` lambda runs interpreted per
    joined row, and even an unrolled when-chain pays for materializing
    two 16-long arrays into each of the 152M joined rows — the payload
    width, not the predicate, dominates. See CLAUDE.md.)
    """
    banded = _banded_with_buckets(df, text_col, id_col, num_hashes, bands, k).select(
        F.col(id_col),
        F.col("band"),
        F.col("bucket"),
        F.element_at(F.col("__bkts"), 1).alias("__bkt0"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter((F.col("a.band") == 0) | (F.col("a.__bkt0") != F.col("b.__bkt0")))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_verified_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 64, bands: int = 16, k: int = 1,
    threshold: float = 0.9,
    fused: bool | None = None,
) -> DataFrame:
    """The full two-stage near-dedup discovery pipeline: MinHash+LSH
    banding proposes candidate pairs (sub-quadratic), exact shingle-set
    Jaccard verifies them (runs only on candidates). Returns
    (id_a, id_b, jaccard) with jaccard ≥ threshold.

    This is the shape that scales to 100 TB: discovery cost tracks
    true-duplicate density via the (band, bucket) equi-join, and the O(|c|)
    verify join touches only LSH survivors. With enough bands the output
    equals the all-pairs exact answer (16 bands × 4 rows: a J=0.9 pair is
    missed with p ≈ (1−0.9⁴)¹⁶ ≈ 2e-8), which is what makes the whole
    banding path checkable against a SQL oracle.

    ``fused`` (r14, VERDICT_r13 item 3 — the priced dispatch that
    answers the r13 laziness question): the lazy shape runs the
    md5+permutation Arrow BANDING pass twice per run (once under each
    side of the band self-join — the exchange is not reused at the BHJ
    shape, and forcing SMJ to reuse it measured 5× slower on dup-dense
    corpora, r13). The fused route runs that pass ONCE, into a compact
    per-doc bucket proxy ``(id, __buckets)`` that is eagerly
    ``localCheckpoint``\\ ed; both self-join sides are projections of
    the materialized frame. ``localCheckpoint`` (not ``persist``) is
    what preserves the composition contract: there is no cache handle
    for the caller to leak — the checkpointed blocks are released by
    the ContextCleaner when the returned frame's RDD is garbage
    collected. The verify stage deliberately keeps the lazy expression
    shingles (see the inline comment). The trade is one materialization
    job at CONSTRUCTION time, so small inputs should keep the lazy
    shape: ``fused=None`` (default) routes by the zero-job Catalyst
    size estimate (≥ :data:`VERIFIED_FUSED_MIN_INPUT_BYTES` and a long
    id column → fused), ``True``/``False`` force a route. Both routes
    are BIT-IDENTICAL: the per-doc buckets are the same ``_h64`` longs
    the lazy banding uses and the verify is the same integer-|∩|/|∪|
    double quotient (parity-pinned in tests/test_operators.py).
    """
    if fused is None:
        fused = (
            _use_arrow_banding(df, id_col, None)
            and _plan_size_bytes(df) >= VERIFIED_FUSED_MIN_INPUT_BYTES
        )
    if fused:
        if not _use_arrow_banding(df, id_col, None):
            raise ValueError(
                "fused=True requires a long-typed id column (the per-doc "
                "Arrow layout); use fused=False or 'auto' (None)"
            )
        # Checkpoint ONLY the compact per-doc bucket proxy (id + bands
        # longs): the md5+permutation banding pass is the expensive
        # tokenize, and it is the only thing worth materializing. A
        # first cut checkpointed the full per-doc layout (__sh shingle
        # sets included) and LOST the 1M-doc A/B 38 vs 25 s — a
        # checkpointed row deserializes WHOLE for every consumer, so
        # the fat shingle arrays re-paid their bytes four times while
        # the verify-side expression tokenize they replaced is a cheap
        # codegen split. The verify below therefore keeps the lazy
        # shape's expression shingles (guide §8: materialize the small
        # proxy, recompute the cheap part).
        perdoc = _banded_rows_arrow(
            df, text_col, id_col, num_hashes, bands, k,
            with_buckets=False, perdoc_buckets=True,
        ).localCheckpoint(eager=True)
        banded = perdoc.select(
            F.col(id_col),
            F.posexplode("__buckets").alias("band", "bucket"),
            F.element_at(F.col("__buckets"), 1).alias("__bkt0"),
        )
        a0 = banded.alias("a")
        b0 = banded.alias("b")
        # identical self-join + band-0 pre-dedup as minhash_lsh_pairs —
        # same _h64 long buckets, so the candidate set is equal row for
        # row; both join sides read the one checkpointed frame.
        cands = (
            a0.join(
                b0,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .filter(
                (F.col("a.band") == 0)
                | (F.col("a.__bkt0") != F.col("b.__bkt0"))
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .distinct()
        )
    else:
        cands = minhash_lsh_pairs(df, text_col, id_col, num_hashes, bands, k)
    # Shingle arrays are SETS (array_distinct), so |union| = |a|+|b|-|∩|
    # exactly: per-side sizes computed once per document replace the
    # per-pair array_union build — the verify stage does one set
    # intersection per candidate instead of two set operations.
    # Identical jaccard values (integer identity, same double division).
    sh = df.select(F.col(id_col), shingles_col(text_col, k).alias("__sh"))
    a = sh.select(
        F.col(id_col).alias("id_a"),
        F.col("__sh").alias("__sh_a"),
        F.size("__sh").alias("__sz_a"),
    )
    b = sh.select(
        F.col(id_col).alias("id_b"),
        F.col("__sh").alias("__sh_b"),
        F.size("__sh").alias("__sz_b"),
    )
    joined = cands.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.col("__sz_a") + F.col("__sz_b") - inter
    # Size branch-skip: J = |∩|/|∪| ≤ min(|a|,|b|)/max(|a|,|b|), so a pair
    # whose set sizes differ beyond the threshold ratio can never verify.
    # Putting that test FIRST in the CASE lets per-row evaluation skip
    # array_intersect entirely for such pairs (CASE WHEN branches are
    # lazy) at zero extra joins or passes; the 1e-9 slack only ever sends
    # extra pairs to the exact branch, so output values are identical.
    # (A separate int-only prefilter JOIN before the array join re-paid
    # its savings in an extra shingle pass here where nothing is cached —
    # drop_set, which caches, uses the join form.)
    size_cannot_verify = (
        F.least("__sz_a", "__sz_b").cast("double")
        < (F.lit(threshold) - F.lit(1e-9)) * F.greatest("__sz_a", "__sz_b")
    )
    # inter >= 0 guard: size(NULL array) is -1, and the size identity
    # would turn that into a NEGATIVE jaccard where the old array_union
    # form yielded 0.0 (unreachable here — banding filters empty/NULL
    # shingle docs — but the guard keeps the identity unconditional).
    jac = F.when(size_cannot_verify, F.lit(0.0)).when(
        (inter >= 0) & (union > 0), inter.cast("double") / union
    ).otherwise(F.lit(0.0))
    return (
        joined.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------------------- simhash

def _simhash_fp_arrow_udf():
    """Arrow-batched twin of the simhash fingerprint expression below —
    bit-identical by construction (same single-space split, same distinct
    token set, same md5-hex[:15]→int63 hash, same ±1 per-bit fold, same
    positive-counter mask sum; NULL text → 0 like the coalesce branch).

    The expression form is a nested HOF (aggregate(zip_with(...)) over
    the token-hash array) which never enters whole-stage codegen, the
    regime where Arrow UDFs beat built-ins 7× for
    text.repetition_stats. Early rounds measured the two EQUAL on this
    stage (per-token md5 dominating both); the r14 re-measurement
    (VERDICT_r13 item 6, tools/measure_srp_simhash.py,
    plans/r14/simhash_wide_ab.jsonl) has the Arrow pass winning every
    interleaved round at every doc length tried — 0.54-0.71 vs
    1.0-1.4 s on the real 5k-doc sf0.1 corpus, growing to ~2× at 400
    words — so it is the default since r14 (see :func:`simhash`).
    Parity is pinned in tests; the expression twin remains the
    cross-engine reference."""
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    shifts = np.arange(63, dtype=np.uint64)

    @pandas_udf("long")
    def fp(texts: pd.Series) -> pd.Series:
        import numpy as np  # re-import: runs on executors

        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if t is None:
                continue
            toks = set(t.split(" "))
            hs = np.fromiter(
                (
                    int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
                    for tok in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            if not len(hs):
                continue
            pos = ((hs[:, None] >> shifts) & np.uint64(1)).sum(
                axis=0, dtype=np.int64
            )
            counters = 2 * pos - np.int64(len(hs))
            sel = shifts[counters > 0]
            out[i] = (np.uint64(1) << sel).sum(dtype=np.uint64).astype(np.int64)
        return pd.Series(out)

    return fp


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    impl: str | None = None,
) -> DataFrame:
    """Adds ``simhash``: 64-bit fingerprint — bit j is 1 iff the sum over
    distinct tokens of ±1 (sign of md5-derived bit j of the token) is
    positive. Near-identical token sets → small hamming distance.

    ``impl=None`` (default) routes full-width fingerprints through the
    Arrow twin (r14, VERDICT_r13 item 6): re-measured interleaved on
    this epoch (tools/measure_srp_simhash.py + the real sf0.1 corpus,
    plans/r14/simhash_wide_ab.jsonl), the Arrow pass wins at EVERY
    tested shape — real 5k-doc/54-word corpus 0.54-0.71 vs 1.0-1.4 s
    (4/4 rounds), 30k synthetic docs 0.8-1.0 vs 1.2-1.5 s at 60 words
    up to 2.7-4.8 vs 6.4-8.8 s at 400 words — the r13 expr-wins reading
    did not reproduce. ``impl="expr"`` keeps the pure-expression form
    (the cross-engine-readable reference and the only form for
    truncated ``bits``); values are bit-identical, pinned by test."""
    if impl is None:
        impl = "arrow" if min(bits, 63) == 63 else "expr"
    if impl == "arrow" and min(bits, 63) == 63:
        return df.withColumn(
            "simhash",
            _simhash_fp_arrow_udf()(
                F.col(text_col) if isinstance(text_col, str) else text_col
            ),
        )
    tokens = F.array_distinct(words_col(text_col))
    # NULL text → empty hash array → all-zero counters → fingerprint 0,
    # matching the pre-single-pass per-bit form (which coalesced each bit
    # to 0); without this the aggregate propagates NULL and such docs
    # silently vanish from simhash_near_pairs' equi-join.
    th = F.coalesce(
        F.transform(tokens, _h64), F.expr("array()").cast("array<bigint>")
    )  # one 63-bit hash per token
    nbits = min(bits, 63)
    # ONE literal mask array [1<<0 .. 1<<nbits-1] as a single SQL string
    # (per-scalar F.lit is one py4j round trip each — CLAUDE.md).
    masks = F.expr(
        "array(" + ",".join(f"{1 << j}L" for j in range(nbits)) + ")"
    )
    # Single interpreted pass over the token hashes (HOFs get no codegen
    # and re-evaluate the lambda body per element): the accumulator is
    # the whole 63-counter array, updated by one zip_with per token —
    # counter j gains +1 when bit j of the hash is set, else -1. The old
    # form ran 63 separate aggregate traversals of the same array.
    counters = F.aggregate(
        th,
        F.array_repeat(F.lit(0), nbits),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a
            + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    # bit j of the fingerprint is set iff counter j is positive: sum the
    # masks of positive counters (disjoint bits, so + == bitwise OR).
    fp = F.aggregate(
        F.zip_with(
            counters,
            masks,
            lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.withColumn("simhash", fp)


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3, blocks: int = 4,
) -> DataFrame:
    """Near-pairs by simhash: block the 64-bit fingerprint into ``blocks``
    16-bit segments; by pigeonhole any pair within ``max_hamming < blocks``
    shares at least one exact segment → equi-join per segment, then exact
    hamming filter via bit_count(xor)."""
    # The fingerprint is the expensive stage and the corpus often arrives
    # as ONE single-row-group file (measured: the whole self-join ran
    # single-task at bench scale — fingerprint, join and distinct all
    # serialized on one core). See session.spread_small_input.
    from lakeshack_spark.session import spread_small_input

    df = spread_small_input(df)
    fps = simhash(df, text_col, id_col).select(id_col, "simhash")
    seg = fps.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("seg_no"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("seg"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("s"),
    ).select(id_col, "simhash", "s.seg_no", "s.seg")
    a, b = seg.alias("a"), seg.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.seg_no") == F.col("b.seg_no"))
            & (F.col("a.seg") == F.col("b.seg"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# ------------------------------------------------------- n-gram jaccard

def ngram_jaccard_pairs(
    left: DataFrame,
    right: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.0,
    block_col: str | None = None,
) -> DataFrame:
    """Exact Jaccard similarity of word k-gram shingle sets over document
    pairs (``id_a < id_b``). ``block_col`` restricts pairs to equal blocks
    (e.g. same source) — at scale always block or feed LSH candidates, the
    unblocked version is a cross join."""
    from lakeshack_spark.session import spread_small_input

    left = spread_small_input(left)  # shingle trees + the pair join
    # serialize on one core for a single-row-group table
    right = spread_small_input(right) if right is not None else left
    # Per-side shingle-set sizes (see minhash_verified_pairs): one set
    # intersection per pair, no per-pair array_union; identical values.
    cols = [
        F.col(id_col),
        shingles_col(text_col, k).alias("sh"),
    ]
    if block_col:
        cols.append(F.col(block_col))
    a = left.select(*cols).withColumn("__sz", F.size("sh")).alias("a")
    b = right.select(*cols).withColumn("__sz", F.size("sh")).alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.col("a.__sz") + F.col("b.__sz") - inter
    # size(NULL array) = -1: without the inter >= 0 guard a NULL-text doc
    # would produce a negative jaccard here (the old array_union form
    # yielded 0.0; NULL docs DO reach this join — no banding filter).
    jac = F.when(
        (inter >= 0) & (union > 0), inter.cast("double") / union
    ).otherwise(F.lit(0.0))
    out = (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jac.alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def ngram_containment_pairs(
    left: DataFrame,
    right: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.0,
    block_col: str | None = None,
) -> DataFrame:
    """Broder CONTAINMENT ``C(A,B) = |A∩B| / |A|`` of k-gram shingle
    sets, both directions per pair — the asymmetric quote/subset
    detector symmetric Jaccard misses: a short document fully quoted
    inside a long one has near-zero Jaccard (tiny union overlap) but
    containment 1.0 in the quote→host direction. The signal behind
    "is this doc embedded in that one" checks — boilerplate extraction,
    quote tracing, partial-duplicate auditing.

    Output: ``(id_a, id_b, containment_a_in_b, containment_b_in_a)``
    for pairs with ``max(both) ≥ threshold``. Same join/guard discipline
    as :func:`ngram_jaccard_pairs`: one set intersection per pair,
    per-side sizes precomputed, ``inter >= 0`` guarding the
    size(NULL) = -1 trap, and ``block_col`` required at scale (the
    unblocked form is a cross join — feed LSH candidates or a block)."""
    right = right if right is not None else left
    cols = [F.col(id_col), shingles_col(text_col, k).alias("sh")]
    if block_col:
        cols.append(F.col(block_col))
    a = left.select(*cols).withColumn("__sz", F.size("sh")).alias("a")
    b = right.select(*cols).withColumn("__sz", F.size("sh")).alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))

    def contain(sz: Column) -> Column:
        return F.when(
            (inter >= 0) & (sz > 0), inter.cast("double") / sz
        ).otherwise(F.lit(0.0))

    out = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        contain(F.col("a.__sz")).alias("containment_a_in_b"),
        contain(F.col("b.__sz")).alias("containment_b_in_a"),
    )
    if threshold > 0:
        out = out.filter(
            F.greatest(
                F.col("containment_a_in_b"), F.col("containment_b_in_a")
            )
            >= threshold
        )
    return out


# -------------------------------------------------- incremental near-dedup


def minhash_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 64, bands: int = 16, k: int = 1,
) -> DataFrame:
    """The materializable LSH index of a corpus: ``(id, band, bucket)``
    rows (``bands`` per doc). Write it once next to the data (any sink);
    every future batch probes it without touching corpus text — the
    index, not the corpus, is what incremental dedup joins against.
    Parameters are part of the index identity: a probe MUST band with the
    same (num_hashes, bands, k) or buckets never collide."""
    return _banded(df, text_col, id_col, num_hashes, bands, k)


def incremental_near_dups(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 1,
    threshold: float = 0.9,
    corpus_index: DataFrame | None = None,
) -> DataFrame:
    """Near-dedup a NEW batch against an EXISTING corpus without
    re-processing the corpus: ``(id_new, id_corpus, jaccard)`` for every
    cross pair with verified Jaccard ≥ ``threshold``.

    The O(batch) shape continuous ingest needs at 100 TB — the
    full-corpus operators (:func:`minhash_verified_pairs`,
    :func:`minhash_drop_set`) re-band everything on every run, which is
    a compaction-cadence cost, not a per-batch one. Here:

    - the corpus contributes only its (pre-materialized) LSH index
      (:func:`minhash_index`) — pass ``corpus_index`` to skip banding the
      corpus entirely; corpus TEXT is read only for docs that actually
      collide (semi-join first, shingle after, so the expensive shingle
      trees run on survivors only — the same point-lookup pattern the
      metastore serves);
    - the new batch is banded (O(batch × bands)) and equi-joined on
      (band, bucket) — probe cost tracks collision density, never
      |batch| × |corpus|;
    - exact shingle-set Jaccard verifies candidates with the per-side
      size identity (|∪| = |a|+|b|−|∩|), same as the batch verify.

    With the default 16 bands × 4 rows, a J ≥ 0.9 cross pair is missed
    with p ≈ (1−0.9⁴)¹⁶ ≈ 2e-8 — the banded result is provably equal to
    the all-cross-pairs answer (the :func:`minhash_verified_pairs`
    argument, transplanted), which is what makes this entry checkable
    against a SQL oracle."""
    if corpus_index is None:
        corpus_index = minhash_index(
            corpus_docs, text_col, id_col, num_hashes, bands, k
        )
    nb = _banded(new_docs, text_col, id_col, num_hashes, bands, k).select(
        F.col(id_col).alias("id_new"), "band", "bucket"
    )
    idx = corpus_index.select(
        F.col(id_col).alias("id_corpus"), "band", "bucket"
    )
    # id_new != id_corpus: a doc is never a duplicate of itself — guards
    # overlap cases (e.g. a replayed ingest batch probing an index that
    # already contains its own previous write) from self-pairs.
    cands = (
        nb.join(idx, ["band", "bucket"])
        .filter(F.col("id_new") != F.col("id_corpus"))
        .select("id_new", "id_corpus")
        .distinct()
    )

    corpus_needed = corpus_docs.join(
        cands.select(F.col("id_corpus").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    )
    shc = corpus_needed.select(
        F.col(id_col).alias("id_corpus"),
        shingles_col(text_col, k).alias("__sh_c"),
    ).withColumn("__sz_c", F.size("__sh_c"))
    shn = new_docs.select(
        F.col(id_col).alias("id_new"),
        shingles_col(text_col, k).alias("__sh_n"),
    ).withColumn("__sz_n", F.size("__sh_n"))
    joined = cands.join(shn, "id_new").join(shc, "id_corpus")
    inter = F.size(F.array_intersect("__sh_n", "__sh_c"))
    union = F.col("__sz_n") + F.col("__sz_c") - inter
    # Size branch-skip (see minhash_verified_pairs): J ≤ min/max of the
    # set sizes, so size-refuted pairs return 0.0 without evaluating
    # array_intersect; output is threshold-filtered, so values are
    # identical. The 1e-9 slack only ever sends extra pairs to the exact
    # branch.
    size_cannot_verify = (
        F.least("__sz_n", "__sz_c").cast("double")
        < (F.lit(threshold) - F.lit(1e-9)) * F.greatest("__sz_n", "__sz_c")
    )
    jac = F.when(size_cannot_verify, F.lit(0.0)).when(
        (inter >= 0) & (union > 0), inter.cast("double") / union
    ).otherwise(F.lit(0.0))
    return (
        joined.select("id_new", "id_corpus", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------- benchmark contamination


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Flag training documents that share ≥ ``min_hits`` distinct word
    ``k``-grams with a benchmark/eval set (the standard decontamination
    test, e.g. GPT-3 appendix C / PaLM §7: 8-13-gram overlap).

    Returns ``(id_col, n_hits)`` for contaminated docs only. Physical
    plan: both sides explode to distinct (gram-hash) rows; benchmark
    grams are ``distinct()``-ed and the join is an equi-join on the hash
    — the benchmark side is tiny (eval sets), so AQE broadcasts it and
    the corpus side stays map-only: no corpus-sized shuffle at 100 TB.
    Hashes use the portable 63-bit md5 (:func:`_h64`), so a benchmark
    gram set exported from another engine matches bit-for-bit.
    """
    g = F.explode(shingles_col(text_col, k)).alias("gram")
    doc_grams = docs.select(F.col(id_col), g).select(
        id_col, _h64(F.col("gram")).alias("__gh")
    )
    bench_grams = (
        benchmark.select(g)
        .select(_h64(F.col("gram")).alias("__gh"))
        .distinct()
    )
    return (
        doc_grams.join(bench_grams, "__gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def minhash_first_candidates(
    banded: DataFrame, id_col: str = "doc_id", with_rows: bool = False
):
    """Each doc's bucket-min candidates: for every band, the smallest id
    in the doc's bucket (when below its own) — distinct (id_b, id_a)
    rows, AT MOST ``bands`` per doc. JOIN-FREE by construction (a window
    min over the bucket), which is the property that makes keep-earliest
    dedup linear in docs instead of quadratic in cluster size; pinned by
    a plan test asserting no Join node.

    All bucket-mins (not just the global smallest) are kept: on corpora
    whose buckets mix true near-dups with look-alikes (shared vocabulary,
    sub-threshold Jaccard), a single candidate per doc almost always
    fails verification and pushes everything into the pairwise fallback —
    measured 4984/4991 failures on the bench corpus. Up to ``bands``
    candidates keeps pass 1 O(docs × bands) while catching any dup that
    is ITS bucket's minimum in at least one band.

    ``with_rows=True`` additionally returns the pre-distinct per-band
    rows ``(id_col, band, bucket, id_a, __bsz)`` — ``__bsz`` is the
    bucket's size from the SAME window pass (no extra shuffle), so
    Σ ``__bsz`` over a doc's rows upper-bounds its pass-2 candidate
    count (each qualifying bucket contributes at most |bucket| smaller
    ids). :func:`minhash_drop_set` prices its pass-2 route from that
    byproduct instead of paying a dedicated estimate job, and (r14)
    :func:`_pass2_audience` scopes pass 2 from these cached rows instead
    of re-deriving the failed docs' bucket membership from ``banded``:
    a failed doc's banded rows MISSING here are exactly the buckets it
    is the minimum of, and a bucket where the failed doc is the minimum
    cannot hold any smaller-id candidate — dropping those rows loses no
    pass-2 pair (both pass-2 forms require ``a.id < b.id`` within the
    shared bucket)."""
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket")
    marked = banded.withColumn("__bucket_min", F.min(id_col).over(w))
    if with_rows:
        marked = marked.withColumn("__bsz", F.count(F.lit(1)).over(w))
    rows = marked.filter(F.col("__bucket_min") < F.col(id_col))
    first = rows.select(
        F.col(id_col).alias("id_b"), F.col("__bucket_min").alias("id_a")
    ).distinct()
    if not with_rows:
        return first
    return first, rows.select(
        F.col(id_col),
        F.col("band"),
        F.col("bucket"),
        F.col("__bucket_min").alias("id_a"),
        F.col("__bsz"),
    )


def _tier1_pair_estimate(banded, fb_buckets, failed_docs, id_col) -> int:
    """ONE-job rep-collapsed pair estimate for the drop-set auto route:
    Σ per failed bucket of distinct shingle-classes × failures there.
    Exact when the banded rows carry ``__classkey`` (Arrow banding —
    the production path for long ids); a ``__sigkey``-keyed lower bound
    otherwise (forced expression banding — see the dispatch comment in
    :func:`minhash_drop_set`). A separate function so the routing rules
    that must SKIP it (non-long ids, explicit routes, tier-0 small/zero
    bounds) are pinnable by monkeypatch."""
    est_key = (
        "__classkey" if "__classkey" in banded.columns else "__sigkey"
    )
    failed_ids = failed_docs.select(
        F.col("id_b").alias(id_col), F.lit(1).alias("__f")
    )
    return (
        banded.join(fb_buckets, ["band", "bucket"], "left_semi")
        .join(failed_ids, id_col, "left")
        .groupBy("band", "bucket")
        .agg(
            F.sum("__f").alias("__nf"),
            F.count_distinct(est_key).alias("__bcls"),
        )
        .agg(F.sum(F.col("__nf") * F.col("__bcls")))
        .collect()[0][0]
        or 0
    )


def _pass2_audience(banded, sh, failed_docs, id_col, cand_rows=None):
    """Shared pass-2 scoping: the failed docs' banded rows, the buckets
    they occupy, and the shingle-class representatives of every doc in
    those buckets.

    ``cand_rows`` (r14): the persisted pass-1 window byproduct
    ``(id, band, bucket, id_a, __bsz)``. When given, ``fb`` and
    ``fb_buckets`` are PROJECTIONS of that cache instead of a fresh
    ``banded`` semi-join lineage — the failed docs' qualifying rows were
    already computed by the pass-1 window, so pass 2's scoping jobs read
    cached rows rather than re-deriving the (band, bucket) membership.
    Exactness: the rows cand_rows lacks (a failed doc's rows in buckets
    it is the MINIMUM of) cannot contribute a pass-2 pair — both forms
    require a smaller-id partner in the shared bucket, and none exists
    below the bucket minimum (see :func:`minhash_first_candidates`).

    Class collapse: an identical shingle SET (not just identical text —
    e.g. word-order rotations of a template under k=1) ⇒ identical
    minhash signature, identical buckets, and identical Jaccard against
    every doc, so the class's min id (which is provably also every
    bucket-min it appears in) stands in exactly for the whole class:
    (rep, b) verifies iff (any member, b) verifies, and rep < b follows
    from rep ≤ member < b. Without this collapse a failed doc whose
    bucket holds an m-doc duplicate cluster meets m candidates (measured
    6.7M pairs from 4228 failures against a planted 2000-doc cluster);
    with it, one per bucket — pass 2 scales with failures × distinct
    shingle-classes per bucket, never cluster size.

    Class key = md5 over the sorted PER-SHINGLE md5s: hex digests are
    fixed-alphabet, so the comma join cannot collide however weird the
    tokens are (a raw-text join with any separator is ambiguous the
    moment a token contains it). An md5 collision merging two classes
    is the only residual failure mode — negligible vs the constructible
    separator ambiguity.

    Reps are computed only over docs that share a bucket with a failed
    doc — pass 2's only audience. Members of one class occupy identical
    buckets, so if any member is in a failed bucket the class's GLOBAL
    min is too: the restricted min equals the global min, exactly. With
    zero failures this whole branch aggregates nothing.
    """
    if cand_rows is not None:
        fb = cand_rows.join(
            failed_docs.select(F.col("id_b").alias(id_col)),
            id_col,
            "left_semi",
        ).select(id_col, "band", "bucket")
    else:
        fb = banded.join(
            failed_docs.select(F.col("id_b").alias(id_col)),
            id_col,
            "left_semi",
        )
    fb_buckets = fb.select("band", "bucket").distinct()
    if "__classkey" in banded.columns:
        # the banding pass already rendered the class key from the gram
        # digests it computes anyway — grouping the persisted banded
        # rows replaces an interpreted md5 PER SHINGLE over the shingle
        # frame (measured 0.8-1.5 s on the bench corpus). Duplicate
        # rows per doc (one per band) do not move the min.
        reps = (
            banded.join(fb_buckets, ["band", "bucket"], "left_semi")
            .groupBy("__classkey")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
        )
        return fb, fb_buckets, reps
    cand_docs = (
        banded.join(fb_buckets, ["band", "bucket"], "left_semi")
        .select(id_col)
        .distinct()
    )
    reps = (
        sh.join(cand_docs, id_col, "left_semi")
        .groupBy(_class_key_col(F.col("__sh")).alias("__sk"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return fb, fb_buckets, reps


def _drop_set_pass2_pairs(
    banded, sh, verified, fb, reps, first, id_col, threshold
):
    """Pass 2, pair-join form (the r6/r7 shape, kept as the parity
    reference for the local form): bucket-equi candidate join restricted
    to failed docs' buckets against class reps, size-ratio prefiltered,
    distinct, then the exact-Jaccard verify join.

    Size prefilter inside the bucket join: J ≤ min(|a|,|b|)/max(|a|,|b|),
    so pairs whose shingle-set sizes differ beyond the threshold ratio
    can never verify — two int columns filter them BEFORE the distinct
    shuffle and the array-bearing verify join (measured on the bench
    corpus: 5.05M → 1.94M pass-2 pairs, verify 15.8 s → 2.9 s). The
    1e-9 slack only ever keeps extra pairs; a filtered pair is exactly
    a failed verification, and its id_b is already a failed doc by
    construction, so the drop set is unchanged — still pinned equal to
    minhash_verified_pairs' distinct id_b set.

    No broadcast hint: failures are small BY CONSTRUCTION (LSH false
    positives), but a hint would outlive that assumption on adversarial
    data — AQE picks broadcast from the runtime size.

    ``fb`` / ``reps`` are the audience frames from
    :func:`_pass2_audience`, computed once by the caller and shared with
    the local form. ``reps=None`` skips the class collapse entirely —
    the caller routes here only when the candidate-pair bound is already
    small, where evaluating the class keys (an md5 per shingle) costs
    more than the handful of duplicate verifies it would save; the
    candidate superset changes nothing in the drop set (the invariant
    is ∃ a verified earlier match, and every pair is exactly verified).
    """
    zcol = sh.select(F.col(id_col), F.size("__sh").alias("__z"))
    cand_side = (
        banded if reps is None else banded.join(reps, id_col, "left_semi")
    )
    banded_reps = cand_side.join(zcol, id_col)
    fb_z = fb.join(zcol, id_col)
    rest = (
        banded_reps.alias("a")
        .join(
            fb_z.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (
                F.least(F.col("a.__z"), F.col("b.__z")).cast("double")
                >= (F.lit(threshold) - F.lit(1e-9))
                * F.greatest(F.col("a.__z"), F.col("b.__z"))
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
        .join(first, ["id_b", "id_a"], "left_anti")  # already tried
    )
    return (
        verified(rest).filter(F.col("__j") >= threshold).select("id_b").distinct()
    )


def _bucket_verify_group(ids, flags, shs, threshold):
    """One bucket's exact prefix-filtered verify (the local pass-2 core,
    module-level so it is directly unit-testable against a brute-force
    reference — see test_operators): returns the failed ids with at
    least one verified (J >= threshold) smaller-id rep in this bucket.
    Pure Python, deterministic."""
    import math

    sets: dict = {}
    rep_ids: list = []
    failed_ids: list = []
    for i, rep_flag, arr in zip(ids, flags, shs):
        if i not in sets:
            sets[i] = set(arr)
        if rep_flag:
            rep_ids.append(i)
        else:
            failed_ids.append(i)
    freq: dict = {}
    for i in sets:
        for t in sets[i]:
            freq[t] = freq.get(t, 0) + 1
    rank = {
        t: r
        for r, t in enumerate(
            sorted(freq, key=lambda t: (freq[t], t))
        )
    }

    def prefix(s):
        # Slack mirrors the size filter's: the verify accepts
        # inter/union >= threshold in DOUBLE space, so a pair whose true
        # Jaccard is epsilon below threshold can still verify when the
        # quotient rounds up to the threshold double (e.g. t=0.07,
        # |inter|=7, |union|=100). The prefix proof assumes the verify's
        # minimum intersection, so it must use the SAME relaxed bound:
        # ceil(t*n - 1e-9) only ever LENGTHENS the prefix (never admits
        # a miss), and makes prefix coverage consistent with every pair
        # the double-precision verify can accept.
        n = len(s)
        p = n - math.ceil(threshold * n - 1e-9) + 1
        return sorted(s, key=rank.__getitem__)[:p]

    inv: dict = {}
    for a in set(rep_ids):
        sa = sets[a]
        if not sa:
            continue
        for t in prefix(sa):
            inv.setdefault(t, []).append(a)
    dropped = []
    for b in set(failed_ids):
        sb = sets[b]
        nb = len(sb)
        if nb == 0:
            continue
        tried: set = set()
        hit = False
        for t in prefix(sb):
            for a in inv.get(t, ()):
                if a >= b or a in tried:
                    continue
                tried.add(a)
                sa = sets[a]
                na = len(sa)
                if min(na, nb) < threshold * max(na, nb) - 1e-9:
                    continue
                inter = len(sa & sb)
                union = na + nb - inter
                if union > 0 and inter / union >= threshold:
                    hit = True
                    break
            if hit:
                break
        if hit:
            dropped.append(b)
    return dropped


def _drop_set_pass2_local(banded, sh, fb, fb_buckets, reps, id_col, threshold):
    """Pass 2, bucket-local prefix-filtered form (default since r8): the
    pair-join form materializes |reps|×|failed| rows per bucket before
    anything can refute them — a single degenerate mega-bucket (a
    common band signature, e.g. short texts under k=1) yielded 6.19M
    raw pairs → 1.94M distinct → verify on the bench corpus, ~7 s of
    pure pair plumbing. This form never materializes pairs: it groups
    the (reps ∪ failed) bucket membership by (band, bucket) and runs an
    exact AllPairs-style prefix-filtered verify INSIDE each group
    (applyInPandas), emitting only dropped ids.

    Exactness (the pinned invariant — drop set ≡ minhash_verified_pairs'
    distinct id_b — is preserved):

    - Candidate coverage: a qualifying pair shares ≥1 bucket, and both
      members appear in that bucket's group (candidate side collapsed to
      class reps exactly as the pair form — `_pass2_audience`).
    - Prefix filter (Bayardo/Chaudhuri prefix principle): order the
      bucket's tokens by (local frequency, token); for J(a,b) ≥ t the
      intersection is non-empty and its order-minimal token m satisfies
      pos_a(m) ≤ |a| − ⌈t·|a|⌉ + 1 (all earlier a-tokens are outside b,
      and |∩| ≥ t·|b| ⟹ ... ≥ ⌈t·|a|⌉ later a-tokens are shared), same
      for b — so m lies in BOTH prefixes, and probing b's prefix against
      an inverted index of rep prefixes cannot miss a qualifying pair.
      Any consistent per-group order is correct; local frequency
      ascending puts each doc's rarest tokens in its prefix, which is
      what makes dissimilar pairs collide almost never.
    - Verification is the exact Jaccard on the exact shingle sets
      (arrays are distinct by construction): integer |∩| and |∪| then
      one double division — bit-identical to the expression path.
    - Early exit per failed doc (stop at first verified match) changes
      nothing: the drop set is an ∃, not a pair list.
    - The pair form's ``first`` left-anti ("already tried" — each failed
      doc's pass-1 first candidate) is deliberately OMITTED here: a
      failed doc is in pass 2 precisely because its pass-1 verify with
      that first candidate FAILED, and the local verify is the exact
      same integer-|∩|/|∪| double quotient, so re-probing that pair
      can only fail again. The anti-join is a pair-form optimization
      (it shrinks a materialized pair list), not a correctness
      requirement; here the pair never materializes, and the retried
      probe is one set-intersection inside a group that was shuffled
      anyway.

    Scale: the shuffle is O(failed-bucket membership) rows (each with
    one shingle array), never pairs; per-group work is index build +
    near-constant probes per failed doc. The degenerate bucket that
    cost 6.19M pairs costs |bucket| index entries. One group runs on
    one core — but so did the SMJ join partition for that bucket in the
    pair form; the local form does strictly less work there. Skew
    bound: pass 2's audience is failures (LSH false positives), so
    group count and size scale with failure rate, not corpus size.

    Physical form: NOT groupBy().applyInPandas — per-group pandas
    overhead is ~ms and a failure-heavy corpus has tens of thousands of
    (band, bucket) groups (measured: 10.5k groups cost ~20 s of pure
    group plumbing on 27k rows). Instead the membership is hash-
    repartitioned on (band, bucket), sorted within partitions, and ONE
    mapInPandas pass walks the key runs with carry-over across Arrow
    batch boundaries (a bucket may straddle two batches of the same
    partition; partitions arrive whole and in order per task, so
    consecutive-run grouping is exact).

    ``fb`` / ``fb_buckets`` / ``reps`` come precomputed (and persisted)
    from the caller via :func:`_pass2_audience`.
    """
    import math

    from pyspark.sql import types as T

    rep_rows = (
        banded.join(reps, id_col, "left_semi")
        .join(fb_buckets, ["band", "bucket"], "left_semi")
        .select("band", "bucket", F.col(id_col).alias("__id"),
                F.lit(True).alias("__is_rep"))
    )
    fail_rows = fb.select(
        "band", "bucket", F.col(id_col).alias("__id"),
        F.lit(False).alias("__is_rep"),
    )
    member = rep_rows.unionByName(fail_rows).join(
        sh.select(F.col(id_col).alias("__id"), "__sh"), "__id"
    )
    par = banded.sparkSession.sparkContext.defaultParallelism
    member = member.repartition(max(par, 1), "band", "bucket").sortWithinPartitions(
        "band", "bucket"
    )

    out_schema = T.StructType([T.StructField("id_b", T.LongType(), False)])

    def run_partition(batches):
        import pandas as pd

        dropped_all: list = []
        cur_key = None
        cur_ids: list = []
        cur_flags: list = []
        cur_shs: list = []
        for pdf in batches:
            for band, bucket, i, flag, arr in zip(
                pdf["band"], pdf["bucket"], pdf["__id"],
                pdf["__is_rep"], pdf["__sh"],
            ):
                key = (band, bucket)
                if key != cur_key:
                    if cur_ids:
                        dropped_all.extend(
                            _bucket_verify_group(cur_ids, cur_flags, cur_shs, threshold)
                        )
                    cur_key = key
                    cur_ids, cur_flags, cur_shs = [], [], []
                cur_ids.append(int(i))
                cur_flags.append(bool(flag))
                cur_shs.append(arr)
        if cur_ids:
            dropped_all.extend(_bucket_verify_group(cur_ids, cur_flags, cur_shs, threshold))
        yield pd.DataFrame({"id_b": pd.Series(dropped_all, dtype="int64")})

    return (
        member.mapInPandas(run_partition, out_schema)
        .select("id_b")
        .distinct()
    )


def minhash_drop_set(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 1,
    threshold: float = 0.9,
    pass2_impl: str = "auto",
    stage_stats: list | None = None,
) -> DataFrame:
    """The near-dedup DROP SET — ids that have at least one verified
    (Jaccard ≥ threshold) near-duplicate with a SMALLER id — without
    verifying every candidate pair.

    ``minhash_verified_pairs`` materializes every candidate pair; a bucket
    holding a duplicate cluster of m docs contributes m²/2 of them — at
    web scale a single million-doc template cluster alone would be 5·10¹¹
    pairs. Keep-earliest dedup only needs "∃ earlier verified match", and
    the FIRST candidate to try is available without any self-join:

    - Pass 1: per (band, bucket), one window computes the bucket's min
      id; each doc verifies against its DISTINCT bucket-mins (at most
      ``bands``). That is O(docs × bands) rows end to end — no pair set
      is ever materialized.
    - Pass 2: docs with no verified bucket-min match fall back to an
      exact verify RESTRICTED to those docs' buckets. ``pass2_impl``:
      ``"auto"`` (default) prices the route from pass-1 byproducts —
      zero failures skip pass 2 outright; a small tier-0 pair bound
      (Σ bucket sizes over the failed docs' candidate rows) picks the
      pair join with the class collapse skipped; a large bound runs the
      one-job class-distinct estimate (:func:`_tier1_pair_estimate` —
      exact via ``__classkey`` on the Arrow banding path, ``__sigkey``
      lower bound otherwise; skipped outright for non-long ids, which
      always take pairs) to choose between ``"pairs"``
      (:func:`_drop_set_pass2_pairs`, class-rep collapsed) and
      ``"local"`` (:func:`_drop_set_pass2_local`, bucket-local
      prefix-filtered, long ids only); any verified match drops the
      doc.

    The result is EXACTLY the distinct ``id_b`` set of
    ``minhash_verified_pairs`` (pinned by test): pass 1's candidate is
    sufficient when it verifies, pass 2 exhausts the rest. Measured 45 s
    → 8 s on the 30k-doc bench corpus (965k verified pairs collapsed to
    ~25k verifies). Returns a one-column DataFrame named ``id_col``,
    eagerly materialized and persisted (its heavyweight inputs are
    unpersisted before return) — callers unpersist it when done.

    ``stage_stats``: pass a list to receive ``(stage, wall_sec)`` tuples
    at the operator's job boundaries (the clean_corpus/round_stats
    convention) — ``banding_materialize`` (the tokenize+hash pass +
    cache pin), ``pass1_verify`` (bucket-min window + exact verify),
    ``route:<impl>`` (the pricing collects, tagged with the route
    picked) and ``pass2_result`` (fallback verify + result pin).
    ``None`` (default) adds zero work and zero extra jobs.
    """
    import time as _time

    from pyspark.sql import types as T

    _t0 = _time.time()

    def _stat(name: str) -> None:
        nonlocal _t0
        if stage_stats is not None:
            stage_stats.append((name, round(_time.time() - _t0, 3)))
        _t0 = _time.time()

    id_is_long = isinstance(df.schema[id_col].dataType, T.LongType)
    if pass2_impl == "local" and not id_is_long:
        # the local form's mapInPandas contract is long ids (int64
        # output schema + int() coercion in the group walk)
        raise ValueError(
            "pass2_impl='local' requires a long-typed id column; use "
            "'pairs' (or 'auto', which routes non-long ids to it)"
        )
    perdoc = None
    if DROP_SET_FUSED and _use_arrow_banding(df, id_col, None):
        # ONE corpus scan+tokenize pass (r13): the per-doc Arrow frame
        # carries the shingle set, both identity keys, and every band
        # bucket, so the banded rows and the shingle frame are cheap
        # PROJECTIONS of the one cache (posexplode unpacks in-row, no
        # shuffle) — where the r12 shape paid two full tokenize+hash
        # passes (Arrow banding + expression shingles) and two eager
        # counts. The shingle sets here are sorted distinct grams;
        # every consumer is order-insensitive (sizes, array_intersect
        # sizes, sorted class digests, Python sets — see
        # :func:`_banded_rows_arrow`).
        perdoc = _banded_rows_arrow(
            df, text_col, id_col, num_hashes, bands, k,
            with_buckets=False, with_sig_key=True, perdoc_shingles=True,
        ).persist()
        perdoc.count()  # eager: many downstream branches — an
        # unmaterialized cache re-computes the tokenize+hash lineage per
        # branch inside one job (measured 172 s vs 36 s on the bench
        # corpus for the old banded frame)
        banded = perdoc.select(
            F.col(id_col),
            F.col("__sigkey"),
            F.col("__classkey"),
            F.posexplode("__buckets").alias("band", "bucket"),
        )
        sh = perdoc.select(F.col(id_col), F.col("__sh"))
    else:
        banded = _banded(
            df, text_col, id_col, num_hashes, bands, k, with_sig_key=True
        ).persist()
        banded.count()  # eager: 4 downstream branches — an unmaterialized
        # cache re-computes the signature per branch inside one job (measured
        # 172 s vs 36 s on the bench corpus)
        # The shingle-set frame feeds both sides of BOTH verify joins plus the
        # size column — five consumers, each of which would re-tokenize the
        # whole corpus (the same no-CSE trap as banded). One cached copy is a
        # few MB of string arrays; eager count for the same reason as above.
        sh = df.select(
            F.col(id_col), shingles_col(text_col, k).alias("__sh")
        ).persist()
        sh.count()
    _stat("banding_materialize")
    _, cand_rows = minhash_first_candidates(banded, id_col, with_rows=True)
    # Persist the per-band candidate rows and derive the distinct pair
    # set FROM the cache: v1's job then materializes cand_rows as a side
    # effect, so the tier-0 estimate below reads cached rows instead of
    # re-running the (band, bucket) window over the whole banded frame.
    cand_rows = cand_rows.persist()
    first = cand_rows.select(
        F.col(id_col).alias("id_b"), F.col("id_a")
    ).distinct()

    def verified(pairs: DataFrame) -> DataFrame:
        # |union| = |a|+|b|-|∩| (shingle arrays are sets): per-side sizes
        # replace the per-pair array_union — identical jaccard values.
        a = sh.select(
            F.col(id_col).alias("id_a"),
            F.col("__sh").alias("__sa"),
            F.size("__sh").alias("__za"),
        )
        b = sh.select(
            F.col(id_col).alias("id_b"),
            F.col("__sh").alias("__sb"),
            F.size("__sh").alias("__zb"),
        )
        j = pairs.join(a, "id_a").join(b, "id_b")
        inter = F.size(F.array_intersect("__sa", "__sb"))
        union = F.col("__za") + F.col("__zb") - inter
        jac = F.when(
            (inter >= 0) & (union > 0), inter.cast("double") / union
        ).otherwise(F.lit(0.0))
        return j.select("id_a", "id_b", jac.alias("__j"))

    # ONE aggregation splits pass-1 outcomes — the best verified Jaccard
    # per doc — where the r8 form paid two distinct shuffles plus an
    # anti-join for the same dropped/failed partition of v1's docs. v1
    # itself is NOT persisted (r14): per_doc is its only consumer, so
    # the old v1.persist+count paid a cache write and a full extra job
    # barrier to materialize rows read exactly once. Eagerly counting
    # per_doc instead materializes the verify ONCE inside this job
    # (cand_rows materializes as a side effect, so every later consumer
    # — the tier-0 bound, `first` in pass 2 — reads cache) and the
    # multi-consumer fan-out (dropped1 + failed_docs) reads the per-doc
    # cache, per the CLAUDE.md branch-recomputation rule.
    v1 = verified(first)
    per_doc = (
        v1.groupBy("id_b").agg(F.max("__j").alias("__jmax")).persist()
    )
    per_doc.count()
    _stat("pass1_verify")
    dropped1 = per_doc.filter(F.col("__jmax") >= threshold).select("id_b")
    # Docs with candidates but no verified bucket-min match.
    failed_docs = per_doc.filter(F.col("__jmax") < threshold).select("id_b")
    # Pass-2 audience computed ONCE and shared by the estimator and both
    # forms (fb/fb_buckets are projections of the cand_rows cache —
    # see _pass2_audience). Everything stays LAZY unless a branch
    # actually consumes a frame more than once: an earlier cut eagerly
    # persisted fb/reps and ran a rep-collapsed estimate up front, and
    # those 3 extra small jobs cost a measured ~1.5-2 s on the common
    # small-failure shape (7.0-7.5 s vs 5.6 s explicit pairs).
    fb, fb_buckets, reps = _pass2_audience(
        banded, sh, failed_docs, id_col, cand_rows
    )
    extra_persists = [per_doc, cand_rows]
    collapse = True
    if pass2_impl == "auto":
        # Tier 0, nearly free: Σ bucket sizes over the failed docs'
        # qualifying band rows — a pass-1 window byproduct (__bsz from
        # the SAME (band, bucket) window that computed the bucket min),
        # so the bound costs one small aggregate over already-persisted
        # lineage, not a dedicated bucket-membership job. Each
        # qualifying bucket contributes at most |bucket| smaller-id
        # candidates, so the sum upper-bounds the UNCOLLAPSED pass-2
        # pair count: a small bound routes straight to the pair join
        # with the class collapse skipped too (reps=None — evaluating
        # an md5 per shingle to collapse a ~2k-pair audience cost more
        # than the duplicate verifies it saved; measured ~2-3 s of
        # estimate + class-key stages on the pipeline's low-failure
        # shape).
        raw_bound = (
            cand_rows.join(
                failed_docs.select(F.col("id_b").alias(id_col)),
                id_col,
                "left_semi",
            )
            .agg(F.sum("__bsz"))
            .collect()[0][0]
            or 0
        )
        if raw_bound == 0:
            # zero failed docs, exactly: a failed doc always owns at
            # least one candidate row whose bucket holds it AND a
            # smaller id (__bsz >= 2), so the bound is 0 iff the pass-2
            # audience is empty — skip its whole job chain (a clean
            # corpus otherwise paid ~1-2 s of empty-frame stages).
            pass2_impl = "none"
        elif raw_bound < PASS2_LOCAL_MIN_EST_PAIRS:
            pass2_impl = "pairs"
            collapse = False
    if pass2_impl == "auto" and not id_is_long:
        # Tier 1 only arbitrates between the long-only local form and
        # the pair join; a non-long id column always takes pairs, so
        # the estimate job (a full aggregate over banded + a collect)
        # would be pure waste (ADVICE r9) — route directly.
        pass2_impl = "pairs"
    if pass2_impl == "auto":
        # Tier 1 (only when tier 0 is large), ONE small job: the
        # rep-collapsed pair count per failed bucket is
        # distinct-classes × failures, all in one aggregate. On the
        # Arrow banding path the rows carry ``__classkey`` (exact
        # shingle-class identity, free there — the per-gram digests
        # are already computed), so the estimate is EXACT per bucket
        # (VERDICT r9 #6; measured cost parity with the sig-key
        # aggregate: 5-trial medians 0.66 s vs 0.69 s on a 200k-doc
        # dup-dense corpus — the string-vs-long distinct agg does not
        # register above run noise). A banded
        # frame without the column (forced expression banding — ADVICE
        # r9 dropped the per-shingle md5 class key from that
        # interpreted path) falls back to ``__sigkey``: identical
        # shingle sets have identical signatures, so sig_est ≤ the
        # exact count, an UNDERESTIMATE when distinct classes collide
        # on all num_hashes values (a J=0.97 pair shares all 32 mins
        # with p ≈ 0.38; measured 16.0M vs 23.7M exact) — a mis-route
        # there is a bounded perf choice, never correctness. Either
        # way the regimes route as designed: a planted look-alike
        # mega-cluster is ONE class (est small → pairs), a genuine
        # mega-bucket of distinct classes keeps distinct keys
        # (est large → local).
        est = _tier1_pair_estimate(banded, fb_buckets, failed_docs, id_col)
        pass2_impl = (
            "local" if est >= PASS2_LOCAL_MIN_EST_PAIRS else "pairs"
        )
    _stat(f"route:{pass2_impl}")
    if pass2_impl == "none":
        dropped2 = None
    elif pass2_impl == "pairs":
        dropped2 = _drop_set_pass2_pairs(
            banded, sh, verified, fb, reps if collapse else None, first,
            id_col, threshold,
        )
    else:
        # the local form consumes fb twice (fail_rows + the fb_buckets
        # chain) — since r14 fb is a PROJECTION of the cand_rows cache
        # (a cache read + one broadcast semi join per consumer), so the
        # old persist+count job bought nothing; reps has exactly ONE
        # consumer per form (the estimator no longer reads it), so it
        # stays lazy
        dropped2 = _drop_set_pass2_local(
            banded, sh, fb, fb_buckets, reps, id_col, threshold
        )
    merged = (
        dropped1 if dropped2 is None else dropped1.unionByName(dropped2)
    )
    result = (
        merged.distinct().select(F.col("id_b").alias(id_col)).persist()
    )
    # Materialize the (one-column) drop set eagerly so the big
    # intermediates can be released NOW: banded is O(docs × bands) rows
    # and the per-doc/cand_rows caches carry shingle/window lineage —
    # leaving them cached leaks executor memory across invocations in a
    # long-lived session. The returned frame is persisted; callers
    # unpersist it when done.
    result.count()
    _stat("pass2_result")
    if perdoc is not None:
        perdoc.unpersist()
    else:
        banded.unpersist()
        sh.unpersist()
    for frame in extra_persists:
        frame.unpersist()
    return result
