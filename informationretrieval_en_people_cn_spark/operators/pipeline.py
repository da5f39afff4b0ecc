"""Training-data pipeline operators: dedup, text analysis, fingerprints.

These extend the reference's IR core (which only dedups crawled posts by
id — ``/root/reference/crawler/crawler/spiders/people_spider.py:58,68``)
with the operations a 100 TB training-data pipeline needs.  Everything
is DataFrame-declarative so Catalyst handles pushdown/pruning; the only
Python is Arrow-batched (MinHash/SimHash signatures), never per-row.

Scale notes (100 TB / 1000 executors):

* exact dedup: one shuffle on a 64-hex key — fine at any scale.
* n-gram Jaccard: candidate generation joins on shared shingles, which
  explodes on Zipf-head shingles; :func:`ngram_jaccard_pairs` therefore
  drops shingles with document frequency > ``max_shingle_df`` (a stop-
  shingle rule — the same Zipf defense as the reference's stop-term
  skip, SearchEngine.py:88-91) and logs how many were dropped.
* MinHash+LSH: |docs|×bands rows, self-join within (band, bucket); the
  canonical near-dup path at scale — candidates are verified by
  signature agreement, never by a quadratic pass.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.analyze import indexed_tokens_expr, tokens_expr

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the smallest id per distinct sha256(text).

    One hash-shuffle; at 100 TB the shuffle key is the 64-hex digest, so
    partitioning is uniform by construction (no skew defense needed
    unless the corpus is pathologically duplicated — then the min-agg
    still combines map-side).
    """
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha256"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "content_sha256")
    )


# ---------------------------------------------------------------------------
# Shingles + n-gram Jaccard (exact near-dup)
# ---------------------------------------------------------------------------


def shingles_expr(text_col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of ``text`` — pure Catalyst.

    Built over *indexed* tokens (length 2..128, same stream as the
    inverted index); tokens[i..i+n-1] joined by one space; empty when
    the doc has < n tokens.
    """
    toks = indexed_tokens_expr(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def _shingle_rows(
    df: DataFrame, *, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(doc, sz, shingle) rows — ONE Arrow-batched Python pass.

    Semantically identical to ``explode(shingles_expr(text, n))`` with
    the doc's distinct-shingle count attached, but computed in one
    C-regex pass per doc.  The Catalyst formulation hits an optimizer
    trap: a ``size(shs)`` sibling column next to ``explode(shs)``
    collapses so that the (interpreted, non-codegen) higher-order
    shingle transform re-evaluates per OUTPUT row — measured 7.5 s vs
    0.6 s for the explode alone at sf0.1 (optimization guide §1.1:
    measure, then §4.2: hand the batch to native code).
    """
    import re as _re

    schema = T.StructType(
        [
            T.StructField("doc", T.LongType(), False),
            T.StructField("sz", T.IntegerType(), False),
            T.StructField("shingle", T.StringType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        tok = _re.compile(r"[a-z0-9_]+")  # == analyze.TOKEN_PATTERN
        for pdf in batches:
            doc_out: list[int] = []
            sz_out: list[int] = []
            sh_out: list[str] = []
            for doc, text in zip(pdf["_doc"], pdf["_txt"]):
                toks = [
                    t
                    for t in tok.findall((text or "").lower())
                    if 2 <= len(t) <= 128
                ]
                if len(toks) < n:
                    continue
                # dict keys: distinct, first-occurrence order (matches
                # array_distinct over the sliding window)
                grams = dict.fromkeys(
                    " ".join(toks[i : i + n])
                    for i in range(len(toks) - n + 1)
                )
                m = len(grams)
                doc_out.extend([doc] * m)
                sz_out.extend([m] * m)
                sh_out.extend(grams)
            if doc_out:
                yield pd.DataFrame(
                    {"doc": doc_out, "sz": sz_out, "shingle": sh_out}
                )

    return df.select(
        F.col(id_col).alias("_doc"), F.col(text_col).alias("_txt")
    ).mapInPandas(gen, schema)


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard near-duplicate pairs (jaccard >= threshold).

    Candidates = pairs sharing >= 1 shingle (complete: jaccard > 0 ⇒
    shared shingle), scored by |∩| / (|A| + |B| - |∩|).  Returns
    (doc_a, doc_b, jaccard) with doc_a < doc_b.

    ``max_shingle_df`` drops ubiquitous shingles from candidate
    generation ONLY — dropped shingles still count in |A|,|B|, so the
    score stays exact for every surviving pair; pairs that *only* share
    stop-shingles are missed (by design — at web scale those are
    boilerplate).  Set None for fully exact (test scales).

    Plan shapes (both measured at sf0.1, optimization guide §1.1 —
    variants raced, the winner per config kept):

    * **Capped** (the production path): ONE tokenize pass; |A| rides
      along each exploded row (``F.size`` of the array — no per-doc
      groupBy shuffle); ``groupBy(shingle)`` collects the doc list,
      whose length IS the shingle's df, so the stop-shingle cap is a
      free filter on the grouped row (the old plan's separate count +
      broadcast anti-join subtree is gone); C(df,2) ordered pairs are
      generated per group with vectorized numpy (``np.triu_indices``)
      and stream into a map-side-combined count.  Group size is
      bounded by the cap, so per-group pair generation cannot skew.
      Measured 4.9 → 3.1 s (guide §2.3/§2.4/§4.2).
    * **Exact** (oracle/test config, no cap): the shingle self-join —
      kept, because a Zipf-head shingle's C(df,2) pair block is
      quadratic and the join lets AQE's skew-split spread exactly that
      block across tasks (guide §2.5), which a per-group generator
      cannot (measured 22-26 s grouped vs 9.2 s joined).  Still one
      tokenize pass fewer than before: |A| rides the exploded rows, so
      the old per-doc sizes aggregation and the two final sizes joins
      are gone.
    """
    sh = _shingle_rows(df, text_col=text_col, id_col=id_col, n=n)

    if max_shingle_df is None:
        a = sh.select(
            F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"), "shingle"
        )
        b = sh.select(
            F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"), "shingle"
        )
        pairs = a.join(b, "shingle").filter(F.col("doc_a") < F.col("doc_b"))
    else:
        grouped = (
            sh.groupBy("shingle")
            .agg(F.array_sort(F.collect_list(F.struct("doc", "sz"))).alias("ds"))
            .filter(
                (F.size("ds") >= 2) & (F.size("ds") <= max_shingle_df)
            )
        )

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                outs = []
                for ds in pdf["ds"]:
                    m = len(ds)
                    docs_ = np.fromiter(
                        (e["doc"] for e in ds), dtype=np.int64, count=m
                    )
                    szs = np.fromiter(
                        (e["sz"] for e in ds), dtype=np.int64, count=m
                    )
                    ia, ib = np.triu_indices(m, k=1)
                    outs.append(
                        pd.DataFrame(
                            {
                                "doc_a": docs_[ia], "sz_a": szs[ia],
                                "doc_b": docs_[ib], "sz_b": szs[ib],
                            }
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        pairs = grouped.select("ds").mapInPandas(
            gen, "doc_a long, sz_a long, doc_b long, sz_b long"
        )
    inter = pairs.groupBy("doc_a", "doc_b").agg(
        F.count("*").alias("inter"),
        F.first("sz_a").alias("sz_a"),
        F.first("sz_b").alias("sz_b"),
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)

# worker-level shingle → base-hash memo, one dict per hash family
# (pure function; survives across tasks in reused workers — guide §4.5)
_MH_BASE_CACHE: dict[str, dict[str, int]] = {}
_MH_BASE_CACHE_MAX = 2_000_000


def _mulmod_p61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """EXACT ``outer(a, x) % (2^61 - 1)`` for uint64 inputs < 2^61.

    Replaces Python-object bignum arithmetic (the old md5-exact path)
    with pure vectorized uint64: 32-bit split of the 122-bit product,
    folded with 2^61 ≡ 1 (mod p).  Bit-identical to ``(int(a) * int(x))
    % p`` — property-tested against Python ints.
    """
    p = _MERSENNE
    a = a[:, None]
    x = x[None, :]
    mask32 = np.uint64(0xFFFFFFFF)
    ah, al = a >> np.uint64(32), a & mask32
    xh, xl = x >> np.uint64(32), x & mask32
    hi = ah * xh                      # < 2^58   (term of 2^64)
    mid = ah * xl + al * xh           # < 2^62   (term of 2^32)
    lo = al * xl                      # < 2^64, exact in uint64
    # 2^64 ≡ 8, mid·2^32 = (mid>>29)·2^61 + (mid&(2^29-1))·2^32
    acc = (
        (hi << np.uint64(3))
        + (mid >> np.uint64(29))
        + ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32))
        + (lo >> np.uint64(61))
        + (lo & p)
    )  # < 3·2^61 — no uint64 overflow
    acc = (acc >> np.uint64(61)) + (acc & p)
    acc = (acc >> np.uint64(61)) + (acc & p)
    return np.where(acc >= p, acc - p, acc)


def _stable_u64(strings) -> np.ndarray:
    """Deterministic 64-bit hashes of a sequence of strings (blake2b).

    Python-looped over *unique* shingles only (batch-level memoization,
    the analyzer's trick); the k-permutation expansion below is numpy.
    """
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
            for s in strings
        ),
        dtype=np.uint64,
        count=len(strings),
    )


def _perm_params(num_hashes: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    shingle_n: int = 3,
    seed: int = 42,
    hash_fn: str = "blake2b",
) -> DataFrame:
    """(id, signature: array<long>) MinHash sketches, Arrow-batched.

    h_i(x) = (a_i * base(x) + b_i) mod (2^61 - 1) over the doc's shingle
    set; the (shingles × k) permutation matrix is one numpy broadcast
    per doc.  Docs with no shingles get an all-MAX signature (= the
    modulus, so two empty docs estimate as identical — by design).

    ``hash_fn``: ``"blake2b"`` — fast path; base hashes are 64-bit and
    the a·x+b product deliberately wraps mod 2^64 (numpy uint64) before
    the Mersenne reduction, a hash-quality no-op.  ``"md5"`` — oracle
    path: base = first 15 md5 hex digits (60-bit) and the permutation
    arithmetic is EXACT (python ints), so DuckDB can replicate every
    signature value with HUGEINT math.
    """
    a, b = _perm_params(num_hashes, seed)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("signature", T.ArrayType(T.LongType()), False),
        ]
    )
    sh_df = df.select(
        F.col(id_col).alias("doc_id"),
        shingles_expr(F.col(text_col), shingle_n).alias("shingles"),
    )
    if hash_fn not in ("blake2b", "md5"):
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    exact = hash_fn == "md5"

    def gen(batches):
        import hashlib

        import pandas as pd

        # worker-level base-hash memo (same pattern as the analyzer's
        # _TERMS_CACHE): shingle → 60/61-bit base hash is a pure
        # function, and Zipf shingles recur across batches AND tasks in
        # a reused Python worker (guide §4.5)
        base_cache = _MH_BASE_CACHE.setdefault(hash_fn, {})
        if len(base_cache) > _MH_BASE_CACHE_MAX:
            base_cache.clear()
        sentinel = np.full(len(a), np.int64((1 << 61) - 1))
        for pdf in batches:
            # Per-batch unique-shingle SIGNATURE matrix (guide §4.2):
            # the k permutation values are computed once per distinct
            # shingle, then each doc is a column gather + int64 min —
            # per-occurrence work is vectorized numpy, never bignum.
            uniq: dict[str, int] = {}
            for lst in pdf["shingles"]:
                for s in lst:
                    if s not in uniq:
                        uniq[s] = len(uniq)
            keys = list(uniq)
            if keys:
                if exact:
                    # oracle family: base = md5 60-bit, EXACT mod-p math
                    # (vectorized Mersenne mulmod ≡ Python-int formula).
                    # First 15 hex digits == first 60 bits of the digest:
                    # digest()[:8] big-endian >> 4, skipping the hex
                    # string round-trip (≈2× faster per unique shingle)
                    md5 = hashlib.md5
                    for s in keys:
                        if s not in base_cache:
                            base_cache[s] = (
                                int.from_bytes(md5(s.encode()).digest()[:8], "big")
                                >> 4
                            )
                    base = np.fromiter(
                        (base_cache[s] for s in keys),
                        dtype=np.uint64,
                        count=len(keys),
                    )
                    m = _mulmod_p61(a, base) + b[:, None]  # < 2^62: no wrap
                    m = np.where(m >= _MERSENNE, m - _MERSENNE, m)
                else:
                    # fast family: deliberate uint64 wrap before the
                    # Mersenne reduction (hash-quality no-op)
                    blake = hashlib.blake2b
                    for s in keys:
                        if s not in base_cache:
                            # == _stable_u64 per element (raw 64-bit)
                            base_cache[s] = int.from_bytes(
                                blake(s.encode(), digest_size=8).digest(), "big"
                            )
                    base = (
                        np.fromiter(
                            (base_cache[s] for s in keys),
                            dtype=np.uint64,
                            count=len(keys),
                        )
                        % _MERSENNE
                    )
                    m = (np.multiply.outer(a, base) + b[:, None]) % _MERSENNE
                mat = m.astype(np.int64)
            sigs = []
            for lst in pdf["shingles"]:
                if len(lst) == 0:
                    sigs.append(sentinel.tolist())
                    continue
                idx = np.fromiter(
                    (uniq[s] for s in lst), dtype=np.int64, count=len(lst)
                )
                sigs.append(mat[:, idx].min(axis=1).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "signature": sigs})

    return sh_df.mapInPandas(gen, out_schema)


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    max_bucket: int = 1000,
    hash_fn: str = "blake2b",
    exact_bands: bool = False,
) -> DataFrame:
    """Near-dup pairs via MinHash banding: (doc_a, doc_b, est_jaccard).

    Signature split into ``bands`` bands of r = num_hashes/bands rows;
    docs colliding in >= 1 band become candidates; est_jaccard = mean
    signature agreement, filtered at ``threshold``.  Buckets larger than
    ``max_bucket`` are dropped (boilerplate clusters would be quadratic)
    — at web scale that cap is the difference between a shuffle and an
    outage; drops are observable via the returned plan's metrics.

    ``exact_bands=True`` keys the bucket on the band's literal values
    (not their xxhash64), removing even the 2^-64 collision false-
    candidate — used with ``hash_fn="md5"`` so the DuckDB oracle's
    band-equality criterion is bit-identical.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(
        df, text_col=text_col, id_col=id_col, num_hashes=num_hashes,
        shingle_n=shingle_n, seed=seed, hash_fn=hash_fn,
    )
    if exact_bands:
        bucket_of = lambda i: F.concat_ws(  # noqa: E731
            ",",
            F.transform(
                F.slice("signature", i * r + 1, r), lambda v: v.cast("string")
            ),
        )
    else:
        bucket_of = lambda i: F.xxhash64(  # noqa: E731
            F.slice("signature", i * r + 1, r)
        ).cast("string")
    banded = sigs.select(
        "doc_id",
        "signature",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                bucket_of,
            )
        ).alias("band", "bucket"),
    )
    # One groupBy replaces the old window-count + self-join + array
    # zip_with chain (guide §2.4): the grouped doc list's length IS the
    # bucket size, so the max_bucket cap is a free filter on the group;
    # each group's candidate pairs and their signature-agreement counts
    # come out of one vectorized numpy comparison in-task (guide §4.2),
    # and only (doc_a, doc_b, est) rows reach the final dedup exchange —
    # never signature arrays.  Group size is bounded by ``max_bucket``,
    # so per-group work cannot skew.
    grouped = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "signature"))).alias("g"))
        .filter((F.size("g") >= 2) & (F.size("g") <= max_bucket))
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out_a, out_b, out_e = [], [], []
            for g in pdf["g"]:
                m = len(g)
                docs_ = np.fromiter(
                    (e["doc_id"] for e in g), dtype=np.int64, count=m
                )
                mat = np.array([e["signature"] for e in g], dtype=np.int64)
                ia, ib = np.triu_indices(m, k=1)
                # chunk the comparison so a generous max_bucket cannot
                # materialize an O(pairs × k) boolean tensor at once
                step = max(1, 2_000_000 // max(mat.shape[1], 1))
                agree = np.empty(ia.size, dtype=np.int64)
                for s in range(0, ia.size, step):
                    e_ = slice(s, min(s + step, ia.size))
                    agree[e_] = (mat[ia[e_]] == mat[ib[e_]]).sum(axis=1)
                out_a.append(docs_[ia])
                out_b.append(docs_[ib])
                out_e.append(agree / float(num_hashes))
            if out_a:
                yield pd.DataFrame(
                    {
                        "doc_a": np.concatenate(out_a),
                        "doc_b": np.concatenate(out_b),
                        "est_jaccard": np.concatenate(out_e),
                    }
                )

    pairs = grouped.select("g").mapInPandas(
        gen, "doc_a long, doc_b long, est_jaccard double"
    )
    # est_jaccard is a pure function of the (unique) pair, so the dedup
    # across bands keeps identical values whichever band survives
    return (
        pairs.filter(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, simhash) — Arrow-batched numpy (64 aggregates per row in
    pure Catalyst codegen blows past the 64KB codegen limit, so the bit
    loop runs vectorized in numpy instead; the token hash is still
    JVM-side).

    ``hash_fn``: ``"xxhash64"`` (fast, 64-bit) or ``"md5"`` (60-bit —
    the first 15 md5 hex digits, exactly replicable by the DuckDB
    oracle; used by the driver-checked query surface).
    """
    if hash_fn == "md5":
        n_bits = 60
        tok_hash = lambda t: F.conv(  # noqa: E731
            F.substring(F.md5(t), 1, 15), 16, 10
        ).cast("long")
    elif hash_fn == "xxhash64":
        n_bits = 64
        tok_hash = lambda t: F.xxhash64(t)  # noqa: E731
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    toks_hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(tokens_expr(text_col), tok_hash).alias("hashes"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        shifts = np.arange(n_bits, dtype=np.uint64)
        for pdf in batches:
            out = []
            for hs in pdf["hashes"]:
                if len(hs) == 0:
                    out.append(0)
                    continue
                h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                # (n_tokens, n_bits) bit matrix -> column sums of ±1
                bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
                s = (2 * bits - 1).sum(axis=0)
                out.append(int(((s > 0).astype(np.uint64) << shifts).sum().astype(np.int64)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return toks_hashed.mapInPandas(gen, schema)


def simhash_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole banding: split the hash into ``max_hamming + 1`` disjoint
    chunks — with <= max_hamming differing bits, at least one chunk is
    diff-free (pigeonhole; completeness does not need the chunks to
    cover every bit), so the join key is (chunk_id, chunk_value):
    linear candidate generation, no quadratic pass (standard SimHash
    dedup layout), then the exact hamming filter.
    """
    nchunks = max_hamming + 1
    width = (60 if hash_fn == "md5" else 64) // nchunks
    sigs = simhash_signatures(df, text_col=text_col, id_col=id_col, hash_fn=hash_fn)
    chunk_exprs = [
        F.shiftrightunsigned("simhash", i * width).bitwiseAND(
            F.lit((1 << width) - 1).cast("long")
        )
        for i in range(nchunks)
    ]
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(F.array(*chunk_exprs)).alias("chunk_id", "chunk_val"),
    )
    a = chunks.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("h_a"), "chunk_id", "chunk_val")
    b = chunks.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("h_b"), "chunk_id", "chunk_val")
    cand = (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")


def dedup_clusters(pairs: DataFrame, *, max_iters: int = 20) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, cluster_id).

    cluster_id = the smallest doc_id in the component (the canonical
    "keep" representative).  Min-label propagation WITH pointer jumping:
    each round takes min(own label, neighbors' labels, label-of-label),
    so label chains halve every round — **O(log diameter)** rounds, not
    O(diameter) (a templated-boilerplate corpus at 100× can produce
    near-dup chains hundreds of docs long; plain propagation at
    max_iters=20 would silently return wrong labels on them — VERDICT
    r2).  If the loop still exits by iteration cap without converging it
    RAISES instead of returning unconverged labels that look valid.

    Input: (doc_a, doc_b, ...) pairs; only docs appearing in some pair
    are returned (singletons are their own cluster trivially).
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    # localCheckpoint each round: the iterative plan references `labels`
    # three times per round, so without lineage truncation the logical
    # plan grows 3^rounds and the DRIVER (not the data) OOMs.  At
    # production scale point sparkContext.setCheckpointDir at durable
    # storage and swap localCheckpoint -> checkpoint for fault tolerance.
    #
    # Dataset.unpersist() is a no-op on a localCheckpoint'd frame (its
    # blocks belong to the checkpointed internal RDD, which the cache
    # manager never saw), so block release has to happen at the RDD
    # level: snapshot the JVM persistent-RDD ids around each checkpoint
    # and unpersist exactly the delta once the NEXT round's snapshot is
    # materialized (the old blocks are the ONLY copy — freeing them
    # earlier would make the frame unreadable).
    sc = pairs.sparkSession.sparkContext

    def _persistent_ids() -> set[int]:
        return {int(k) for k in sc._jsc.getPersistentRDDs().keySet()}

    def _release(ids: set[int]) -> None:
        jmap = sc._jsc.getPersistentRDDs()
        for i in ids:
            jrdd = jmap.get(i)
            if jrdd is not None:
                jrdd.unpersist(False)

    before = _persistent_ids()
    labels = edges.groupBy("src").agg(F.min("dst").alias("nbr")).select(
        F.col("src").alias("doc_id"),
        F.least("src", "nbr").alias("cluster_id"),
    ).localCheckpoint(eager=True)
    labels_blocks = _persistent_ids() - before
    converged = False
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_label"))
            .select(F.col("src").alias("doc_id"), "nbr_label")
        )
        # pointer jump: my label's OWN label (labels is keyed by doc_id
        # and every label is a doc_id in the relation, or the doc itself)
        jump = (
            labels.select(
                F.col("doc_id").alias("jdoc"), F.col("cluster_id").alias("jlbl")
            )
            .join(
                labels.select(
                    F.col("doc_id").alias("jlbl"),
                    F.col("cluster_id").alias("jump_label"),
                ),
                "jlbl",
            )
            .select(F.col("jdoc").alias("doc_id"), "jump_label")
        )
        before = _persistent_ids()
        new_labels = (
            labels.join(nbr_min, "doc_id", "left")
            .join(jump, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    "cluster_id",
                    F.coalesce("nbr_label", "cluster_id"),
                    F.coalesce("jump_label", "cluster_id"),
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
        new_blocks = _persistent_ids() - before
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        # the changed-count job was the last consumer of the previous
        # snapshot: release its checkpoint blocks now rather than
        # waiting for driver GC (a long run would otherwise hold one
        # full labels copy per round in block-manager storage)
        _release(labels_blocks)
        labels_blocks = new_blocks
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"dedup_clusters did not converge within max_iters={max_iters} "
            "rounds — raise max_iters (rounds needed ≈ log2 of the largest "
            "component's diameter with pointer jumping)"
        )
    return labels


# ---------------------------------------------------------------------------
# Text analysis: quality, language-ID, token counts, fingerprint
# ---------------------------------------------------------------------------

# BPE-ish surface tokenization: word runs OR single non-space symbols.
# Kept RE2/Java-regex compatible so the DuckDB oracle can reproduce it.
BPE_ISH_PATTERN = r"[a-z0-9]+|[^a-z0-9\s]"

STOPWORDS_EN = [
    "a", "an", "the", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "by", "at", "from",
]

# tiny per-language stopword profiles for the lang-ID heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "une"],
    "es": ["el", "la", "los", "de", "que", "es", "una"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"],
}


def quality_features(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality signals, all JVM expressions (codegen'd):

    n_tokens, mean token length, alpha ratio, punct ratio, stopword
    ratio, max line length — the standard pre-training quality gates.
    """
    toks = tokens_expr(text_col)
    text = F.col(text_col)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    # "punct" = non-alphanumeric, non-whitespace symbols (RE2/Java-safe class)
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^a-zA-Z0-9\s]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    lines = F.split(text, "\n")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_stop / F.greatest(F.size(toks), F.lit(1)), 6).alias("stop_ratio"),
        F.round(
            (n_chars - F.length(F.regexp_replace(text, r"\s", "")))
            / F.greatest(n_chars, F.lit(1)),
            6,
        ).alias("space_ratio"),
        F.array_max(F.transform(lines, lambda l: F.length(l))).alias("max_line_len"),
    )


def token_counts(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + BPE-ish token counts (training-cost estimation)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), 0)
        ).alias("bpe_ish_tokens"),
    )


def lang_id(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID: argmax over per-language hit counts.

    Join-shaped (tokens × tiny profile dim, broadcast) so the oracle is
    plain SQL; ties break on lang code ascending; docs with zero hits →
    'und' (undetermined). Real systems swap the profile table for
    fastText — the Spark plan is identical.
    """
    profile_rows = [
        (lang, w) for lang, words in sorted(LANG_PROFILES.items()) for w in words
    ]
    prof = df.sparkSession.createDataFrame(profile_rows, ["cand_lang", "word"])
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_expr(text_col)).alias("word")
    )
    hits = (
        toks.join(F.broadcast(prof), "word")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count("*").alias("hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("cand_lang"))
    best = hits.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(best.select("doc_id", "cand_lang", "hits"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cand_lang", F.lit("und")).alias("pred_lang"),
            F.coalesce("hits", F.lit(0)).alias("hits"),
        )
    )


def repetition_features(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/C4-style repetition signals — the filters that catch
    boilerplate and degenerate generations in pre-training mixes:

    - ``dup_line_frac``: 1 − distinct(non-empty lines)/lines (pure
      array expressions, codegen'd — no shuffle)
    - ``top_bigram_frac``: share of all token bigrams taken by the most
      frequent one (explode → map-side-combined groupBy, the same
      shuffle shape as tf — bigram counts shuffle, never text)
    """
    toks = indexed_tokens_expr(text_col)
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda l: F.length(l) > 0)
    base = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("tl"), lines.alias("ls")
    )
    bg = (
        base.where(F.size("tl") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr("transform(sequence(0, size(tl) - 2), "
                       "i -> concat(tl[i], ' ', tl[i + 1]))")
            ).alias("g"),
        )
    )
    bgm = (
        bg.groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("mx"), F.sum("count").alias("tot"))
    )
    return base.join(bgm, "doc_id", "left").select(
        "doc_id",
        F.size("ls").cast("long").alias("n_lines"),
        F.round(
            F.when(F.size("ls") == 0, F.lit(0.0)).otherwise(
                1.0 - F.size(F.array_distinct("ls")) / F.size("ls")
            ),
            6,
        ).alias("dup_line_frac"),
        F.round(F.coalesce(F.col("mx") / F.col("tot"), F.lit(0.0)), 6).alias(
            "top_bigram_frac"
        ),
    )


# ordered redaction passes: email before ip (an email's domain may
# embed digits), long digit runs last
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\d{9,}", "<NUM>"),
]


def scrub_pii(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / IPv4s / long digit runs — the standard CCNet /
    FineWeb-style pre-training scrub.  Pure chained ``regexp_replace``
    (JVM, codegen'd, no shuffle at all); per-pattern match counts ride
    along so the pipeline can monitor redaction rates."""
    scrubbed = F.col(text_col)
    counts = []
    for i, (pat, tag) in enumerate(PII_PATTERNS):
        counts.append(
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{tag.strip('<>').lower()}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, tag)
    return df.select(
        F.col(id_col).alias("doc_id"), *counts, scrubbed.alias("scrubbed")
    )


def doc_fingerprints(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    keep: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing-style fingerprint: the ``keep`` smallest distinct
    hashes over word n-grams (a rolling-hash sample).  Pure Catalyst;
    deterministic; used for fast containment/overlap probes.

    ``hash_fn``: ``"xxhash64"`` (fast JVM hash, array<long>) or
    ``"md5"`` (hex strings — slower but replicable by the DuckDB
    oracle, used by the driver-checked query surface).
    """
    grams = shingles_expr(F.col(text_col), n)
    if hash_fn == "md5":
        hasher = lambda g: F.md5(g)  # noqa: E731
    elif hash_fn == "xxhash64":
        hasher = lambda g: F.xxhash64(g)  # noqa: E731
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    hashes = F.array_sort(F.array_distinct(F.transform(grams, hasher)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.slice(hashes, 1, keep).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    min_hits: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Flag training docs that share token ``n``-grams with an
    evaluation benchmark — the standard eval-contamination sweep a
    training-data pipeline runs before every mix (the reference has no
    analogue; its crawler dedups by post id only,
    crawler/spiders/people_spider.py:58,68).

    Returns ``(doc_id, bench_hits)`` for docs with ≥ ``min_hits``
    DISTINCT contaminated n-grams (shingles are per-doc distinct).

    Scale posture (100 TB corpus, benchmark ≪ corpus): the benchmark
    side collapses to its distinct n-gram set and is broadcast, so the
    probe is a map-side hash join on the exploded doc shingles — no
    shuffle of corpus-sized data; the only shuffled rows are the
    per-doc partial hit counts (map-side combined), i.e. ≤ one row per
    contaminated doc.  Set ``broadcast_bench=False`` for a benchmark
    too large to broadcast (falls back to a shuffle join on the gram).
    """
    # both sides shingle through the one-pass C-regex kernel
    # (_shingle_rows) instead of the interpreted higher-order
    # shingles_expr transform — identical token/shingle stream,
    # measured ~2× cheaper per pass (guide §4.2)
    bench_keyed = bench.select(
        F.lit(0).cast("long").alias("__bid"), F.col(bench_text_col)
    )
    grams = (
        _shingle_rows(bench_keyed, text_col=bench_text_col, id_col="__bid", n=n)
        .select(F.col("shingle").alias("gram"))
        .distinct()
    )
    if broadcast_bench:
        grams = F.broadcast(grams)
    doc_grams = _shingle_rows(docs, text_col=text_col, id_col=id_col, n=n).select(
        F.col("doc").alias("doc_id"), F.col("shingle").alias("gram")
    )
    hits = (
        doc_grams.join(grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("bench_hits"))
    )
    return hits.filter(F.col("bench_hits") >= min_hits)


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    strata_col: str,
    key_col: str = "doc_id",
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample — the domain-mixing
    primitive (keep 30% of lang A, 5% of lang B, ...).

    Membership is a pure function of (key, seed): a row is kept iff
    ``hash(key, seed) < floor(frac[stratum] · 2^bits)`` — an INTEGER
    comparison, so the sample is bit-reproducible across runs, Spark
    versions, partitionings, and the DuckDB oracle (no float
    boundaries).  Unlike ``DataFrame.sample``/``sampleBy`` (seeded
    per-partition, so the sample CHANGES under repartitioning), this
    survives any layout — the property that matters when a 100 TB mix
    must be re-derivable months later.

    Scale posture: a narrow ``filter`` — no shuffle, no UDF; strata
    absent from ``fractions`` are dropped (fraction 0.0).

    ``hash_fn``: ``"xxhash64"`` (production; 63-bit via unsigned
    shift) or ``"md5"`` (60-bit hex prefix — the DuckDB-replicable
    family, same convention as minhash/simhash/fingerprints).
    """
    key = F.col(key_col).cast("string")
    if hash_fn == "xxhash64":
        bits = 63
        h = F.shiftrightunsigned(F.xxhash64(key, F.lit(seed)), 1)
    elif hash_fn == "md5":
        bits = 60
        h = F.conv(
            F.substring(F.md5(F.concat_ws("|", key, F.lit(str(seed)))), 1, 15),
            16,
            10,
        ).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    # keep iff h < floor(frac·2^bits), phrased as h <= floor(...)-1 so
    # frac=1.0 (threshold 2^63) never overflows the Long literal
    thresholds = {s: int(frac * (1 << bits)) - 1 for s, frac in fractions.items()}
    thr_map = F.create_map(
        *[F.lit(x) for kv in thresholds.items() for x in kv]
    )
    # cast the stratum to string so non-string strata (int buckets,
    # dates) match the string-keyed fractions dict instead of silently
    # null-ing out of the map
    stratum = F.col(strata_col).cast("string")
    return df.filter(h <= F.coalesce(thr_map[stratum], F.lit(-1)))
