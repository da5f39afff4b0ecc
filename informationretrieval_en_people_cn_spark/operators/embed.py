"""Deterministic document embeddings: hashed token projection.

Closes the reference's Doc2Vec loop (`/root/reference/searchengine/
Doc2Vec.py:41-49` trains gensim Doc2Vec; `Doc2VecMostSimilar.py:22-33`
does brute-force cosine) with a training-free, fully deterministic
analogue: the classic hashing-trick ("feature hashing") projection —
each indexed token hashes to one of ``dim`` buckets with a ±1 sign, the
document vector is the signed bucket-count histogram.  Same downstream
contract as Doc2Vec (an ``array`` embedding column feeding the ANN
stack in :mod:`similarity`), but reproducible in ANSI SQL, so the
driver's DuckDB oracle can value-check cosine top-k end-to-end.

Scale shape: explode tokens -> md5 bucket/sign (all JVM expressions,
codegen'd) -> one (doc_id, bucket) partial-agg shuffle (map-side
combine; at most ``dim`` rows survive per doc) -> dense array via a
``sequence`` transform over a bucket map.  No Python in the plan.

A real model (sentence-transformers etc.) swaps in as a Pandas-UDF
producer of the same (id, embedding) schema — the ANN stack and all
plans downstream are unchanged.  Two fitted models ship in-repo:
``weighting="tfidf"`` (corpus-fitted smoothed idf, still pure Catalyst
and oracle-replicable) and :func:`train_lsa_model` /
:func:`lsa_embeddings` (truncated SVD of the tf-idf term×doc matrix —
genuinely learned dense term vectors through the producer contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyze import indexed_tokens_expr


def _hash64(col):
    """First 15 hex digits of md5 as a non-negative int64 — chosen over
    xxhash64 because DuckDB can replicate it exactly
    (``('0x' || substr(md5(t), 1, 15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def embed_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    weighting: str = "count",
) -> DataFrame:
    """(doc_id, embedding: array<double>) hashed-projection embeddings.

    ``embedding[b] = Σ_tokens w(t) · sign(t) · [bucket(t) = b]`` with
    ``bucket = h(t) mod dim`` and ``sign = ±1`` from the next hash bit.
    Un-normalized (cosine normalizes downstream); docs with zero
    indexed tokens are excluded (their vector is 0 — cosine undefined).

    ``weighting="count"``: w(t) = 1 (training-free).
    ``weighting="tfidf"``: w(t) = smoothed idf FITTED on this corpus —
    ``ln((1+N)/(1+df(t))) + 1`` (the sklearn convention) with df/N
    computed distributedly from ``df`` itself, so the model is learned
    from the data (the statistical-fit analogue of the reference's
    Doc2Vec training, Doc2Vec.py:41-49) yet stays pure Catalyst and
    ANSI-SQL-replicable.  Fit cost: one distinct-aggregate over tokens
    (vocab-sized result) + one count; the idf join's right side is
    vocab-sized (AQE broadcasts it when small).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(indexed_tokens_expr(F.col(text_col))).alias("t"),
    )
    h = _hash64(F.col("t"))
    # sign bit = (h div dim) mod 2, computed as h mod 2*dim < dim so the
    # whole thing stays in exact int64 arithmetic (h / dim in Spark is
    # DOUBLE division — above 2^53 its floor diverges from integer div)
    sgn = F.when((h % (2 * dim)) < dim, F.lit(1.0)).otherwise(F.lit(-1.0))
    if weighting == "tfidf":
        n_docs = df.count()
        dfreq = (
            toks.distinct().groupBy("t").agg(F.count(F.lit(1)).alias("df"))
        )
        idf = F.log(F.lit(1.0 + n_docs) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
        comp = toks.join(dfreq, "t").select(
            "doc_id", (h % dim).alias("bucket"), (sgn * idf).alias("sgn")
        )
    elif weighting == "count":
        comp = toks.select(
            "doc_id", (h % dim).alias("bucket"), sgn.alias("sgn")
        )
    else:
        raise ValueError(f"unknown weighting {weighting!r}")
    sparse = comp.groupBy("doc_id", "bucket").agg(F.sum("sgn").alias("v"))
    dense = sparse.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "v"))).alias("m")
    )
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.coalesce(F.element_at(F.col("m"), b.cast("long")), F.lit(0.0)),
    )
    return dense.select(
        "doc_id", emb.alias("embedding")
    ).filter(F.aggregate("embedding", F.lit(0.0), lambda s, x: s + x * x) > 0)


def produce_embeddings(
    df: DataFrame,
    weights,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Pandas-UDF embedding PRODUCER — the documented swap-in slot for a
    real model (sentence-transformers & co.): Arrow batches of text in,
    ``(doc_id, embedding: array<double>)`` rows out, feeding the same
    ANN stack (:mod:`similarity`) as :func:`embed_documents`.

    The frozen reference "model" here is a linear map: token-hash
    counts (``dim_in`` buckets, blake2b) through a fixed weight matrix
    ``weights`` of shape ``(dim_out, dim_in)``, L2-normalized.  Real
    weights, real batching — everything a torch/ONNX producer needs
    except the tensor library.  ``weights`` ships inside the UDF
    closure; for models beyond a few MB use
    ``sparkSession.sparkContext.broadcast`` and read ``bc.value`` in
    the generator instead.
    """
    import numpy as np

    w = np.asarray(weights, dtype=np.float64)
    dim_out, dim_in = w.shape
    schema = "doc_id long, embedding array<double>"

    def gen(batches):
        import hashlib

        import pandas as pd

        memo: dict[str, int] = {}

        def bucket(tok: str) -> int:
            b = memo.get(tok)
            if b is None:
                b = memo[tok] = (
                    int.from_bytes(
                        hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
                    )
                    % dim_in
                )
            return b

        for pdf in batches:
            out_ids, out_embs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                counts = np.zeros(dim_in)
                for tok in (text or "").lower().split():
                    counts[bucket(tok)] += 1.0
                v = w @ counts
                n = float(np.linalg.norm(v))
                if n == 0.0:
                    continue  # no signal: excluded (cosine undefined)
                if normalize:
                    v = v / n
                out_ids.append(int(doc_id))
                out_embs.append(v.tolist())
            yield pd.DataFrame({"doc_id": out_ids, "embedding": out_embs})

    return df.select(id_col, text_col).mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# Trained LSA embeddings (a REAL fitted model through the producer slot)
# ---------------------------------------------------------------------------


def train_lsa_model(
    df: DataFrame,
    *,
    dim: int = 32,
    vocab_size: int = 2048,
    sample_docs: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """FIT an LSA (latent semantic analysis) term-embedding model on the
    corpus — the trained-model counterpart the reference gets from
    gensim Doc2Vec (Doc2Vec.py:41-49), built from public linear
    algebra only: truncated SVD of the tf-idf term×doc matrix.

    Distributed part (scales with the corpus):
      * vocabulary = top ``vocab_size`` tokens by document frequency
        (ties by token, so the vocab is deterministic);
      * fitting sample = the ``sample_docs`` docs with the smallest
        md5(doc_id) (a deterministic uniform sample — NOT the first
        docs, which share crawl-order locality);
      * the (term, doc, tf) triples for vocab×sample are aggregated in
        Spark and only that bounded matrix (≤ vocab_size × sample_docs,
        sparse) is collected.
    Driver part (bounded by the knobs, not the corpus): tf-idf weight,
    dense SVD, keep the top ``dim`` left-singular directions scaled by
    their singular values.  Component signs are fixed (largest-|coeff|
    entry positive) so the model is reproducible across BLAS builds.

    Returns ``{"terms": list, "vectors": (V, dim) float64 ndarray,
    "idf": (V,) ndarray, "dim": int}``.  Feed to
    :func:`lsa_embeddings`; ship to executors via the UDF closure (or
    ``sc.broadcast`` beyond a few MB).
    """
    import numpy as np

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(indexed_tokens_expr(F.col(text_col))).alias("t"),
    )
    n_docs = df.count()
    vocab_rows = (
        toks.distinct()
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), "t")
        .limit(vocab_size)
        .collect()
    )
    terms = [r.t for r in vocab_rows]
    dfs = np.array([r.df for r in vocab_rows], dtype=np.float64)
    tindex = {t: i for i, t in enumerate(terms)}

    sample = (
        df.select(F.col(id_col).alias("doc_id"))
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(sample_docs)
    )
    # vocab restriction via broadcast semi-join, not a vocab_size-long
    # IN-list (which would bloat the plan and defeat codegen at V=10^5)
    vocab_df = df.sparkSession.createDataFrame([(t,) for t in terms], "t string")
    triples = (
        toks.join(F.broadcast(sample), "doc_id")
        .join(F.broadcast(vocab_df), "t", "left_semi")
        .groupBy("t", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .collect()
    )
    doc_ids = sorted({r.doc_id for r in triples})
    dindex = {d: j for j, d in enumerate(doc_ids)}
    idf = np.log((1.0 + n_docs) / (1.0 + dfs)) + 1.0
    m = np.zeros((len(terms), len(doc_ids)))
    for r in triples:
        i = tindex[r.t]
        m[i, dindex[r.doc_id]] = (1.0 + np.log(r.tf)) * idf[i]
    u, s, _ = np.linalg.svd(m, full_matrices=False)
    k = min(dim, len(s))
    vecs = u[:, :k] * s[:k]
    if k < dim:  # degenerate corpora: pad so the contract dim holds
        vecs = np.pad(vecs, ((0, 0), (0, dim - k)))
    # sign convention: per component, the largest-|coefficient| term
    # gets a positive coefficient
    for c in range(k):
        if vecs[np.argmax(np.abs(vecs[:, c])), c] < 0:
            vecs[:, c] = -vecs[:, c]
    return {"terms": terms, "vectors": vecs, "idf": idf, "dim": dim}


def lsa_embeddings(
    df: DataFrame,
    model: dict,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Embed documents with a model from :func:`train_lsa_model` —
    an Arrow-batched producer (the :func:`produce_embeddings` contract):
    doc vector = L2-normalized Σ (1+ln tf)·idf(t)·term_vector(t) over
    in-vocabulary tokens; docs with no in-vocab tokens are excluded.

    Tokenization replicates ``indexed_tokens_expr`` (lowercase
    ``[a-z0-9_]+`` runs, length 2..128) so serving matches fitting.
    """
    import re

    import numpy as np

    from ..functions.analyze import TOKEN_PATTERN

    tindex = {t: i for i, t in enumerate(model["terms"])}
    vecs = np.asarray(model["vectors"], dtype=np.float64)
    idf = np.asarray(model["idf"], dtype=np.float64)
    pat = re.compile(TOKEN_PATTERN)
    schema = "doc_id long, embedding array<double>"

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out_ids, out_embs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                counts: dict[int, int] = {}
                for tok in pat.findall((text or "").lower()):
                    if not 2 <= len(tok) <= 128:
                        continue
                    i = tindex.get(tok)
                    if i is not None:
                        counts[i] = counts.get(i, 0) + 1
                if not counts:
                    continue
                idxs = np.fromiter(counts.keys(), dtype=np.int64)
                tfs = np.fromiter(counts.values(), dtype=np.float64)
                w = (1.0 + np.log(tfs)) * idf[idxs]
                v = w @ vecs[idxs]
                n = float(np.linalg.norm(v))
                if n == 0.0:
                    continue
                out_ids.append(int(doc_id))
                out_embs.append((v / n).tolist())
            yield pd.DataFrame({"doc_id": out_ids, "embedding": out_embs})

    return df.select(id_col, text_col).mapInPandas(gen, schema)
